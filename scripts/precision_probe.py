"""TPU probe: nearest-hit kernel at each matmul precision tier — time and
match vs the HIGHEST result (which the suite pins to the jnp oracle).

SRT_MT_PRECISION is read at import, so each tier runs in a subprocess.
Usage: python scripts/precision_probe.py            (driver)
       python scripts/precision_probe.py <tier>     (one tier, in-process)
"""
import json, os, subprocess, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TIERS = ("highest", "tri", "default")


def run_tier():
    import numpy as np, jax, jax.numpy as jnp
    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.kernels import tiled, tiled_t
    from simple_raytracer_tpu.ops.camera import primary_rays

    W, H = 1920, 1080
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    sm.transform_triangles(
        "bunny", T.translate((0., -5.5, 60.)) @ T.rotate_y(3.14159265)
        @ T.scale(50., 50., 50.))
    sm.load_obj_file("/root/reference/cube.obj", key="ground")
    sm.set_color("ground", (0.0, 1.0, 0.0))
    sm.transform_triangles(
        "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    scene = sm.build()
    cfg = default_config().replace(
        mode="tiled", tile_px=32,
        camera=CameraConfig(width=W, height=H, focal=6000.0),
        bvh=BVHConfig(split="sah", page_tris=128, block_size=32))
    prep = prepare(scene, cfg)
    o, d = primary_rays(W, H, focal=6000.0)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    perm, _ = tiled.tile_permutation(W, H, cfg.tile_px)
    operm = jnp.asarray(np.asarray(o)[perm])
    dperm = jnp.asarray(np.asarray(d)[perm])
    TILE = cfg.tile_px * cfg.tile_px
    N = 8

    fn = jax.jit(lambda o, d: tiled_t.hits(prep, o, d, TILE, cfg.mt_eps,
                                           cfg.cull_maxv))

    @jax.jit
    def many(o, d):
        def one(i, acc):
            t, idx = tiled_t.hits(prep, o + i * 1e-4, d, TILE, cfg.mt_eps,
                                  cfg.cull_maxv)
            return acc + jnp.where(jnp.isfinite(t), t, 0.0).sum()
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))

    t, idx = map(np.asarray, fn(operm, dperm))
    float(many(operm, dperm))
    t0 = time.time(); float(many(operm, dperm)); dt = (time.time() - t0) / N
    np.savez(f"/tmp/prec_{os.environ['SRT_MT_PRECISION']}.npz", t=t, idx=idx)
    print(json.dumps({"tier": os.environ["SRT_MT_PRECISION"],
                      "hits_ms": round(dt * 1e3, 1)}), flush=True)


def main():
    import numpy as np
    env = dict(os.environ); env["SRT_TILED_PREPASS"] = "0"
    for tier in TIERS:
        env["SRT_MT_PRECISION"] = tier
        r = subprocess.run([sys.executable, os.path.abspath(__file__), tier],
                           env=env, capture_output=True, text=True,
                           timeout=1200)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(out[-1] if out else f"# {tier} FAILED rc={r.returncode}\n"
              + r.stderr[-1500:], flush=True)
    ref = np.load("/tmp/prec_highest.npz")
    for tier in TIERS[1:]:
        try:
            got = np.load(f"/tmp/prec_{tier}.npz")
        except FileNotFoundError:
            continue
        tm = (np.isclose(got["t"], ref["t"], rtol=1e-4, atol=1e-6)
              | (np.isinf(got["t"]) & np.isinf(ref["t"])))
        im = got["idx"] == ref["idx"]
        print(json.dumps({"tier": tier, "t_match": round(float(tm.mean()), 6),
                          "idx_match": round(float(im.mean()), 6)}),
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_tier()
    else:
        main()
