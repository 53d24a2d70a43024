"""TPU kernel probe: stage-by-stage timings + kernel/oracle match on hardware.

Usage: python scripts/tpu_probe.py [--width W] [--height H] [--no-shadows]
       [--match] [--stages] [--frames N]

Everything is timed as N batched iterations inside ONE jitted program and
fetched with np.asarray (the tunneled TPU adds ~1 s per host call and
block_until_ready can return early — CLAUDE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build(width, height, shadows):
    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig, LightConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare

    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    m = T.translate((0.0, -5.5, 60.0)) @ T.rotate_y(3.14159265) @ \
        T.scale(50.0, 50.0, 50.0)
    sm.transform_triangles("bunny", m)
    if shadows:
        sm.load_obj_file("/root/reference/cube.obj", key="ground")
        sm.set_color("ground", (0.0, 1.0, 0.0))
        sm.transform_triangles(
            "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    scene = sm.build()
    focal = 6000.0 * height / 1080.0
    cfg = default_config().replace(
        mode="tiled",
        camera=CameraConfig(width=width, height=height, focal=focal),
        light=LightConfig(enable_shadows=shadows),
        bvh=BVHConfig(split="sah", block_size=int(
            os.environ.get("SRT_BLOCK_SIZE", "128"))))
    prep = prepare(scene, cfg)
    return prep, cfg


def timed(fn, *args, iters=8, tag=""):
    t0 = time.time()
    out = np.asarray(jax.block_until_ready(fn(*args)))
    compile_s = time.time() - t0
    t0 = time.time()
    out = np.asarray(jax.block_until_ready(fn(*args)))
    per = (time.time() - t0) / iters
    print(f"# {tag}: compile {compile_s:.1f}s, {per*1e3:.2f} ms/iter",
          flush=True)
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--no-shadows", dest="shadows", action="store_false",
                   default=True)
    p.add_argument("--match", action="store_true")
    p.add_argument("--stages", action="store_true")
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()

    print(f"# device: {jax.devices()[0].platform}", flush=True)
    t0 = time.time()
    prep, cfg = build(args.width, args.height, args.shadows)
    print(f"# build+prep {time.time()-t0:.1f}s  blocks={prep.num_blocks} "
          f"tris={prep.num_triangles}", flush=True)

    from simple_raytracer_tpu.kernels import tiled
    from simple_raytracer_tpu.render.renderer import render_radiance
    from simple_raytracer_tpu.render import integrator
    from simple_raytracer_tpu.ops.camera import primary_rays

    cam = cfg.camera
    o, d = primary_rays(cam.width, cam.height, cam.focal)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    perm, inv = tiled.tile_permutation(cam.width, cam.height, cfg.tile_px)
    o, d = jnp.asarray(np.asarray(o)[perm]), jnp.asarray(np.asarray(d)[perm])
    tile = cfg.tile_px * cfg.tile_px
    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
    N = args.frames

    if args.stages:
        @jax.jit
        def cull_many(prep, o, d):
            def one(i, acc):
                plan = tiled._cull(o + i * 1e-6, d, tile, prep, cfg.cull_maxv)
                return acc + plan.sum()
            return jax.lax.fori_loop(0, N, one, jnp.int32(0))

        @jax.jit
        def primary_many(prep, o, d):
            def one(i, acc):
                t, idx = tiled.tiled_hits(prep, o + i * 1e-6, d, tile,
                                          cfg.mt_eps, cfg.cull_maxv)
                return acc + jnp.where(jnp.isfinite(t), t, 0.0).sum()
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))

        timed(cull_many, prep, o, d, iters=N, tag="cull+plan")
        timed(primary_many, prep, o, d, iters=N, tag="primary kernel")

        if args.shadows:
            t, idx = jax.jit(lambda p, o, d: tiled.tiled_hits(
                p, o, d, tile, cfg.mt_eps, cfg.cull_maxv))(prep, o, d)
            hitm = jnp.isfinite(t)
            point = jnp.where(hitm[:, None], o + t[:, None] * d, 0.0)
            self_obj = prep.scene.tri_obj[jnp.maximum(idx, 0)]
            lightb = jnp.broadcast_to(light, point.shape)
            shadow = tiled.tiled_shadow_fn(prep, tile, cfg.mt_eps,
                                           cfg.cull_maxv,
                                           cfg.light.shadow_no_max_t)

            @jax.jit
            def shadow_many(prep, point, lightb, self_obj, hitm):
                def one(i, acc):
                    occ = shadow(point + i * 1e-6, lightb, self_obj, hit=hitm)
                    return acc + occ.sum()
                return jax.lax.fori_loop(0, N, one, jnp.int32(0))

            timed(shadow_many, prep, point, lightb, self_obj, hitm, iters=N,
                  tag="shadow pass")

    @jax.jit
    def frame_many(prep, light):
        def one(i, acc):
            lp = light + i.astype(jnp.float32) * 1e-4
            radiance, hit = render_radiance(prep, cfg, lp)
            img = integrator.finalize_image(radiance, hit, cfg)
            return acc + img.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, N, one, jnp.int32(0))

    per = timed(frame_many, prep, light, iters=N, tag="full frame")
    rays = args.width * args.height
    print(f"# => {rays/per/1e6:.2f} Mrays/s", flush=True)

    if args.match:
        from simple_raytracer_tpu.render.renderer import brute_force_hits
        R = 64 * 1024
        sl = slice(len(np.asarray(o)) // 2 - R // 2,
                   len(np.asarray(o)) // 2 + R // 2)
        oo, dd = o[sl], d[sl]
        t_k, i_k = jax.jit(lambda p, o, d: tiled.tiled_hits(
            p, o, d, tile, cfg.mt_eps, cfg.cull_maxv))(prep, oo, dd)
        t_r, i_r = jax.jit(lambda s, o, d: brute_force_hits(
            s, o, d, cfg.mt_eps, chunk=8192))(prep.scene, oo, dd)
        t_k, i_k, t_r, i_r = map(np.asarray, (t_k, i_k, t_r, i_r))
        tm = np.isclose(t_k, t_r, rtol=1e-4, atol=1e-6) | \
            (np.isinf(t_k) & np.isinf(t_r))
        im = i_k == i_r
        print(f"# match: t {tm.mean():.5f}  idx {im.mean():.5f}  "
              f"hits {np.isfinite(t_r).mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
