"""Hardware probe: K-stacked one-pass contraction vs tri/highest tiers.

Measures, on the bench bunny scene (sublane kernel, production config):
  - nearest-kernel time at prec in {stack, tri, highest} (same plan/cull)
  - any-hit time at {stack, tri}
  - t/idx match of stack vs highest (full frame, on device) and vs the jnp
    brute-force oracle (64k-ray slice)
  - full production frame (env default tier)

Usage: python scripts/stack_probe.py [--width 1920] [--height 1080]
       [--frames 8] [--scene bunny|complex]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8, tag=""):
    t0 = time.time()
    np.asarray(jax.block_until_ready(fn(*args)))
    compile_s = time.time() - t0
    t0 = time.time()
    np.asarray(jax.block_until_ready(fn(*args)))
    per = (time.time() - t0) / iters
    print(f"# {tag}: compile {compile_s:.1f}s, {per*1e3:.2f} ms/iter",
          flush=True)
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--scene", default="bunny")
    p.add_argument("--tile", type=int, default=0,
                   help="tile_px override (0 = adaptive)")
    args = p.parse_args()
    N = args.frames

    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig, LightConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.kernels import tiled, tiled_t
    from simple_raytracer_tpu.render.renderer import (render_radiance,
                                                      brute_force_hits)
    from simple_raytracer_tpu.render import integrator
    from simple_raytracer_tpu.ops.camera import primary_rays

    print(f"# device: {jax.devices()[0].platform}", flush=True)
    if args.scene == "complex":
        from simple_raytracer_tpu.scene import catalog
        sm, _, light_l = catalog.CATALOG["complex"]("/root/reference", 180.0,
                                                    bake_view=True)
        light = jnp.asarray(light_l, jnp.float32)
        focal = 400.0
    else:
        sm = SceneManager(root="/root/reference")
        sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
        sm.set_color("bunny", (0.8, 0.7, 0.6))
        sm.transform_triangles("bunny", T.translate((0.0, -5.5, 60.0))
                               @ T.rotate_y(3.14159265) @ T.scale(50, 50, 50))
        sm.load_obj_file("/root/reference/cube.obj", key="ground")
        sm.set_color("ground", (0.0, 1.0, 0.0))
        sm.transform_triangles(
            "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
        light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
        focal = 6000.0 * args.height / 1080.0
    scene = sm.build()
    cfg = default_config().replace(
        mode="tiled", tile_px=args.tile,
        camera=CameraConfig(width=args.width, height=args.height, focal=focal),
        light=LightConfig(enable_shadows=True),
        bvh=BVHConfig(split="sah"))
    t0 = time.time()
    prep = prepare(scene, cfg)
    gs = prep.gram_s
    print(f"# prep {time.time()-t0:.1f}s tris={prep.num_triangles} "
          f"stack_parts={prep.stack_parts} "
          f"gram_s {gs.shape} {gs.nbytes/2**20:.1f} MB "
          f"gram_t {prep.gram_t.nbytes/2**20:.1f} MB", flush=True)

    tpx = tiled.effective_tile_px(cfg, prep.scene.verts.shape[0])
    tile = tpx * tpx
    cam = cfg.camera
    o, d = primary_rays(cam.width, cam.height, cam.focal)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    perm, _ = tiled.tile_permutation(cam.width, cam.height, tpx)
    o = jnp.asarray(np.asarray(o)[perm])
    d = jnp.asarray(np.asarray(d)[perm])
    eps, maxv = cfg.mt_eps, cfg.cull_maxv
    BS, WB = prep.block_size, tiled_t.WINDOW_BLOCKS

    plan = jax.jit(lambda o, d: tiled_t.cull(prep, o, d, tile, maxv,
                                             apex=True))(o, d)

    def nearest_for(prec):
        if prec == "stack":
            G = prep.gram_s
            feats = lambda oo, dd: tiled_t.ray_tile_features_stacked(
                oo, dd, tile, int(prep.stack_parts))[0]
        else:
            G = prep.gram_t
            feats = lambda oo, dd: tiled_t.ray_tile_features_t(
                oo, dd, tile)[0]
        res = tiled_t._resident(G)

        @jax.jit
        def many(o, d, plan):
            def one(i, acc):
                F = feats(o + i * 1e-6, d)
                t, idx = tiled_t.tiled_nearest_t(F, plan, G, tile, BS, WB,
                                                 eps, prec=prec, res=res)
                return acc + jnp.where(jnp.isfinite(t), t, 0.0).sum()
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))

        @jax.jit
        def once(o, d, plan):
            F = feats(o, d)
            return tiled_t.tiled_nearest_t(F, plan, G, tile, BS, WB, eps,
                                           prec=prec, res=res)
        return many, once

    outs = {}
    for prec in ("stack", "tri", "highest"):
        many, once = nearest_for(prec)
        timed(many, o, d, plan, iters=N, tag=f"nearest[{prec}]")
        outs[prec] = once(o, d, plan)

    # agreement: stack vs highest, full frame, reduced on device
    for prec in ("stack", "tri"):
        t_a, i_a = outs[prec]
        t_h, i_h = outs["highest"]
        tm = jnp.mean((jnp.abs(t_a - t_h) <= 1e-4 * jnp.abs(t_h) + 1e-6) |
                      (~jnp.isfinite(t_a) & ~jnp.isfinite(t_h)))
        im = jnp.mean((i_a == i_h).astype(jnp.float32))
        print(f"# {prec} vs highest: t-match {float(tm):.6f} "
              f"idx-match {float(im):.6f}", flush=True)

    # oracle match on a 32k-ray slice (small chunk: the [chunk, T] MT
    # intermediates must fit HBM next to the resident gram buffers)
    R = 32 * 1024
    mid = o.shape[0] // 2
    sl = slice(mid - R // 2, mid + R // 2)
    t_r, i_r = jax.jit(lambda s, oo, dd: brute_force_hits(
        s, oo, dd, eps, chunk=2048))(prep.scene, o[sl], d[sl])
    t_k = outs["stack"][0].reshape(-1)[sl]
    i_k = outs["stack"][1].reshape(-1)[sl]
    t_k, i_k, t_r, i_r = map(np.asarray, (t_k, i_k, t_r, i_r))
    tm = np.isclose(t_k, t_r, rtol=1e-4, atol=1e-6) | \
        (np.isinf(t_k) & np.isinf(t_r))
    print(f"# stack vs oracle(64k): t {tm.mean():.5f} "
          f"idx {(i_k == i_r).mean():.5f} hits {np.isfinite(t_r).mean():.3f}",
          flush=True)

    # any-hit timing (occlusion pass geometry: shadow rays from hit points)
    t0v, i0v = outs["stack"]
    tflat = t0v.reshape(-1)
    hitm = jnp.isfinite(tflat)
    point = jnp.where(hitm[:, None], o + tflat[:, None] * d, 0.0)
    self_obj = prep.scene.tri_obj[jnp.maximum(i0v.reshape(-1), 0)]
    for prec in ("stack", "tri"):
        os.environ["SRT_MT_PRECISION"] = prec
        tiled_t._MODE = prec
        # inside the loop: _shadow_tile caps non-stack tiers at 1024 rays
        # (tri/highest register spills at 4096 — see tiled._shadow_tile)
        stile = tiled._shadow_tile(cfg, tile, prep)
        shadow = tiled.tiled_shadow_fn(prep, stile, eps, maxv,
                                       cfg.light.shadow_no_max_t,
                                       impl=tiled_t)

        @jax.jit
        def shadow_many(point, lightb, self_obj, hitm):
            def one(i, acc):
                occ = shadow(point + i * 1e-6, lightb, self_obj, hit=hitm)
                return acc + occ.sum()
            return jax.lax.fori_loop(0, N, one, jnp.int32(0))

        lightb = jnp.broadcast_to(light, point.shape)
        timed(shadow_many, point, lightb, self_obj, hitm, iters=N,
              tag=f"shadow[{prec}]")
    tiled_t._MODE = "stack"

    # full production frame
    @jax.jit
    def frame_many(prep, light):
        def one(i, acc):
            lp = light + i.astype(jnp.float32) * 1e-4
            radiance, hit = render_radiance(prep, cfg, lp)
            img = integrator.finalize_image(radiance, hit, cfg)
            return acc + img.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, N, one, jnp.int32(0))

    per = timed(frame_many, prep, light, iters=N, tag="full frame [stack]")
    rays = args.width * args.height
    print(f"# => {rays/per/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
