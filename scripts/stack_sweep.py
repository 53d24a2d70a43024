"""Hardware sweep for the stacked tier: WB / split-MM / ablation knobs.

With the contraction down to ONE MXU pass (see stack_probe.py), the
window-width and matmul-split tradeoffs shift: fewer tested pairs (WB=1)
costs 3x less matmul issue than it used to, and the any-hit concat copy
doubled in bytes (64 bf16 rows vs 16 f32).  This sweep measures, on the
bench bunny frame:
  nearest: WB in {1, 2} x ablate in {none, dma, matmul}
  shadow:  split_mm_ah in {0, 1} x WB_AH in {2, 4}

Usage: python scripts/stack_sweep.py [--what nearest|shadow|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="all")
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()
    N = args.frames

    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig, LightConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.kernels import tiled, tiled_t
    from simple_raytracer_tpu.ops.camera import primary_rays
    from scripts.stack_probe import timed

    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    sm.transform_triangles("bunny", T.translate((0.0, -5.5, 60.0))
                           @ T.rotate_y(3.14159265) @ T.scale(50, 50, 50))
    sm.load_obj_file("/root/reference/cube.obj", key="ground")
    sm.set_color("ground", (0.0, 1.0, 0.0))
    sm.transform_triangles(
        "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    scene = sm.build()
    cfg = default_config().replace(
        mode="tiled",
        camera=CameraConfig(width=1920, height=1080, focal=6000.0),
        light=LightConfig(enable_shadows=True),
        bvh=BVHConfig(split="sah"))
    prep = prepare(scene, cfg)
    tpx = tiled.effective_tile_px(cfg, prep.scene.verts.shape[0])
    tile = tpx * tpx
    o, d = primary_rays(1920, 1080, cfg.camera.focal)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    perm, _ = tiled.tile_permutation(1920, 1080, tpx)
    o = jnp.asarray(np.asarray(o)[perm])
    d = jnp.asarray(np.asarray(d)[perm])
    eps, maxv = cfg.mt_eps, cfg.cull_maxv
    parts = int(prep.stack_parts)

    wbs = tuple(int(w) for w in os.environ.get(
        "SRT_SWEEP_WB", "2,1").split(","))
    splits = tuple(int(s) for s in os.environ.get(
        "SRT_SWEEP_SPLIT", "1").split(","))
    rows_l = tuple(int(r) for r in os.environ.get(
        "SRT_SWEEP_ROWS", "4096").split(","))
    if args.what in ("nearest", "all"):
        for wb in wbs:
            plan = jax.jit(lambda o, d: tiled_t.cull(
                prep, o, d, tile, maxv, wb=wb, apex=True))(o, d)
            for split in splits:
                for rows in rows_l:
                    tiled_t._SPLIT_MM = bool(split)
                    tiled_t.SUPER_ROWS_RES = rows
                    tiled_t.tiled_nearest_t.clear_cache()

                    hoist = os.environ.get("SRT_SWEEP_HOIST", "0") != "0"

                    @jax.jit
                    def many(o, d, plan, wb=wb, hoist=hoist):
                        F0 = tiled_t.ray_tile_features_stacked(
                            o, d, tile, parts)[0]

                        def one(i, acc):
                            # hoist=1: reuse the same features every iter
                            # (isolates kernel-only cost; the epsilon
                            # defeats CSE across iterations either way)
                            F = F0 if hoist else \
                                tiled_t.ray_tile_features_stacked(
                                    o + i * 1e-6, d, tile, parts)[0]
                            t, _ = tiled_t.tiled_nearest_t(
                                F, plan, prep.gram_s,
                                tile, prep.block_size,
                                wb, eps, prec="stack", res=True)
                            return acc + jnp.where(
                                jnp.isfinite(t), t, 0.0).sum()
                        return jax.lax.fori_loop(0, N, one, jnp.float32(0))

                    timed(many, o, d, plan, iters=N,
                          tag=f"nearest[stack] wb={wb} split={split} "
                              f"rows={rows} "
                              f"ablate={os.environ.get('SRT_TILED_ABLATE', '-')}")

    if args.what in ("shadow", "all"):
        # real occlusion geometry: shadow rays from the stack hit points
        light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
        plan0 = jax.jit(lambda o, d: tiled_t.cull(prep, o, d, tile, maxv))(
            o, d)
        F0 = jax.jit(lambda o, d: tiled_t.ray_tile_features_stacked(
            o, d, tile, parts)[0])(o, d)
        t0v, i0v = jax.jit(lambda F, p: tiled_t.tiled_nearest_t(
            F, p, prep.gram_s, tile, prep.block_size, 2, eps,
            prec="stack", res=True))(F0, plan0)
        tflat = t0v.reshape(-1)[:o.shape[0]]
        hitm = jnp.isfinite(tflat)
        point = jnp.where(hitm[:, None], o + tflat[:, None] * d, 0.0)
        self_obj = prep.scene.tri_obj[jnp.maximum(
            i0v.reshape(-1)[:o.shape[0]], 0)]
        stile = tiled._shadow_tile(cfg, tile, prep)
        lightb = jnp.broadcast_to(light, point.shape)
        for split_ah in (0, 1):
            for wb_ah in (4, 2):
                tiled_t._SPLIT_MM_AH = bool(split_ah)
                tiled_t.WINDOW_BLOCKS_AH = wb_ah
                # _SPLIT_MM_AH is read at trace time but is not part of the
                # jit cache key — drop stale executables
                tiled_t.tiled_anyhit_t.clear_cache()
                shadow = tiled.tiled_shadow_fn(prep, stile, eps, maxv,
                                               cfg.light.shadow_no_max_t,
                                               impl=tiled_t)

                @jax.jit
                def shadow_many(point, lightb, self_obj, hitm):
                    def one(i, acc):
                        occ = shadow(point + i * 1e-6, lightb, self_obj,
                                     hit=hitm)
                        return acc + occ.sum()
                    return jax.lax.fori_loop(0, N, one, jnp.int32(0))

                timed(shadow_many, point, lightb, self_obj, hitm, iters=N,
                      tag=f"shadow[stack] split_ah={split_ah} wb={wb_ah}")


if __name__ == "__main__":
    main()
