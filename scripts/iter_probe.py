"""Decompose the nearest-walk per-iteration fixed cost on the TPU.

Round-3 established the resident kernel is per-tile/iteration fixed-cost
bound (~2.2 us per while-iteration regardless of work; SUPER_ROWS sweep:
512 rows 52.4 / 2048 34.1 / 4096 34.7 ms at 16px tiles) but never said
WHAT the 2.2 us is: the dynamic lane slices, the MXU issue overhead of the
KW small matmuls, the VPU epilogue, or a while-loop scheduling bubble.
This probe times tiled_nearest_t on the bench scene's REAL plan at each
(tile_px, SUPER_ROWS_RES, ablate) point:

  ablate=dma     loop + KW dynamic lane slices only (no matmul/epilogue)
  ablate=matmul  + the KW window contractions (no epilogue)
  (none)         the full kernel
  nobreak        full kernel without the front-to-back break reduction

Per-point cost deltas attribute the iteration cost; plan stats (mean/p90
windows per tile) convert ms to us/iteration.

Usage: python scripts/iter_probe.py [--tiles 16,64] [--rows 512,2048]
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
    p.add_argument("--tiles", default="16,64")
    p.add_argument("--rows", default="512,2048")
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()
    N = args.frames

    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.kernels import tiled, tiled_t

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
        mode="tiled", camera=CameraConfig(width=W, height=H, focal=6000.0),
        bvh=BVHConfig(split="sah"))
    prep = prepare(scene, cfg)
    MAXV = cfg.cull_maxv

    from simple_raytracer_tpu.ops.camera import primary_rays_tiled

    for tpx in [int(x) for x in args.tiles.split(",")]:
        tile = tpx * tpx
        o, d, _tx, _ty = primary_rays_tiled(W, H, tpx, 6000.0, False)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        plan = jax.jit(lambda oo, dd: tiled_t.cull(
            prep, oo, dd, tile, MAXV, apex=True))(o, d)
        plan = plan.block_until_ready()
        pn = np.asarray(plan)
        use_list = pn[:, 3] == 1
        cnt = np.where(use_list, pn[:, 2], pn[:, 1])
        print(f"# tile={tpx}px: n_tiles={pn.shape[0]} windows/tile "
              f"mean={cnt.mean():.2f} p50={np.percentile(cnt, 50):.0f} "
              f"p90={np.percentile(cnt, 90):.0f} max={cnt.max()}",
              flush=True)

        G, prec, Ft, n, R, odp = tiled_t._operands(
            prep, tiled_t._mode(), o, d, tile)
        for rows in [int(x) for x in args.rows.split(",")]:
            KW = max(rows // (4 * prep.block_size * tiled_t.WINDOW_BLOCKS), 1)
            ns = np.ceil(cnt / KW).sum()
            for mode in ["dma", "matmul", "", "nobreak"]:
                tiled_t._ABLATE = mode if mode in ("dma", "matmul") else ""
                _ray_old = tiled_t._NO_BREAK
                tiled_t._NO_BREAK = (mode == "nobreak") or _ray_old
                old_rows = tiled_t.SUPER_ROWS_RES
                tiled_t.SUPER_ROWS_RES = rows

                def one_case(Ft=Ft, plan=plan, G=G, odp=odp, prec=prec):
                    @jax.jit
                    def many(Ft, plan, G):
                        def one(i, acc):
                            # perturb the ray operand per iteration so XLA
                            # cannot hoist the loop-invariant render
                            Ftv = Ft + i.astype(Ft.dtype) * 1e-6
                            t, idx = tiled_t.tiled_nearest_t(
                                Ftv, plan, G, tile, prep.block_size,
                                tiled_t.WINDOW_BLOCKS, cfg.mt_eps,
                                prec=prec, res=True, od_parts=odp)
                            return acc + jnp.where(
                                jnp.isfinite(t), t, 0.).sum()
                        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
                    t0 = time.time()
                    float(many(Ft, plan, G))
                    c = time.time() - t0
                    t0 = time.time()
                    float(many(Ft, plan, G))
                    dt = (time.time() - t0) / N
                    return c, dt

                try:
                    c, dt = one_case()
                    per_it = dt / max(ns, 1) * 1e6
                    print(f"tile={tpx} rows={rows} KW={KW} "
                          f"mode={mode or 'full':7s} {dt*1e3:7.2f} ms/frame "
                          f"(~{per_it:.2f} us/iter over {int(ns)} iters, "
                          f"compile {c:.0f}s)", flush=True)
                finally:
                    tiled_t._ABLATE = ""
                    tiled_t._NO_BREAK = _ray_old
                    tiled_t.SUPER_ROWS_RES = old_rows


if __name__ == "__main__":
    main()
