"""Ring schedule at its DESIGN regime: a scene ~16x the flagship.

The round-4 ladder (artifacts/ring_tpu_r4.jsonl) showed the per-rotation
floor cannot amortize on 8,704-triangle bunny shards — the ring exists
for scenes too big to replicate.  This instantiates a GRID of bunnies
(~1.1 M triangles at 4x4), measures

  - the single-chip nearest pass on the FULL scene (the DP per-device
    cost when replication still fits), and
  - the ring per-rotation unit at 8-way (139k-triangle shards),

so the crossover claim (ring amortizes when shards are big) gets real
numbers.  Usage: python scripts/bench_ring_big.py [--grid 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=4)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--out", default="artifacts/ring_big_r4.jsonl")
    args = p.parse_args()

    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.dist.ring import shard_geometry, _local_hit_fn
    from simple_raytracer_tpu.kernels import tiled_t
    from simple_raytracer_tpu.ops.camera import primary_rays_tiled

    W, H = 1920, 1080
    G = args.grid
    t0 = time.time()
    sm = SceneManager(root="/root/reference")
    for gy in range(G):
        for gx in range(G):
            key = f"bunny{gy}_{gx}"
            sm.load_obj_file("/root/reference/obj/stanford-bunny.obj",
                             key=key)
            sm.set_color(key, (0.5 + 0.5 * gx / G, 0.7, 0.5 + 0.5 * gy / G))
            sm.transform_triangles(
                key, T.translate((-12.0 + 8.0 * gx, -8.0 + 5.5 * gy, 60.0))
                @ T.rotate_y(3.14159265) @ T.scale(25.0, 25.0, 25.0))
    scene = sm.build()
    ntris = scene.verts.shape[0]
    print(f"# scene: {ntris} tris, built in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=W, height=H, focal=3000.0),
        bvh=BVHConfig(split="sah"))
    tpx = 32
    tile = tpx * tpx
    o, d, tx, ty = primary_rays_tiled(W, H, tpx, 3000.0, False)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    N = args.iters
    out = open(args.out, "a")

    # --- single-chip DP baseline: full-scene nearest pass
    t0 = time.time()
    prep = prepare(scene, cfg)
    print(f"# prepare: {time.time()-t0:.1f}s "
          f"(gram_s {prep.gram_s.size * 2 / 1e6:.0f} MB, resident: "
          f"{tiled_t._resident(prep.gram_s)})", file=sys.stderr, flush=True)

    # prep rides as a jit ARGUMENT: closed-over device arrays embed as HLO
    # constants and a 570 MB constant blows the remote-compile service's
    # request limit (HTTP 413)
    @jax.jit
    def many_full(prep, o, d):
        def one(i, acc):
            t, idx = tiled_t.hits(prep, o, d + i.astype(d.dtype) * 1e-9,
                                  tile, cfg.mt_eps, cfg.cull_maxv,
                                  apex=True)
            return acc + jnp.where(jnp.isfinite(t), 1.0, 0.0).sum()
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    float(many_full(prep, o, d))
    t0 = time.time(); hits_n = float(many_full(prep, o, d))
    full_ms = (time.time() - t0) / N * 1e3
    rec = {"schedule": "dp_single_chip_nearest", "tris": int(ntris),
           "tile_px": tpx, "nearest_ms": round(full_ms, 2),
           "hit_frac": round(hits_n / N / o.shape[0], 3)}
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n"); out.flush()

    # --- ring per-rotation unit at 8-way
    n = 8
    t0 = time.time()
    shard = shard_geometry(scene, n)
    print(f"# shard_geometry({n}): {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    Rl = (o.shape[0] // n // tile) * tile
    ol, dl = o[:Rl], d[:Rl]
    rows = []
    for s in range(0, n, 2):        # sample every other shard
        bundle = {k: jnp.asarray(v[s]) for k, v in shard.items()}
        local_hit, culled = _local_hit_fn(bundle, cfg.mt_eps, tile,
                                          cfg.cull_maxv)

        @jax.jit
        def many(bundle, o, d):
            lh, _ = _local_hit_fn(bundle, cfg.mt_eps, tile, cfg.cull_maxv)

            def one(i, acc):
                t, li = lh(o, d + i.astype(d.dtype) * 1e-9)
                return acc + jnp.where(jnp.isfinite(t), 1.0, 0.0).sum()
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        float(many(bundle, ol, dl))
        t0 = time.time(); float(many(bundle, ol, dl))
        rows.append((time.time() - t0) / N * 1e3)
        print(f"# shard {s}: {rows[-1]:.2f} ms/rotation", file=sys.stderr,
              flush=True)
    rec = {"schedule": "ring_per_rotation_tpu_big", "n_way": n,
           "tris": int(ntris), "tile_px": tpx,
           "tris_per_shard": int(shard["verts_cart"].shape[1]),
           "rays_per_device": Rl,
           "rotation_ms_mean": round(float(np.mean(rows)), 2),
           "frame_compute_ms_per_device": round(float(np.mean(rows)) * n, 2),
           "dp_single_chip_nearest_ms": round(full_ms, 2)}
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n"); out.flush()
    out.close()


if __name__ == "__main__":
    main()
