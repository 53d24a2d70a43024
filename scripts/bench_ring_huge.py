"""Ring schedule at the CANNOT-REPLICATE regime: >= 10M triangles.

A 12x12 grid of instanced Stanford bunnies (144 x 69,451 = 10.0M
triangles) — the full scene's operands (gram_s 6-part alone ~5.1 GB)
do not fit a single v5e's HBM alongside the working set at production
precision, so DP replication is off the table and the ring (triangle
axis sharded, ray blocks rotating over ICI) is the only schedule.

This measures the ring's PER-ROTATION units on real hardware for
sampled 8-way shards (1.25M triangles each, built independently to
bound host RAM):
  - nearest-walk rotation (the production sublane/stack kernel on the
    shard, kernels/tiled_t.py via dist/ring._local_hit_fn)
  - any-hit (shadow) rotation (paged kernel over shard Gram pages)
and records the overlapped schedule's ppermute payload per rotation,
so ms/device = n * rotation_ms + max(0, ici_ms - rotation_ms) * n
can be modeled honestly (the half-block double buffer hides the
transfer behind the walk whenever ici_ms <= rotation_ms; DESIGN.md).

Usage: python scripts/bench_ring_huge.py [--grid 12] [--iters 16]
Writes artifacts/ring_huge_r5.jsonl.
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
    p.add_argument("--grid", type=int, default=12)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--shards", type=int, nargs="*", default=[0, 4])
    p.add_argument("--out", default="artifacts/ring_huge_r5.jsonl")
    args = p.parse_args()

    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.bvh import build_bvh, triangle_blocks
    from simple_raytracer_tpu.accel.prepared import (pack_blocks_np,
                                                     pack_blocks_stacked_np,
                                                     pack_pages_np)
    from simple_raytracer_tpu.dist.ring import _local_hit_fn
    from simple_raytracer_tpu.kernels import tiled as tk
    from simple_raytracer_tpu.ops.camera import primary_rays_tiled

    W, H = 1920, 1080
    G = args.grid
    t0 = time.time()
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="b0_0")
    for gy in range(G):
        for gx in range(G):
            key = f"b{gy}_{gx}"
            if key != "b0_0":
                sm.instance("b0_0", key)
            sm.set_color(key, (0.4 + 0.6 * gx / G, 0.7, 0.4 + 0.6 * gy / G))
            sm.transform_triangles(
                key, T.translate((-22.0 + 4.0 * gx, -12.0 + 2.2 * gy, 60.0))
                @ T.rotate_y(3.14159265) @ T.scale(12.0, 12.0, 12.0))
    scene = sm.build()
    verts = np.asarray(scene.verts)
    ntris = verts.shape[0]
    print(f"# scene: {ntris} tris, built in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=W, height=H, focal=3000.0),
        bvh=BVHConfig(split="sah"))
    tpx = 32
    tile = tpx * tpx
    o, d, _tx, _ty = primary_rays_tiled(W, H, tpx, 3000.0, False)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    n = args.n
    N = args.iters
    Rl = (o.shape[0] // n // tile) * tile
    ol, dl = jnp.asarray(o[:Rl]), jnp.asarray(d[:Rl])
    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    out = open(args.out, "a")

    block_size, page_tris, leaf = 32, 128, 8
    Tl = -(-(-(-ntris // n)) // page_tris) * page_tris
    vc_all = (verts[..., :3] / verts[..., 3:4]).astype(np.float32)
    tri_obj_all = np.asarray(scene.tri_obj)

    # full-scene operand sizes: document WHY replication is impossible
    lanes_full = ((ntris // block_size) + 8) * 4 * block_size
    rec = {"schedule": "ring_huge_scene", "tris": int(ntris),
           "grid": G, "n_way": n, "tris_per_shard": int(Tl),
           "rays_per_device": int(Rl), "tile_px": tpx,
           "full_gram_s6_gb": round(64 * lanes_full * 2 / 1e9, 2),
           "full_gram_t_gb": round(16 * lanes_full * 4 / 1e9, 2),
           "full_pages_gb": round(16 * 4 * ntris * 4 / 1e9, 2)}
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n"); out.flush()

    def timeit(fn, *a):
        f = jax.jit(fn)
        float(f(*a))
        t0 = time.time(); float(f(*a))
        return (time.time() - t0) / N * 1e3

    for s in args.shards:
        t0 = time.time()
        lo = s * Tl
        vs = vc_all[lo:min(lo + Tl, ntris)]
        tobj = tri_obj_all[lo:lo + vs.shape[0]]
        if vs.shape[0] < Tl:                   # degenerate pad, never hits
            pad = Tl - vs.shape[0]
            vs = np.concatenate(
                [vs, np.broadcast_to(vs[-1:, 0:1, :], (pad, 3, 3))], axis=0)
            tobj = np.concatenate([tobj, np.full((pad,), -1, np.int32)])
        flat = build_bvh(vs, leaf)
        vs, tobj = vs[flat.perm], tobj[flat.perm]
        bmin, bmax, _ = triangle_blocks(vs, block_size)
        bundle = {
            "verts_cart": jnp.asarray(vs),
            "block_min": jnp.asarray(bmin), "block_max": jnp.asarray(bmax),
            "gram_t": jnp.asarray(pack_blocks_np(vs, block_size)),
            "gram_s": jnp.asarray(pack_blocks_stacked_np(vs, block_size, 6)),
        }
        print(f"# shard {s}: built+put in {time.time()-t0:.1f}s "
              f"(gram_s {bundle['gram_s'].size*2/1e6:.0f} MB)",
              file=sys.stderr, flush=True)

        def near(bundle, o, d):
            lh, _ = _local_hit_fn(bundle, cfg.mt_eps, tile, cfg.cull_maxv)

            def one(i, acc):
                t, li = lh(o, d + i.astype(d.dtype) * 1e-9)
                return acc + jnp.where(jnp.isfinite(t), 1.0, 0.0).sum()
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        near_ms = timeit(near, bundle, ol, dl)
        print(f"# shard {s}: nearest {near_ms:.2f} ms/rotation",
              file=sys.stderr, flush=True)

        # shadow rotation: paged any-hit over the shard's Gram pages (the
        # ring_any_hit_other local step) from plausible surface points.
        # All big arrays ride as jit ARGUMENTS — closed-over device arrays
        # embed as HLO constants and blow the remote-compile request limit
        # (HTTP 413; see bench_ring_big.py).
        t0 = time.time()
        gram = jnp.asarray(pack_pages_np(vs, tobj, page_tris))
        pts = (ol + 60.0 * dl / jnp.linalg.norm(dl, axis=-1, keepdims=True))
        self_obj = jnp.zeros((Rl,), jnp.int32)

        def occ(bmin, bmax, gram, pts, light, self_obj):
            bs = tk.BlockSet.from_arrays(bmin, bmax, gram)
            sh_fn = tk.tiled_shadow_fn(bs, tile, cfg.mt_eps, cfg.cull_maxv,
                                       True)

            def one(i, acc):
                f = sh_fn(pts + i.astype(jnp.float32) * 1e-6,
                          jnp.broadcast_to(light, pts.shape), self_obj)
                return acc + f.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        occ_ms = timeit(occ, bundle["block_min"], bundle["block_max"],
                        gram, pts, light, self_obj)
        print(f"# shard {s}: anyhit {occ_ms:.2f} ms/rotation "
              f"(pages built {time.time()-t0:.1f}s)",
              file=sys.stderr, flush=True)

        # overlapped-schedule payload: (o, d, t, rec_flat[8]) halves
        payload_mb = Rl * (3 + 3 + 1 + 8) * 4 / 1e6
        rec = {"schedule": "ring_huge_rotation", "shard": s,
               "tris_per_shard": int(Tl), "rays_per_device": int(Rl),
               "nearest_rotation_ms": round(near_ms, 2),
               "anyhit_rotation_ms": round(occ_ms, 2),
               "frame_nearest_ms_per_device": round(near_ms * n, 2),
               "frame_anyhit_ms_per_device": round(occ_ms * n, 2),
               "ppermute_payload_mb": round(payload_mb, 2),
               "note": ("half-block overlap (dist/ring.py) hides the "
                        "rotation's ppermute behind the walk whenever "
                        "ici_ms <= rotation_ms; at ~45 GB/s/link the "
                        f"{payload_mb:.0f} MB payload is "
                        f"~{payload_mb/45:.2f} ms")}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n"); out.flush()
        del bundle, gram
    out.close()


if __name__ == "__main__":
    main()
