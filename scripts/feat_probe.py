"""Decompose the ray-feature-generation stage cost on the TPU.

The SRT_SWEEP_HOIST A/B (scripts/stack_sweep.py) put the stacked feature
pass at ~11 ms of the 19 ms nearest stage on the bench frame — bigger than
the kernel itself (8.0 ms).  The pass writes only ~270 MB, so at HBM speed
it should cost < 1 ms: something structural (sublane-misaligned band
concats, bf16 relayouts, the split3 barriers) is pathological.  This probe
times each sub-stage as N batched iterations in one jitted program:

  raw     o/d component extraction + cross products ([n, 10, tile] f32)
  f16     + zero-pad to the 16-row f32 operand (ray_tile_features_t)
  split   + split3 to h/m/l bf16 (barriers included), NO band concat
  stacked + band concat + pad (the full ray_tile_features_stacked)

Usage: python scripts/feat_probe.py [--frames 8]
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
    np.asarray(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    np.asarray(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"# {tag}: compile {c:.1f}s, {dt*1e3:.2f} ms/iter", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--tile", type=int, default=4096)
    args = p.parse_args()
    N = args.frames
    tile = args.tile

    from simple_raytracer_tpu.kernels import tiled_t
    from simple_raytracer_tpu.ops.camera import primary_rays

    o, d = primary_rays(1920, 1080, 6000.0)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    def loop(body):
        @jax.jit
        def many(o, d):
            def one(i, acc):
                return acc + body(o + i * 1e-6, d)
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        return many

    def raw(o, d):
        F, _, _ = tiled_t._features_rows(o, d, tile)
        return F.sum()

    def f16(o, d):
        F, _, _ = tiled_t.ray_tile_features_t(o, d, tile)
        return F.sum()

    def split(o, d):
        F, _, _ = tiled_t._features_rows(o, d, tile)
        h, m, l = tiled_t._split3(F)
        return (h.astype(jnp.float32).sum() + m.astype(jnp.float32).sum()
                + l.astype(jnp.float32).sum())

    def stacked(o, d):
        F, _, _ = tiled_t.ray_tile_features_stacked(o, d, tile, 6)
        return F.astype(jnp.float32).sum()

    for tag, body in [("raw", raw), ("f16", f16), ("split", split),
                      ("stacked", stacked)]:
        timed(loop(body), o, d, iters=N, tag=f"{tag} tile={tile}")


if __name__ == "__main__":
    main()
