"""Decompose the nearest kernel's PER-RAY fixed cost on the TPU.

iter_probe established the walk is insensitive to window work (dma ==
matmul == full) at both 16px and 64px tiles: the cost model is
~0.43 us/grid-step + ~2.1 ns/ray of fixed work.  This probe times stripped
pallas kernels over the bench frame's ray stream to attribute the per-ray
part:

  io      OD block in -> [1,T] row out (pallas grid + block IO only)
  feat    io + the 6-part stacked feature build (_build_feats)
  feat3   io + the 3-part build (tri grade)
  acc     feat + [32,T] accumulator init + final min/idx reduce + idx out
  win     acc + ONE window slice+matmul+epilogue (the marginal window)

Usage: python scripts/fixed_probe.py [--tile 4096] [--frames 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=4096)
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()
    N = args.frames
    TILE = args.tile

    from simple_raytracer_tpu.kernels import tiled_t
    from simple_raytracer_tpu.ops.camera import primary_rays

    W, H = 1920, 1080
    o, d = primary_rays(W, H, 6000.0)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    OD, n, R = tiled_t.ray_tile_od(o, d, TILE)
    G = jnp.zeros((64, 512), jnp.bfloat16)   # one fake resident window

    def make(body, outs=1):
        def kern(od_ref, g_ref, *refs):
            body(od_ref, g_ref, *refs)

        def call(ODv):
            out_shape = [jax.ShapeDtypeStruct((n, 1, TILE), jnp.float32)]
            out_specs = [pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)]
            if outs == 2:
                out_shape.append(
                    jax.ShapeDtypeStruct((n, 1, TILE), jnp.int32))
                out_specs.append(pl.BlockSpec((1, 1, TILE),
                                              lambda i: (i, 0, 0),
                                              memory_space=pltpu.VMEM))
            return pl.pallas_call(
                kern,
                grid=(n,),
                in_specs=[pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=out_specs,
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=tiled_t._VMEM_LIMIT),
                interpret=tiled_t._interpret(),
            )(ODv, G)
        return call

    def io_body(od_ref, g_ref, t_ref):
        t_ref[0] = od_ref[0, :1] + 1.0

    def feat_body(od_ref, g_ref, t_ref, parts=6):
        Fs = tiled_t._build_feats(od_ref[0], "stack", parts, TILE)
        # touch every band so Mosaic cannot dead-code the concat
        acc = jnp.zeros((1, TILE), jnp.float32)
        for k in range(0, Fs.shape[0], 7):
            acc = acc + Fs[k:k + 1].astype(jnp.float32)
        t_ref[0] = acc

    def acc_body(od_ref, g_ref, t_ref, i_ref):
        Fs = tiled_t._build_feats(od_ref[0], "stack", 6, TILE)
        bt = jnp.full((32, TILE), jnp.inf, jnp.float32)
        bi = jnp.full((32, TILE), -1, jnp.int32)
        row = jax.lax.broadcasted_iota(jnp.int32, (32, TILE), 0)
        t = Fs[:32].astype(jnp.float32) + Fs[32:64].astype(jnp.float32)
        imp = t < bt
        bt = jnp.where(imp, t, bt)
        bi = jnp.where(imp, row, bi)
        m = jnp.min(bt, axis=0, keepdims=True)
        bid = jnp.min(jnp.where(bt == m, bi, jnp.int32(0x7FFFFFFF)),
                      axis=0, keepdims=True)
        t_ref[0] = m
        i_ref[0] = jnp.where(jnp.isfinite(m), bid, -1)

    def win_body(od_ref, g_ref, t_ref, i_ref):
        Fs = tiled_t._build_feats(od_ref[0], "stack", 6, TILE)
        bt = jnp.full((32, TILE), jnp.inf, jnp.float32)
        bi = jnp.full((32, TILE), -1, jnp.int32)
        row = jax.lax.broadcasted_iota(jnp.int32, (32, TILE), 0)
        quad = tiled_t._step_quad(g_ref[:, :512], Fs, "stack")
        for b in range(2):
            t = tiled_t._mt_epilogue_t(quad, b * 128, 32, 1e-12)
            imp = t < bt
            bt = jnp.where(imp, t, bt)
            bi = jnp.where(imp, row + b, bi)
        m = jnp.min(bt, axis=0, keepdims=True)
        bid = jnp.min(jnp.where(bt == m, bi, jnp.int32(0x7FFFFFFF)),
                      axis=0, keepdims=True)
        t_ref[0] = m
        i_ref[0] = jnp.where(jnp.isfinite(m), bid, -1)

    cases = [
        ("io", make(io_body, 1)),
        ("feat", make(feat_body, 1)),
        ("feat3", make(functools.partial(feat_body, parts=3), 1)),
        ("acc", make(acc_body, 2)),
        ("win", make(win_body, 2)),
    ]
    for tag, call in cases:
        @jax.jit
        def many(OD):
            def one(i, a):
                outs = call(OD + i.astype(OD.dtype) * 1e-6)
                t = outs[0] if isinstance(outs, (tuple, list)) else outs
                return a + jnp.where(jnp.isfinite(t), t, 0.).sum()
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        t0 = time.time(); float(many(OD)); c = time.time() - t0
        t0 = time.time(); float(many(OD)); dt = (time.time() - t0) / N
        print(f"[{tag}] tile={TILE} n={n} {dt*1e3:7.2f} ms/frame "
              f"({dt/n*1e6:.2f} us/step, {dt/R*1e9:.2f} ns/ray; "
              f"compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
