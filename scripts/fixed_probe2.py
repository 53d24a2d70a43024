"""Attribute the pallas per-grid-step IO floor (fixed_probe found io-only
kernels cost 1.5-2.2 ns/ray: ~the whole nearest walk).  Variants:

  base    blocked OD in [8,T] + blocked out [1,T]        (fixed_probe io)
  noin    NO ray input (iota features) + blocked out [1,T]
  noout   blocked OD in + ONE whole-array out [1,R] (dynamic lane writes)
  none    no ray input + whole-array out
  none2   no ray input + whole-array t AND idx outs (the real output set)
  feat_i  none2 + full 6-part stacked feature build from iota rows

Usage: python scripts/fixed_probe2.py [--tile 4096]
"""
import argparse
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
    RP = n * TILE
    A = jnp.zeros((8, 128), jnp.float32)     # stand-in feature matrix rows

    def mk_feats_iota(a_ref, i, parts):
        # F10 = A @ (px, py, 1): rows r = A[r,0]*px + A[r,1]*py + A[r,2]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, TILE), 1).astype(jnp.float32)
        px = lane + i.astype(jnp.float32)
        py = lane * 0.5
        rows = []
        for r in range(10):
            rows.append(a_ref[r % 8, 0] * px + a_ref[r % 8, 1] * py
                        + a_ref[r % 8, 2])
        return jnp.concatenate(rows, axis=0)

    def run(tag, call):
        @jax.jit
        def many(OD):
            def one(i, a):
                outs = call(OD + i.astype(OD.dtype) * 1e-6)
                t = outs[0] if isinstance(outs, (tuple, list)) else outs
                return a + t.reshape(-1)[:16].sum() + t.reshape(-1)[-16:].sum()
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        t0 = time.time(); float(many(OD)); c = time.time() - t0
        t0 = time.time(); float(many(OD)); dt = (time.time() - t0) / N
        print(f"[{tag}] tile={TILE} n={n} {dt*1e3:7.2f} ms/frame "
              f"({dt/n*1e6:.2f} us/step, {dt/R*1e9:.2f} ns/ray; "
              f"compile {c:.0f}s)", flush=True)

    cp = pltpu.CompilerParams(vmem_limit_bytes=tiled_t._VMEM_LIMIT)

    # --- base: blocked in + blocked out
    def base_kern(od_ref, a_ref, t_ref):
        t_ref[0] = od_ref[0, :1] + 1.0

    def base(ODv):
        return pl.pallas_call(
            base_kern, grid=(n,),
            in_specs=[pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n, 1, TILE), jnp.float32)],
            compiler_params=cp, interpret=tiled_t._interpret())(ODv, A)
    run("base", base)

    # --- noin: iota features, blocked out
    def noin_kern(a_ref, t_ref):
        i = pl.program_id(0)
        F = mk_feats_iota(a_ref, i, 10)
        acc = jnp.zeros((1, TILE), jnp.float32)
        for k in range(0, 10, 3):
            acc = acc + F[k:k + 1]
        t_ref[0] = acc

    def noin(ODv):
        return pl.pallas_call(
            noin_kern, grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n, 1, TILE), jnp.float32)],
            compiler_params=cp, interpret=tiled_t._interpret())(A)
    run("noin", noin)

    # --- noout: blocked in, whole-array out
    def noout_kern(od_ref, a_ref, t_ref):
        i = pl.program_id(0)
        t_ref[0, pl.ds(i * TILE, TILE)] = od_ref[0, 0] + 1.0

    def noout(ODv):
        return pl.pallas_call(
            noout_kern, grid=(n,),
            in_specs=[pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, RP), jnp.float32)],
            compiler_params=cp, interpret=tiled_t._interpret())(ODv, A)
    run("noout", noout)

    # --- none: iota in, whole out
    def none_kern(a_ref, t_ref):
        i = pl.program_id(0)
        F = mk_feats_iota(a_ref, i, 10)
        t_ref[0, pl.ds(i * TILE, TILE)] = F[0:1].reshape(TILE) + F[9]
    def none_(ODv):
        return pl.pallas_call(
            none_kern, grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, RP), jnp.float32)],
            compiler_params=cp, interpret=tiled_t._interpret())(A)
    run("none", none_)

    # --- none2: + idx out
    def none2_kern(a_ref, t_ref, i_ref):
        i = pl.program_id(0)
        F = mk_feats_iota(a_ref, i, 10)
        t_ref[0, pl.ds(i * TILE, TILE)] = F[0:1].reshape(TILE) + F[9]
        i_ref[0, pl.ds(i * TILE, TILE)] = jnp.full((TILE,), i, jnp.int32)
    def none2(ODv):
        return pl.pallas_call(
            none2_kern, grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((1, RP), jnp.float32),
                       jax.ShapeDtypeStruct((1, RP), jnp.int32)],
            compiler_params=cp, interpret=tiled_t._interpret())(A)
    run("none2", none2)

    # --- feat_i: none2 + the real band-stack build on iota features
    def feati_kern(a_ref, t_ref, i_ref):
        i = pl.program_id(0)
        F10 = mk_feats_iota(a_ref, i, 10)
        from simple_raytracer_tpu.accel.prepared import STACK_PATTERNS
        h, m, l = tiled_t._split3_k(F10)
        part = {"h": h, "m": m, "l": l}
        Fs = jnp.concatenate(
            [part[fp] for (_gp, fp) in STACK_PATTERNS[6]], axis=0)
        acc = jnp.zeros((1, TILE), jnp.float32)
        for k in range(0, Fs.shape[0], 7):
            acc = acc + Fs[k:k + 1].astype(jnp.float32)
        t_ref[0, pl.ds(i * TILE, TILE)] = acc.reshape(TILE)
        i_ref[0, pl.ds(i * TILE, TILE)] = jnp.full((TILE,), i, jnp.int32)
    def feati(ODv):
        return pl.pallas_call(
            feati_kern, grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((1, RP), jnp.float32),
                       jax.ShapeDtypeStruct((1, RP), jnp.int32)],
            compiler_params=cp, interpret=tiled_t._interpret())(A)
    run("feat_i", feati)


if __name__ == "__main__":
    main()
