"""Isolate the ~2 ns/ray pallas floor (fixed_probe2): grid overhead vs the
per-step store vs lowering.

  empty   grid=(n,): step writes its slice ONLY at i==0 (other steps no-op)
  write   grid=(n,): every step writes [1,T] iota row at dynamic lane offset
  grid1   grid=(1,): ONE step, fori over n inside, same dynamic writes
  grid1f  grid=(1,): fori over n, iota-feature build + writes

Usage: python scripts/fixed_probe3.py [--tile 4096]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
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

    n = 507
    RP = n * TILE
    A = jnp.zeros((8, 128), jnp.float32)
    cp = pltpu.CompilerParams(vmem_limit_bytes=tiled_t._VMEM_LIMIT)

    def run(tag, call):
        @jax.jit
        def many(A):
            def one(i, a):
                t = call(A + i.astype(A.dtype) * 1e-6)
                return a + t.reshape(-1)[:8].sum() + t.reshape(-1)[-8:].sum()
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        t0 = time.time(); float(many(A)); c = time.time() - t0
        t0 = time.time(); float(many(A)); dt = (time.time() - t0) / N
        print(f"[{tag}] tile={TILE} n={n} {dt*1e3:7.2f} ms/frame "
              f"({dt/n*1e6:.2f} us/step, {dt/RP*1e9:.2f} ns/ray; "
              f"compile {c:.0f}s)", flush=True)

    def row(a_ref, i):
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, TILE), 1).astype(jnp.float32)
        return lane + a_ref[0, 0] + i.astype(jnp.float32)

    def empty_kern(a_ref, t_ref):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            t_ref[0, pl.ds(0, TILE)] = row(a_ref, i).reshape(TILE)

    def write_kern(a_ref, t_ref):
        i = pl.program_id(0)
        t_ref[0, pl.ds(i * TILE, TILE)] = row(a_ref, i).reshape(TILE)

    def grid1_kern(a_ref, t_ref):
        def body(j, c):
            t_ref[0, pl.ds(j * TILE, TILE)] = row(a_ref, j).reshape(TILE)
            return c
        jax.lax.fori_loop(0, n, body, jnp.int32(0))

    def grid1f_kern(a_ref, t_ref):
        from simple_raytracer_tpu.accel.prepared import STACK_PATTERNS

        def body(j, c):
            jf = j.astype(jnp.float32)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE), 1).astype(jnp.float32)
            px = lane + jf
            py = lane * 0.5
            rows = [a_ref[r % 8, 0] * px + a_ref[r % 8, 1] * py
                    + a_ref[r % 8, 2] for r in range(10)]
            F10 = jnp.concatenate(rows, axis=0)
            h, m, l = tiled_t._split3_k(F10)
            part = {"h": h, "m": m, "l": l}
            Fs = jnp.concatenate(
                [part[fp] for (_gp, fp) in STACK_PATTERNS[6]], axis=0)
            acc = jnp.zeros((1, TILE), jnp.float32)
            for k in range(0, Fs.shape[0], 7):
                acc = acc + Fs[k:k + 1].astype(jnp.float32)
            t_ref[0, pl.ds(j * TILE, TILE)] = acc.reshape(TILE)
            return c
        jax.lax.fori_loop(0, n, body, jnp.int32(0))

    def mk(kern, grid):
        def call(Av):
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, RP), jnp.float32),
                compiler_params=cp, interpret=tiled_t._interpret())(Av)
        return call

    run("empty", mk(empty_kern, (n,)))
    run("write", mk(write_kern, (n,)))
    run("grid1", mk(grid1_kern, (1,)))
    run("grid1f", mk(grid1f_kern, (1,)))


if __name__ == "__main__":
    main()
