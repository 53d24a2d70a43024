"""Probe: post-walk one-hot attribute fetch cost inside a sublane kernel.

The shade stage's [R, K] record gather costs ~10 ms/frame in-frame (the
round-3 stub ablation) — per-ROW XLA gather cost.  With projective plans
(~10 windows per 64px tile) the winner's attributes can instead be fetched
INSIDE the nearest kernel by re-walking the tile's (short) window list once
after the argmin settles: per window, a one-hot of (lane id == winner id)
contracted against a resident attr operand A [16, lanes] on the MXU.

This toy measures JUST that post-walk loop at production shapes
(510 tiles x ns steps x KW windows, TILE_R=4096, window lanes 256), without
the main walk — an upper bound on the marginal cost of fusing the fetch.

Usage: python scripts/attr_fetch_probe.py [--windows 10]
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
    p.add_argument("--windows", type=int, default=10)
    p.add_argument("--tiles", type=int, default=510)
    p.add_argument("--tile_r", type=int, default=4096)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    BS, WB = 32, 2
    RPB = 4 * BS
    WL = WB * RPB                       # window lanes (256)
    NB = 2172                            # bunny-ish block count
    A_ROWS = 16
    TILE_R = args.tile_r
    NW = args.windows

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((A_ROWS, NB * RPB)).astype(
        np.float32).astype(jnp.bfloat16))
    # per-tile winner ids + fake plan starts
    bid = jnp.asarray(rng.integers(0, NB * BS,
                                   (args.tiles, 1, TILE_R)).astype(np.int32))
    starts = jnp.asarray(np.sort(rng.integers(
        0, NB // WB - 1, (args.tiles, NW)).astype(np.int32), axis=1))

    def kernel(starts_ref, bid_ref, A_res, out_ref):
        i = pl.program_id(0)
        b = bid_ref[0]                                   # [1, TILE_R]
        acc = jnp.zeros((A_ROWS, TILE_R), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (WL, TILE_R), 0)
        kind = (lane % RPB) // BS                        # 0 = det lanes
        row = lane % BS
        for k in range(NW):
            s = starts_ref[i, k]
            tri0 = (s * WB + (lane // RPB)) * BS + row
            oh = jnp.where((kind == 0) & (tri0 == b), 1.0, 0.0).astype(
                jnp.bfloat16)                            # [WL, TILE_R]
            As = A_res[:, pl.ds(s * WL, WL)]             # [A_ROWS, WL]
            acc = acc + jax.lax.dot_general(
                As, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] = acc

    @jax.jit
    def run(starts, bid, A):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(args.tiles,),
                in_specs=[
                    pl.BlockSpec((1, 1, TILE_R), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, A_ROWS, TILE_R),
                                       lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (args.tiles, A_ROWS, TILE_R), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(starts, bid, A)

    @jax.jit
    def many(starts, bid, A):
        def one(i, acc):
            out = run(starts, bid + i, A)
            return acc + out.sum()
        return jax.lax.fori_loop(0, args.iters, one, jnp.float32(0))

    t0 = time.time()
    float(many(starts, bid, A))
    print(f"# compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    float(many(starts, bid, A))
    per = (time.time() - t0) / args.iters
    print(f"# attr one-hot fetch: {per*1e3:.2f} ms "
          f"({args.tiles} tiles x {NW} windows, TILE_R={TILE_R})",
          flush=True)


if __name__ == "__main__":
    main()
