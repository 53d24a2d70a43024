"""Mosaic lowering probe: in-kernel winner-attribute fetch building blocks.

Validates on real TPU (and CPU interpret) that a Pallas kernel can turn a
per-ray winner id [1, TILE_R] into gathered attribute rows [TILE_R, AF]
with NO gather: per 128-triangle chunk, a sublane one-hot (id == chunk+iota)
and two native transposed-lhs matmuls:
    A_chunkT [128, AF] = dot(A_chunk [AF(K), 128], I_AF [AF(K), AF])
    contrib [TILE_R, AF] = dot(oh [128(K), TILE_R], A_chunkT [128(K), AF])

Usage: python scripts/attr_probe.py [n_tiles]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AF = 16          # attribute rows (pad to sublane multiple)
TILE_R = 256
NCH = 18         # 128-tri chunks in the toy scene
T = NCH * 128


def _interpret():
    return jax.devices()[0].platform == "cpu"


def _attr_kernel(bid_ref, A, out_ref, acc):
    bid = bid_ref[0]                                   # [1, TILE_R] i32
    eye = (jax.lax.broadcasted_iota(jnp.int32, (AF, AF), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (AF, AF), 1)
           ).astype(jnp.float32)
    acc[...] = jnp.zeros((TILE_R, AF), jnp.float32)
    tri_io = jax.lax.broadcasted_iota(jnp.int32, (128, TILE_R), 0)

    def body(c, _):
        base = c * 128
        hit_here = jnp.max(jnp.where(
            (bid >= base) & (bid < base + 128), 1.0, 0.0))

        @pl.when(hit_here > 0.0)
        def _():
            Ac = A[:, pl.ds(c * 128, 128)]             # [AF, 128]
            AcT = jax.lax.dot_general(
                Ac, eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [128, AF]
            oh = ((bid - base) == tri_io).astype(jnp.float32)
            contrib = jax.lax.dot_general(
                oh, AcT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [TILE_R, AF]
            acc[...] = acc[...] + contrib
        return _

    jax.lax.fori_loop(0, NCH, body, None)
    out_ref[0] = acc[...]


@jax.jit
def attr_fetch(bid, A):
    n = bid.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, TILE_R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_R, AF), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((TILE_R, AF), jnp.float32)],
    )
    (out,) = pl.pallas_call(
        _attr_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, TILE_R, AF), jnp.float32)],
        interpret=_interpret(),
    )(bid.reshape(n, 1, TILE_R), A)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8100
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((AF, T)).astype(np.float32))
    bid = jnp.asarray(rng.integers(-1, T, size=(n, TILE_R)).astype(np.int32))

    out = np.asarray(attr_fetch(bid, A))
    # oracle: plain gather (misses -> 0)
    An = np.asarray(A)
    bn = np.asarray(bid)
    oracle = np.where((bn >= 0)[..., None],
                      An.T[np.maximum(bn, 0)], 0.0)
    err = np.abs(out - oracle).max()
    rel = err / max(np.abs(oracle).max(), 1e-30)
    print(f"max |err| = {err} (rel {rel:.2e})", flush=True)
    # TPU DEFAULT matmul rounds the value operand to bf16 (~2^-8); the
    # real kernel transports values with a hi/lo split (~2^-17).  Interpret
    # mode must be exact.
    assert err == 0.0 if _interpret() else rel < 2 ** -7.5, err
    if _interpret():
        return

    @jax.jit
    def many(bid, A):
        def one(i, acc):
            return acc + attr_fetch(bid + (i - i), A).sum()
        return jax.lax.fori_loop(0, 8, one, jnp.float32(0))
    t0 = time.time(); float(many(bid, A)); c = time.time() - t0
    t0 = time.time(); float(many(bid, A)); dt = (time.time() - t0) / 8
    print(f"[attr_fetch] {dt*1e3:.2f} ms per {n}x{TILE_R} rays "
          f"(compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
