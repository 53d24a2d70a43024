"""How much does ONE XLA op on a small [n, NB] array cost on the TPU?

The analytic-bounds cull still measures ~3.3 ms/frame although its
[510, 1088] arithmetic is ~50 vector-op-passes (~0.05 ms of VPU work).
Hypothesis: at this array size the cull is LAUNCH/op-count bound — each
XLA fusion/reduce costs O(10-100 us) fixed.  This times chains of K
dependent elementwise ops (forced unfusable via optimization_barrier)
and K chained reduces at the cull's shapes.

Usage: python scripts/xla_op_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 8
x0 = jnp.ones((510, 1088), jnp.float32)


def timeit(tag, fn):
    @jax.jit
    def many(x):
        def one(i, acc):
            return acc + fn(x + i.astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(x0)); c = time.time() - t0
    t0 = time.time(); float(many(x0)); dt = (time.time() - t0) / N
    print(f"[{tag}] {dt*1e3:.3f} ms ({c:.0f}s compile)", flush=True)


def chain_fused(x, K=40):
    for _ in range(K):
        x = x * 1.0000001 + 1e-7
    return x.sum()


def chain_barrier(x, K=40):
    # one barrier per op: K separate XLA computations
    for _ in range(K):
        x = jax.lax.optimization_barrier(x * 1.0000001 + 1e-7)
    return x.sum()


def chain_reduce(x, K=12):
    acc = jnp.float32(0)
    for k in range(K):
        acc = acc + (x + k).min(axis=1).sum()      # K row reduces
    return acc


def chain_div(x, K=36):
    y = x
    for k in range(K):
        y = y / (x + jnp.float32(k + 1))
    return y.sum()


timeit("fused40", chain_fused)
timeit("barrier40", chain_barrier)
timeit("reduce12", chain_reduce)
timeit("div36", chain_div)
timeit("topk248", lambda x: jax.lax.top_k(x, 248)[0].sum())
timeit("topk64", lambda x: jax.lax.top_k(x, 64)[0].sum())
