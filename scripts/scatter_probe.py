"""Is the train step's [R]->[T] gradient scatter-add replaceable?

The backward of ``verts_cart[idx]`` (fixed-topology recompute,
diff/render.py) is a scatter-add of [R, 9] rows into [T, 9] — and TPU
scatters serialize (DESIGN.md round 2: a ~8k-row plan scatter cost
13.5 ms).  Candidates, each accumulating the same [R, 9] -> [T, 9]:

  scatter   jnp .at[idx].add(vals)            (what AD's transpose emits)
  sort      sort rows by idx + jax.ops.segment_sum (sorted, unique-ish)
  onehot    per-4096-row chunks: one-hot [T_block] matmul accumulation

Usage: python scripts/scatter_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

R = 518400        # 960 x 540
T = 69504         # bunny padded
N = 8

rng = np.random.RandomState(0)
# realistic index stream: tile-coherent (sorted-ish runs with noise)
base = np.sort(rng.randint(0, T, size=R)).astype(np.int32)
swap = rng.permutation(R)[: R // 8]
idx_np = base.copy()
idx_np[swap] = rng.randint(0, T, size=swap.size)
idx = jnp.asarray(idx_np)
vals = jnp.asarray(rng.randn(R, 9).astype(np.float32))


def timeit(tag, fn):
    @jax.jit
    def many(idx, vals):
        def one(i, acc):
            out = fn(idx, vals + i.astype(jnp.float32) * 1e-6)
            return acc + out.sum()
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(idx, vals)); c = time.time() - t0
    t0 = time.time(); float(many(idx, vals)); dt = (time.time() - t0) / N
    print(f"[{tag}] {dt*1e3:.2f} ms ({c:.0f}s compile)", flush=True)


def scatter(idx, vals):
    return jnp.zeros((T, 9), jnp.float32).at[idx].add(vals)


def sortseg(idx, vals):
    order = jnp.argsort(idx)
    si = idx[order]
    sv = vals[order]
    return jax.ops.segment_sum(sv, si, num_segments=T)


def sortseg2(idx, vals):
    # sort once on the key, gather rows, then scatter SORTED rows (XLA may
    # specialize sorted unique scatters)
    order = jnp.argsort(idx)
    si = idx[order]
    sv = vals[order]
    return jnp.zeros((T, 9), jnp.float32).at[si].add(sv)


timeit("scatter", scatter)
timeit("sortseg", sortseg)
timeit("sortseg2", sortseg2)
