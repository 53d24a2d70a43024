"""Per-ray triangle-record gather microbenchmark (TPU).

The shade stage is gather-bound: [R]-sized rows fetched from [T]-sized
tables by hit index.  Compares layouts in ONE device program each:
  sep3   — tri_obj [T] i32, tri_tex [T] i32, tri_normal [T,3] f32 (3 gathers)
  packed5— one [T,5] f32 gather
  packed8— one [T,8] f32 gather (lane-padded row)
  onehot — no gather: per-128-chunk one-hot matmul contraction (MXU)
  phong  — elementwise shade math only (no gathers), for scale

Usage: python scripts/gather_probe.py [R] [T]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

R = int(sys.argv[1]) if len(sys.argv) > 1 else 2073600
T = int(sys.argv[2]) if len(sys.argv) > 2 else 72000
N = 8

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, T, size=R).astype(np.int32))
obj = jnp.asarray(rng.integers(0, 4, size=T).astype(np.int32))
tex = jnp.asarray(rng.integers(-1, 3, size=T).astype(np.int32))
nrm = jnp.asarray(rng.standard_normal((T, 3)).astype(np.float32))
p5 = jnp.concatenate([obj[:, None].astype(jnp.float32),
                      tex[:, None].astype(jnp.float32), nrm], axis=1)
p8 = jnp.concatenate([p5, jnp.zeros((T, 3), jnp.float32)], axis=1)


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def one(i, acc):
            return acc + fn(*a, i)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(*args)); c = time.time() - t0
    t0 = time.time(); float(many(*args)); dt = (time.time() - t0) / N
    print(f"[{name}] {dt*1e3:.2f} ms (compile {c:.0f}s)", flush=True)


def sep3(idx, obj, tex, nrm, i):
    ix = jnp.minimum(idx + i, T - 1)
    return (obj[ix].sum().astype(jnp.float32)
            + tex[ix].sum().astype(jnp.float32) + nrm[ix].sum())


def packed5(idx, p5, i):
    ix = jnp.minimum(idx + i, T - 1)
    return p5[ix].sum()


def packed8(idx, p8, i):
    ix = jnp.minimum(idx + i, T - 1)
    return p8[ix].sum()


timeit("sep3", sep3, idx, obj, tex, nrm)
timeit("packed5", packed5, idx, p5)
timeit("packed8", packed8, idx, p8)
