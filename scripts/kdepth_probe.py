"""Measure MXU pass cost vs contraction depth K (transposed-lhs dot).

The nearest kernel's MT-Gram contraction is K=16 of the MXU's 128-deep
systolic array.  If a matmul pass costs the SAME regardless of K (<=128),
then the "tri" tier's three K=16 bf16 products (Gh.Fh + Gh.Fl + Gl.Fh) can
be stacked along K into ONE K=48 matmul — same MACs, one third the passes —
and a 3-way-split K=96 stack buys ~f32-exact products in ONE pass.  If pass
cost is ~linear in K, stacking is neutral and the K-depth analysis in
DESIGN.md needs revision.  This probe times the same [M, K] x [K, N]
contraction shape as the kernel (M=2048 rows, N=256 rays) at K in
{16, 32, 48, 64, 96, 128}, batched many iterations inside one jit.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import functools

ITERS = 2000
M, N = 2048, 256


def bench_k(K, dtype):
    a = jnp.asarray(np.random.randn(K, M), dtype)
    b = jnp.asarray(np.random.randn(K, N), dtype)

    @jax.jit
    def run(a, b):
        def body(i, acc):
            # vary b so the loop isn't hoisted
            bb = b + i.astype(dtype)
            q = jax.lax.dot_general(
                a, bb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + q[:1, :1]
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((1, 1), jnp.float32))

    np.asarray(run(a, b))          # compile + warm
    t0 = time.time()
    np.asarray(run(a, b))
    dt = (time.time() - t0) / ITERS
    return dt * 1e6


def main():
    print("device:", jax.devices()[0])
    for dtype in (jnp.bfloat16, jnp.float32):
        for K in (16, 32, 48, 64, 96, 128):
            us = bench_k(K, dtype)
            print(f"dtype={dtype.__name__:9s} K={K:4d}  "
                  f"{us:8.2f} us/matmul  ({M}x{N} out)")


if __name__ == "__main__":
    main()
