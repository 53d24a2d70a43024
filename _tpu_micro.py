"""Micro-kernels isolating the SMEM-ids fault: which mechanism breaks?
k1: DMA HBM->SMEM (rows,128) i32, static read
k2: same + dynamic 2D scalar read in fori loop
k3: deep double-buffered VMEM DMA chain w/o any SMEM (control)
"""
import numpy as np, jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, NB = 3, 384
ids_h = np.arange(8 * ROWS * 128, dtype=np.int32).reshape(8, ROWS, 128) % NB
G_h = np.arange(NB * 8 * 128, dtype=np.float32).reshape(NB, 8, 128)

def k1(ids_hbm, out_ref, ids_smem, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(ids_hbm.at[i], ids_smem, sem)
    cp.start(); cp.wait()
    out_ref[0] = (jnp.zeros((8, 128), jnp.float32) +
                  ids_smem[0, 0].astype(jnp.float32))

def k2(ids_hbm, out_ref, ids_smem, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(ids_hbm.at[i], ids_smem, sem)
    cp.start(); cp.wait()
    def body(k, acc):
        return acc + ids_smem[k // 128, k % 128].astype(jnp.float32)
    s = jax.lax.fori_loop(0, ROWS * 128, body, jnp.float32(0))
    out_ref[0] = jnp.zeros((8, 128), jnp.float32) + s

def k3(ids_hbm, G_hbm, out_ref, gbuf, sem):
    i = pl.program_id(0)
    def dma(slot, k):
        return pltpu.make_async_copy(G_hbm.at[(k * 7 + i) % NB], gbuf.at[slot], sem.at[slot])
    dma(0, 0).start()
    def body(k, acc):
        slot = k % 2
        @pl.when(k + 1 < 300)
        def _():
            dma((k + 1) % 2, k + 1).start()
        dma(slot, k).wait()
        return acc + jnp.sum(gbuf[slot])
    s = jax.lax.fori_loop(0, 300, body, jnp.float32(0))
    out_ref[0] = jnp.zeros((8, 128), jnp.float32) + s

def run(name, kernel, use_G):
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    args = [jnp.asarray(ids_h)]
    scratch = [pltpu.SMEM((ROWS, 128), jnp.int32), pltpu.SemaphoreType.DMA(())]
    if use_G:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        args.append(jnp.asarray(G_h))
        scratch = [pltpu.VMEM((2, 8, 128), jnp.float32), pltpu.SemaphoreType.DMA((2,))]
    try:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(8,),
                in_specs=in_specs,
                out_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
                scratch_shapes=scratch),
            out_shape=[jax.ShapeDtypeStruct((8, 8, 128), jnp.float32)],
        )(*args)
        v = np.asarray(out[0])
        print(f"{name}: OK  sample={v[0,0,0]:.1f} {v[3,0,0]:.1f}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

print("devices:", jax.devices(), flush=True)
run("k1-smem-dma-static", k1, False)
run("k2-smem-dyn2d", k2, False)
run("k3-deep-dma-chain", k3, True)
print("MICRO DONE", flush=True)
