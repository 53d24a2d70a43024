"""TPU decomposition of cull_blocks_lists: visibility / bucketing / scatter.
Bench scene, tile 32."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                         CameraConfig)
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled, tiled_t
from simple_raytracer_tpu.ops.camera import primary_rays_tiled

W, H = 1920, 1080
sm = SceneManager(root="/root/reference")
sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
sm.set_color("bunny", (0.8, 0.7, 0.6))
sm.transform_triangles(
    "bunny", T.translate((0., -5.5, 60.)) @ T.rotate_y(3.14159265)
    @ T.scale(50., 50., 50.))
sm.load_obj_file("/root/reference/cube.obj", key="ground")
sm.set_color("ground", (0.0, 1.0, 0.0))
sm.transform_triangles(
    "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
scene = sm.build()
cfg = default_config().replace(
    mode="tiled", tile_px=32,
    camera=CameraConfig(width=W, height=H, focal=6000.0),
    bvh=BVHConfig(split="sah", page_tris=128, block_size=32))
prep = prepare(scene, cfg)
o, d, tx, ty = primary_rays_tiled(W, H, 32, focal=6000.0)
TILE = 1024
N = 8
wb = tiled_t.WINDOW_BLOCKS
bmin, bmax = prep.block_min, prep.block_max
BS, PT = prep.block_size, wb * prep.block_size
MAXV = cfg.cull_maxv


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def one(i, acc):
            return acc + fn(*a, i)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(*args)); c = time.time() - t0
    t0 = time.time(); float(many(*args)); dt = (time.time() - t0) / N
    print(f"[{name}] {dt*1e3:.2f} ms/frame (compile {c:.0f}s)", flush=True)


def vis_only(o, d, i):
    v, tlo, n = tiled._visibility(o + i * 1e-4, d, TILE, bmin, bmax)
    return v.sum().astype(jnp.float32) + tlo.sum()


def to_slots(o, d, i):
    """Everything in cull_blocks_lists up to (but excluding) the scatter."""
    visible_b, tlo_b, n = tiled._visibility(o + i * 1e-4, d, TILE,
                                            bmin, bmax)
    NB = visible_b.shape[1]
    BPP = PT // BS
    NP_ = NB // BPP
    INF = jnp.float32(jnp.inf)
    visible = visible_b.reshape(n, NP_, BPP).any(-1)
    tlo = jnp.min(jnp.where(visible_b, tlo_b, INF).reshape(n, NP_, BPP),
                  axis=-1)
    tmin = jnp.min(jnp.where(visible, tlo, INF), axis=-1)
    tmax = jnp.max(jnp.where(visible, tlo, -INF), axis=-1)
    tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    qscale = jnp.maximum(tmax - tmin, 1e-20) / tiled.T_BUCKETS
    qb = jnp.clip(((tlo - tmin[:, None]) / qscale[:, None]).astype(jnp.int32),
                  0, tiled.T_BUCKETS - 1)
    bucket_cnt = jnp.stack(
        [(visible & (qb == b)).sum(-1) for b in range(tiled.T_BUCKETS)],
        axis=-1)
    base = jnp.cumsum(bucket_cnt, axis=-1) - bucket_cnt
    slot = jnp.full((n, NP_), tiled.PLAN_MAXV, jnp.int32)
    for b in range(tiled.T_BUCKETS):
        mb = visible & (qb == b)
        pos = jnp.cumsum(mb, axis=-1) - 1
        slot = jnp.where(mb, base[:, b:b + 1] + pos, slot)
    return slot.sum().astype(jnp.float32)


def full_cull(o, d, i):
    plan = tiled_t.cull(prep, o + i * 1e-4, d, TILE, MAXV)
    return plan.astype(jnp.float32).sum()


timeit("visibility", vis_only, o, d)
timeit("thru-slots", to_slots, o, d)
timeit("full-cull", full_cull, o, d)
