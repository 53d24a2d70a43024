"""TPU decomposition of the two-pass (prepass+refine) nearest pipeline on
the bench scene: cull / prepass kernel / plan compaction / refine kernel,
plus flagged-window statistics.  Timed as N batched frames in one jitted
call (tunnel RTT ~1 s per host call — CLAUDE.md)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                         CameraConfig)
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled, tiled_t
from simple_raytracer_tpu.ops.camera import primary_rays

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
o, d = primary_rays(W, H, focal=6000.0)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
perm, inv = tiled.tile_permutation(W, H, cfg.tile_px)
operm = jnp.asarray(np.asarray(o)[perm])
dperm = jnp.asarray(np.asarray(d)[perm])
TILE = cfg.tile_px * cfg.tile_px
MAXV = cfg.cull_maxv
EPS = cfg.mt_eps
WB = tiled_t.WINDOW_BLOCKS
BS = prep.block_size
N = 8


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def one(i, acc):
            return acc + fn(*a, i)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(*args)); c = time.time() - t0
    t0 = time.time(); float(many(*args)); dt = (time.time() - t0) / N
    print(f"[{name}] {dt*1e3:.1f} ms/frame (compile {c:.0f}s)", flush=True)


Ft, n, R = tiled_t.ray_tile_features_t(operm, dperm, TILE)
plan = jax.jit(lambda o, d: tiled_t.cull(prep, o, d, TILE, MAXV))(
    operm, dperm)
flags = jax.jit(lambda F, p: tiled_t.tiled_prepass_t(
    F, p, prep.gram_t, TILE, BS, WB, EPS))(Ft, plan)
plan2 = jax.jit(tiled_t._refine_plan)(plan, flags)

# stats: original vs refined window counts
p1, p2 = np.asarray(plan), np.asarray(plan2)
c1 = np.where(p1[:, 3] == 1, p1[:, 2], p1[:, 1])
c2 = np.where(p2[:, 3] == 1, p2[:, 2], p2[:, 1])
print(f"# windows/tile: plan {c1.mean():.1f} (max {c1.max()}) -> refined "
      f"{c2.mean():.1f} (max {c2.max()})", flush=True)

timeit("cull", lambda o, d, i: tiled_t.cull(
    prep, o + i * 1e-4, d, TILE, MAXV).astype(jnp.float32).sum(),
    operm, dperm)
timeit("prepass-kernel", lambda F, p, i: tiled_t.tiled_prepass_t(
    F + i * 0e0, p, prep.gram_t, TILE, BS, WB, EPS).sum(), Ft, plan)
timeit("refine-compact", lambda p, f, i: tiled_t._refine_plan(
    p, f + i * 0e0).astype(jnp.float32).sum(), plan, flags)
timeit("pass2-kernel", lambda F, p, i: jnp.where(
    jnp.isfinite(tiled_t.tiled_nearest_t(
        F + i * 0e0, p, prep.gram_t, TILE, BS, WB, EPS)[0]),
    1.0, 0.0).sum(), Ft, plan2)
timeit("direct-highest", lambda F, p, i: jnp.where(
    jnp.isfinite(tiled_t.tiled_nearest_t(
        F + i * 0e0, p, prep.gram_t, TILE, BS, WB, EPS)[0]),
    1.0, 0.0).sum(), Ft, plan)
