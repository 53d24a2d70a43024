"""Bisect the gap between the standalone walk (1.83 ms, iter_probe@N=64)
and the in-frame hits() pipeline (7.25 ms, frame_ab kernel@N=64).

Cases (all N=64, same process, bunny 1080p 64px tiles):
  walk       tiled_nearest_t on precomputed plan + OD rows (iter_probe)
  walk_iota  tiled_nearest_t on precomputed aux-plan + cam (iota variant)
  hits_od    full hits() without cam_spec (ray-based cull + OD build)
  hits_iota  full hits() with cam_spec (analytic cull + iota kernel)
  raygen     primary_rays_tiled alone
  cull_only  analytic cull alone (plan consumer)

Usage: python scripts/hits_gap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                         CameraConfig)
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled_t
from simple_raytracer_tpu.ops.camera import primary_rays_tiled

W, H, tpx = 1920, 1080, 64
N = 64
TILE = tpx * tpx

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
cfg = default_config().replace(
    mode="tiled", camera=CameraConfig(width=W, height=H, focal=6000.0),
    bvh=BVHConfig(split="sah"))
prep = prepare(sm.build(), cfg)
MAXV = cfg.cull_maxv
CS = (None, 6000.0, W, H, tpx)

o, d, tx, ty = primary_rays_tiled(W, H, tpx, 6000.0, False)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)


def timeit(tag, fn, *args):
    @jax.jit
    def many(*a):
        def one(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(*args)); c = time.time() - t0
    t0 = time.time(); float(many(*args)); dt = (time.time() - t0) / N
    print(f"[{tag}] {dt*1e3:.2f} ms ({c:.0f}s compile)", flush=True)


# precomputed operands for the standalone walks
G, prec, OD, n, R, odp = tiled_t._operands(prep, tiled_t._mode(), o, d, TILE)
plan0 = jax.jit(lambda oo, dd: tiled_t.cull(prep, oo, dd, TILE, MAXV,
                                            apex=True))(o, d)
plan0 = plan0.block_until_ready()
planA, cam = jax.jit(lambda p: tiled_t._iota_plan_cam(p, CS, n, TILE))(plan0)
planA = planA.block_until_ready()

timeit("walk", lambda i, OD, plan, G: jnp.where(jnp.isfinite(
    tiled_t.tiled_nearest_t(OD + i.astype(OD.dtype) * 1e-6, plan, G, TILE,
                            prep.block_size, tiled_t.WINDOW_BLOCKS,
                            cfg.mt_eps, prec=prec, res=True,
                            od_parts=odp)[0]), 1.0, 0.0).sum(),
       OD, plan0, G)

timeit("walk_iota", lambda i, plan, cam, G: jnp.where(jnp.isfinite(
    tiled_t.tiled_nearest_t(None, plan + (i - i), G, TILE,
                            prep.block_size, tiled_t.WINDOW_BLOCKS,
                            cfg.mt_eps, prec=prec, res=True, od_parts=odp,
                            cam=cam + i.astype(cam.dtype) * 1e-6,
                            iota_tpx=tpx)[0]), 1.0, 0.0).sum(),
       planA, cam, G)

timeit("raygen", lambda i, _o: sum(
    x.sum() for x in primary_rays_tiled(W, H, tpx, 6000.0 + i * 1e-5,
                                        False)[:2]), o)

timeit("cull_only", lambda i, oo, dd: tiled_t.cull(
    prep, oo, dd + i.astype(dd.dtype) * 1e-9, TILE, MAXV, apex=True,
    ab=tiled_t.analytic_tile_bounds(
        (None, 6000.0 + i * 1e-6, W, H, tpx), n)).astype(jnp.float32).sum(),
    o, d)

timeit("hits_od", lambda i, oo, dd: jnp.where(jnp.isfinite(
    tiled_t.hits(prep, oo, dd + i.astype(dd.dtype) * 1e-9, TILE,
                 cfg.mt_eps, MAXV, apex=True)[0]), 1.0, 0.0).sum(), o, d)

timeit("hits_iota", lambda i, oo, dd: jnp.where(jnp.isfinite(
    tiled_t.hits(prep, oo, dd + i.astype(dd.dtype) * 1e-9, TILE,
                 cfg.mt_eps, MAXV, apex=True, cam_spec=CS)[0]),
    1.0, 0.0).sum(), o, d)
