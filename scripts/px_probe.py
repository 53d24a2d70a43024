"""Re-measure the px-only cull cliff under the round-4 pipeline.

Round 3: SRT_PX_MODE=only (projective test REPLACES the interval test for
apex tiles; plans near-identical) degraded the full frame 39 -> 145 ms —
an unexplained XLA scheduling pathology.  The round-4 pipeline (honest
view-varied loops, iota features, attr fetch, fused phong) reshapes the
whole schedule; this re-measures the cliff and, if it persists, isolates
the stage (cull-only vs full frame).

Usage: python scripts/px_probe.py
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
from simple_raytracer_tpu.kernels import tiled, tiled_t
from simple_raytracer_tpu.render import integrator as integ
from simple_raytracer_tpu.render.renderer import render_radiance
from simple_raytracer_tpu.ops.camera import primary_rays_tiled

W, H = 1920, 1080
N = 8
FOCAL = 6000.0

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
    mode="tiled", camera=CameraConfig(width=W, height=H, focal=FOCAL),
    bvh=BVHConfig(split="sah"))
prep = prepare(scene, cfg)
light = jnp.asarray([500., -300., -200.], jnp.float32)
tpx = tiled.effective_tile_px(cfg, prep.scene.verts.shape[0])
TILE = tpx * tpx
MAXV = cfg.cull_maxv
eye = jnp.eye(4, dtype=jnp.float32)


def timeit(name, body):
    @jax.jit
    def many(eye, light):
        def one(i, acc):
            V = eye.at[0, 3].add(i.astype(jnp.float32) * 1e-5)
            return acc + body(V, light + i.astype(jnp.float32) * 1e-4)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(eye, light)); c = time.time() - t0
    t0 = time.time(); float(many(eye, light)); dt = (time.time() - t0) / N
    print(f"[{name}] {dt*1e3:.2f} ms/frame (compile {c:.0f}s)", flush=True)


def full(V, lp):
    rad, hit = render_radiance(prep, cfg, lp, view_matrix=V)
    img = integ.finalize_image(rad, hit, cfg)
    return img.astype(jnp.int32).sum().astype(jnp.float32)


def cull_only(V, lp):
    o, d, _tx, _ty = primary_rays_tiled(W, H, tpx, FOCAL, False,
                                        view_matrix=V)
    plan = tiled_t.cull(prep, o.reshape(-1, 3), d.reshape(-1, 3), TILE,
                        MAXV, apex=True)
    return plan.astype(jnp.float32).sum() + lp.sum() * 0


for mode in ("and", "only", "and"):
    os.environ["SRT_PX_MODE"] = mode
    timeit(f"cull_px_{mode}", cull_only)
    timeit(f"full_px_{mode}", full)
os.environ.pop("SRT_PX_MODE", None)
