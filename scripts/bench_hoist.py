"""Is the bench's light-only frame loop letting XLA hoist the light-
invariant nearest pass (cull + walk + records) out of the fori?

Variants (same process, same jitted structure as bench.py's many()):
  light   light_pos varies per frame (bench.py's methodology)
  view    the VIEW matrix varies per frame (epsilon rotation: every stage
          must rerun — the honest per-frame cost)

If view >> light, the bench's headline is amortizing the nearest pass
across frames and must switch to view-varying frames.

Usage: python scripts/bench_hoist.py
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
from simple_raytracer_tpu.render.renderer import render_radiance
from simple_raytracer_tpu.render import integrator

W, H = 1920, 1080
N = 8

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
    mode="tiled", camera=CameraConfig(width=W, height=H, focal=6000.0),
    bvh=BVHConfig(split="sah"))
prep = prepare(scene, cfg)
light = jnp.asarray([500., -300., -200.], jnp.float32)
eye = jnp.eye(4, dtype=jnp.float32)


def timeit(tag, many, *args):
    t0 = time.time(); int(many(*args)); c = time.time() - t0
    t0 = time.time(); int(many(*args)); dt = (time.time() - t0) / N
    print(f"[{tag}] {dt*1e3:.2f} ms/frame (compile+warm {c:.0f}s)",
          flush=True)


@jax.jit
def many_light(prep, light):
    def one(i, acc):
        lp = light + i.astype(jnp.float32) * 1e-4
        rad, hit = render_radiance(prep, cfg, lp)
        img = integrator.finalize_image(rad, hit, cfg)
        return acc + img.astype(jnp.int32).sum()
    return jax.lax.fori_loop(0, N, one, jnp.int32(0))


@jax.jit
def many_view(prep, light, eye):
    def one(i, acc):
        # epsilon view change: identical work, but every stage varies
        V = eye.at[0, 3].add(i.astype(jnp.float32) * 1e-5)
        rad, hit = render_radiance(prep, cfg, light, view_matrix=V)
        img = integrator.finalize_image(rad, hit, cfg)
        return acc + img.astype(jnp.int32).sum()
    return jax.lax.fori_loop(0, N, one, jnp.int32(0))


timeit("light", many_light, prep, light)
timeit("view", many_view, prep, light, eye)
