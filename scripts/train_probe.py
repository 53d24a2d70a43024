"""Decompose the flagship train step (bunny 960x540, tiled kernel,
fixed-topology recompute) on the TPU: where do the ~110 ms go?

Variants (each timed as N steps batched in one device program):
  fwd         loss only (no backward)
  step        full value_and_grad + SGD update (the artifact number)
  step_nosh   shadows disabled in cfg
  step_mat    gradients w.r.t. materials+light only (verts/tex frozen:
              kills the [R]->[T] scatter transposes of the vertex and
              record gathers)

Usage: python scripts/train_probe.py [--steps 8]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                         CameraConfig, LightConfig)
from simple_raytracer_tpu.dist.train import (DiffParams, extract_params,
                                             make_train_step)
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.render.renderer import render_radiance
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    args = p.parse_args()
    N = args.steps
    W, H = args.width, args.height

    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    sm.transform_triangles(
        "bunny", T.translate((0.0, -5.5, 60.0)) @ T.rotate_y(3.14159265)
        @ T.scale(50.0, 50.0, 50.0))
    sm.load_obj_file("/root/reference/cube.obj", key="ground")
    sm.set_color("ground", (0.0, 1.0, 0.0))
    sm.transform_triangles(
        "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30., 2., 30.))
    scene = sm.build()
    focal = 6000.0 * H / 1080.0
    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=W, height=H, focal=focal),
        bvh=BVHConfig(split="sah"))
    prep = prepare(scene, cfg)
    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
    target, hit = jax.jit(lambda p, l: render_radiance(p, cfg, l))(prep,
                                                                   light)
    target = jnp.where(hit[..., None], target, 0.0).block_until_ready()
    params = extract_params(prep.scene, light + 40.0)

    def timeit(tag, fn, *a):
        @jax.jit
        def many(*a):
            def one(i, acc):
                return acc + fn(*a, i)
            return jax.lax.fori_loop(0, N, one, jnp.float32(0))
        t0 = time.time(); float(many(*a)); c = time.time() - t0
        t0 = time.time(); float(many(*a)); dt = (time.time() - t0) / N
        print(f"[{tag}] {dt*1e3:.2f} ms/step (compile {c:.0f}s)",
              flush=True)

    def build(cfgx):
        # loss_fn only (reuse make_train_step internals via its closure):
        step = make_train_step(prep, cfgx, lr=1e-3)
        return step

    # fwd-only loss: rebuild the loss via a zero-lr "step" is still fwd+bwd;
    # instead call the diff render directly
    from simple_raytracer_tpu.diff.render import render_radiance_diff
    from simple_raytracer_tpu.dist.train import apply_params
    from simple_raytracer_tpu.ops.camera import primary_rays_tiled
    from simple_raytracer_tpu.kernels.tiled import effective_tile_px
    tpx = effective_tile_px(cfg, prep.scene.verts.shape[0])
    o, d, tx, ty = primary_rays_tiled(W, H, tpx, focal, False)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    def loss_of(params, cfgx, i):
        # d perturbed per iteration: the frozen-geometry walk is otherwise
        # loop-invariant and XLA hoists it (the round-4 honesty lesson)
        s, lp = apply_params(prep.scene, params)
        operand = dataclasses.replace(prep, scene=s)
        rad, hitm = render_radiance_diff(operand, cfgx, lp + i * 1e-4,
                                         origin=o,
                                         direction=d + i.astype(d.dtype)
                                         * 1e-9, apex=True)
        return jnp.sum(jnp.where(hitm[:, None], rad, 0.0) ** 2)

    def loss_hits(params, i):
        # hits + recompute only (no shading): the diff-path floor
        s, lp = apply_params(prep.scene, params)
        operand = dataclasses.replace(prep, scene=s)
        from simple_raytracer_tpu.kernels import tiled as _tk
        impl = _tk.get_impl(cfg.tiled_impl)
        from simple_raytracer_tpu.diff.render import differentiable_hits
        hit_fn = lambda oo, dd: impl.hits(
            jax.lax.stop_gradient(operand), oo, dd, tpx * tpx, cfg.mt_eps,
            cfg.cull_maxv, apex=True)
        t, idx = differentiable_hits(hit_fn, s.verts_cart(), o,
                                     d + i.astype(d.dtype) * 1e-9,
                                     cfg.mt_eps)
        return jnp.where(jnp.isfinite(t), t, 0.).sum() + lp.sum() * 0

    def gsum(g):
        leaves = jax.tree.leaves(g)
        return sum(x.sum() for x in leaves)

    timeit("fwd_hits", loss_hits, params)
    timeit("bwd_hits", lambda pp, i: gsum(jax.grad(
        lambda q: loss_hits(q, i))(pp)), params)
    cfg_ns = cfg.replace(light=LightConfig(enable_shadows=False))
    timeit("fwd_nosh", lambda pp, i: loss_of(pp, cfg_ns, i), params)
    timeit("fwd", lambda pp, i: loss_of(pp, cfg, i), params)
    # gsum consumer: EVERY grad is live (a .light_pos-only consumer lets
    # XLA dead-code most of the backward)
    timeit("bwd", lambda pp, i: gsum(jax.grad(
        lambda q: loss_of(q, cfg, i))(pp)), params)
    timeit("bwd_nosh", lambda pp, i: gsum(jax.grad(
        lambda q: loss_of(q, cfg_ns, i))(pp)), params)

    def loss_mat(small, pp, cfgx, i):
        q = DiffParams(verts=pp.verts, obj_color=small[0],
                       obj_ambient=small[1], obj_specular=small[2],
                       obj_shininess=small[3], tex_data=pp.tex_data,
                       light_pos=small[4])
        return loss_of(q, cfgx, i)

    small0 = (params.obj_color, params.obj_ambient, params.obj_specular,
              params.obj_shininess, params.light_pos)
    timeit("bwd_mat", lambda pp, i: jax.grad(
        lambda s: loss_mat(s, pp, cfg, i))(small0)[4].sum(), params)

    # params-chained fori over MY loss (same structure as make_train_step's
    # step, minus its loss_fn specifics): isolates whether the step/bwd gap
    # is the chaining+update or the loss construction
    @jax.jit
    def manyvg(params):
        def one(i, st):
            pp, acc = st
            loss, g = jax.value_and_grad(lambda q: loss_of(q, cfg, i))(pp)
            pp = jax.tree.map(lambda p, gg: p - 1e-3 * gg, pp, g)
            return pp, acc + loss
        _, acc = jax.lax.fori_loop(0, N, one, (params, jnp.float32(0)))
        return acc
    t0 = time.time(); float(manyvg(params)); c = time.time() - t0
    t0 = time.time(); float(manyvg(params))
    dt = (time.time() - t0) / N
    print(f"[vg_chain] {dt*1e3:.2f} ms/step (compile {c:.0f}s)", flush=True)

    # the real artifact number: full step via make_train_step
    step = make_train_step(prep, cfg, lr=1e-3)

    @jax.jit
    def manystep(params, target):
        def one(i, st):
            pp, acc = st
            pp, loss = step(pp, target)
            return pp, acc + loss
        _, acc = jax.lax.fori_loop(0, N, one, (params, jnp.float32(0)))
        return acc
    t0 = time.time(); float(manystep(params, target)); c = time.time() - t0
    t0 = time.time(); float(manystep(params, target))
    dt = (time.time() - t0) / N
    print(f"[step] {dt*1e3:.2f} ms/step (compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
