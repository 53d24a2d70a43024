"""Same-process HONEST full-frame A/B on the bench scene.

Round 4 found XLA hoists light-invariant stages (cull + nearest walk +
record gather) out of a light-only frame loop (scripts/bench_hoist.py:
light-vary 17.9 vs view-vary 61.2 ms/frame) — so every variant here
varies the VIEW per frame (epsilon translation: identical work, nothing
loop-invariant).

Variants:
  full        production pipeline (cull + nearest + occl + gather shade)
  full_attrs  production pipeline with SRT_ATTR_FETCH=1 (in-kernel
              attribute fetch replaces the [R, K] record gather)
  noshade     cull + nearest + occl + trivial consumer
  noocc       cull + nearest only
  kernel      identical to noocc but via hits() with cam_spec (iota feats)
  cull        the nearest-pass cull/plan only

Usage: python scripts/frame_ab.py [variants...]
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
N = 64
FOCAL = 6000.0
variants = sys.argv[1:] or ["full", "full_attrs", "noshade", "noocc",
                            "kernel", "cull"]

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


def calibrate():
    """Per-process device-state calibration (DESIGN.md round-4 part 3:
    short kernels vary 2-4x across processes).  A fixed bf16 matmul whose
    roofline time is known (~2.7 ms at 197 TFLOP/s) — report the ratio so
    stage absolutes from different processes can be normalized."""
    a = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def one(i, acc):
            # consume the FULL product: a sliced consumer lets XLA shrink
            # the matmul to one dot row
            return acc + (a @ a).astype(jnp.float32).sum() + i * 0.0
        return jax.lax.fori_loop(0, 32, one, jnp.float32(0))
    float(mm(a))
    t0 = time.time(); float(mm(a)); dt = (time.time() - t0) / 32
    peak = 2 * 8192 ** 3 / 197e12 * 1e3
    print(f"[calibration] {dt*1e3:.2f} ms/matmul "
          f"(roofline {peak:.2f} -> state {peak/dt/1e3*100:.0f}%)",
          flush=True)


calibrate()


def timeit(name, body):
    """body(V, light) -> scalar; V varies per frame (hoist-proof)."""
    @jax.jit
    def many(eye, light):
        def one(i, acc):
            V = eye.at[0, 3].add(i.astype(jnp.float32) * 1e-5)
            return acc + body(V, light + i.astype(jnp.float32) * 1e-4)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(eye, light)); c = time.time() - t0
    t0 = time.time(); float(many(eye, light)); dt = (time.time() - t0) / N
    print(f"[{name}] {dt*1e3:.2f} ms/frame (compile {c:.0f}s)", flush=True)


def rays(V):
    o, d, _tx, _ty = primary_rays_tiled(W, H, tpx, FOCAL, False,
                                        view_matrix=V)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def run_full(name, c=None):
    c = c or cfg

    def full(V, lp):
        rad, hit = render_radiance(prep, c, lp, view_matrix=V)
        img = integ.finalize_image(rad, hit, c)
        return img.astype(jnp.int32).sum().astype(jnp.float32)
    timeit(name, full)


if "full" in variants:
    os.environ["SRT_ATTR_FETCH"] = "0"
    run_full("full")

if "full_attrs" in variants and getattr(prep, "has_attr", False):
    os.environ["SRT_ATTR_FETCH"] = "1"
    run_full("full_attrs")
    os.environ["SRT_ATTR_FETCH"] = "0"

if "noshade" in variants:
    def noshade(V, lp):
        oo, dd = rays(V)
        t, idx = tiled_t.hits(prep, oo, dd, TILE, cfg.mt_eps, MAXV,
                              apex=True)
        hitm = jnp.isfinite(t)
        point = jnp.where(hitm[:, None], oo + t[:, None] * dd, 0.0)
        objv = prep.scene.tri_obj[jnp.maximum(idx, 0)]
        shadow_fn = tiled.tiled_shadow_fn(prep, TILE, cfg.mt_eps, MAXV,
                                          cfg.light.shadow_no_max_t, 1,
                                          impl=tiled_t)
        s = shadow_fn(point, jnp.broadcast_to(lp, point.shape), objv,
                      hit=hitm)
        return jnp.where(hitm, jnp.where(s, t * 0.2, t), 0.).sum()
    timeit("noshade", noshade)

if "noocc" in variants:
    def noocc(V, lp):
        oo, dd = rays(V)
        t, idx = tiled_t.hits(prep, oo, dd, TILE, cfg.mt_eps, MAXV,
                              apex=True)
        return (jnp.where(jnp.isfinite(t), t, 0.).sum()
                + idx.sum().astype(jnp.float32) * 0 + lp.sum() * 0)
    timeit("noocc", noocc)

if "kernel" in variants:
    def kernel(V, lp):
        oo, dd = rays(V)
        t, idx = tiled_t.hits(prep, oo, dd, TILE, cfg.mt_eps, MAXV,
                              apex=True, cam_spec=(V, FOCAL, W, H, tpx))
        return jnp.where(jnp.isfinite(t), t, 0.).sum() + lp.sum() * 0
    timeit("kernel", kernel)

if "cull" in variants:
    def cull_only(V, lp):
        oo, dd = rays(V)
        plan = tiled_t.cull(prep, oo, dd, TILE, MAXV, apex=True)
        return plan.astype(jnp.float32).sum() + lp.sum() * 0
    timeit("cull", cull_only)


if "attrs_stages" in variants and getattr(prep, "has_attr", False):
    # decomposition inside the attrs path: nearest+fetch only, then +occl
    def attrs_noocc(V, lp):
        oo, dd = rays(V)
        t, idx, attrs = tiled_t.hits_attrs(prep, oo, dd, TILE, cfg.mt_eps,
                                           MAXV, apex=True,
                                           cam_spec=(V, FOCAL, W, H, tpx))
        return (jnp.where(jnp.isfinite(t), t, 0.).sum()
                + attrs.sum() + lp.sum() * 0)
    timeit("attrs_noocc", attrs_noocc)

    def attrs_noshade(V, lp):
        oo, dd = rays(V)
        t, idx, attrs = tiled_t.hits_attrs(prep, oo, dd, TILE, cfg.mt_eps,
                                           MAXV, apex=True,
                                           cam_spec=(V, FOCAL, W, H, tpx))
        record = integ.records_from_attrs(prep.scene, attrs)
        hitm = jnp.isfinite(t)
        point = jnp.where(hitm[:, None], oo + t[:, None] * dd, 0.0)
        shadow_fn = tiled.tiled_shadow_fn(prep, TILE, cfg.mt_eps, MAXV,
                                          cfg.light.shadow_no_max_t, 1,
                                          impl=tiled_t)
        s = shadow_fn(point, jnp.broadcast_to(lp, point.shape),
                      record["obj"], hit=hitm)
        return jnp.where(hitm, jnp.where(s, t * 0.2, t), 0.).sum()
    timeit("attrs_noshade", attrs_noshade)


if "full_fused" in variants and getattr(prep, "has_attr", False):
    os.environ["SRT_ATTR_FETCH"] = "1"
    os.environ["SRT_FUSED_PHONG"] = "1"
    run_full("full_fused")
    os.environ["SRT_FUSED_PHONG"] = "0"


if "fshadow" in variants and getattr(prep, "has_attr", False):
    # round-5 fused-shadow A/B: production fused-Phong pipeline with the
    # legacy XLA-glue shadow path (point build + O(R) cull reductions +
    # ray-operand any-hit) vs the fused path (in-kernel bounds row ->
    # O(tiles) analytic shadow plan -> from-t any-hit, zero ray-sized XLA)
    os.environ["SRT_ATTR_FETCH"] = "1"
    os.environ["SRT_FUSED_PHONG"] = "1"
    os.environ["SRT_FUSED_SHADOW"] = "0"
    run_full("full_legacy_shadow")
    os.environ["SRT_FUSED_SHADOW"] = "1"
    run_full("full_fused_shadow")
    os.environ["SRT_FUSED_SHADOW"] = "0"


if "fstages" in variants and getattr(prep, "has_attr", False):
    # round-5 fused-pipeline stage decomposition: full fused-shadow frame,
    # minus-shadow, kernel-only (nearest + fused Phong + bounds row)
    os.environ["SRT_ATTR_FETCH"] = "1"
    os.environ["SRT_FUSED_PHONG"] = "1"
    os.environ["SRT_FUSED_SHADOW"] = "1"
    run_full("fs_full")
    import dataclasses as _dc
    cfg_ns = cfg.replace(light=_dc.replace(cfg.light, enable_shadows=False))
    def ns(V, lp, c=cfg_ns):
        rad, hit = render_radiance(prep, c, lp, view_matrix=V)
        img = integ.finalize_image(rad, hit, c)
        return img.astype(jnp.int32).sum().astype(jnp.float32)
    timeit("fs_noshadow", ns)

    def kshaded(V, lp):
        oo, dd = rays(V)
        out = tiled_t.hits_shaded(
            prep, oo, dd, TILE, cfg.mt_eps, lp,
            jnp.asarray(cfg.light.color, jnp.float32), MAXV,
            (V, FOCAL, W, H, tpx), want_bounds=True)
        t, idx, objv, rgb, bounds = out
        return (jnp.where(jnp.isfinite(t), t, 0.).sum()
                + jnp.where(jnp.isfinite(t)[:, None], rgb, 0.).sum()
                + bounds.sum())
    timeit("fs_kshaded", kshaded)

    def knear(V, lp):
        oo, dd = rays(V)
        t, idx = tiled_t.hits(prep, oo, dd, TILE, cfg.mt_eps, MAXV,
                              apex=True, cam_spec=(V, FOCAL, W, H, tpx))
        return jnp.where(jnp.isfinite(t), t, 0.).sum() + lp.sum() * 0
    timeit("fs_knearest", knear)
    os.environ["SRT_FUSED_SHADOW"] = "0"


if "cull_ab" in variants:
    def cull_ab(V, lp):
        oo, dd = rays(V)
        ab = tiled_t.analytic_tile_bounds((V, FOCAL, W, H, tpx),
                                          oo.shape[0] // TILE)
        plan = tiled_t.cull(prep, oo, dd, TILE, MAXV, apex=True, ab=ab)
        return plan.astype(jnp.float32).sum() + lp.sum() * 0
    timeit("cull_ab", cull_ab)

if "kernel_shaded" in variants and getattr(prep, "has_attr", False):
    def kernel_shaded(V, lp):
        oo, dd = rays(V)
        t, idx, objv, rgb = tiled_t.hits_shaded(
            prep, oo, dd, TILE, cfg.mt_eps, lp,
            jnp.asarray(cfg.light.color, jnp.float32), MAXV,
            (V, FOCAL, W, H, tpx))
        return (jnp.where(jnp.isfinite(t), t, 0.).sum()
                + jnp.where(jnp.isfinite(t)[:, None], rgb, 0.).sum())
    timeit("kernel_shaded", kernel_shaded)


if "cull_k" in variants:
    for mv in (128, 64):
        def cull_k(V, lp, mv=mv):
            oo, dd = rays(V)
            ab = tiled_t.analytic_tile_bounds((V, FOCAL, W, H, tpx),
                                              oo.shape[0] // TILE)
            plan = tiled_t.cull(prep, oo, dd, TILE, mv, apex=True, ab=ab)
            return plan.astype(jnp.float32).sum() + lp.sum() * 0
        timeit(f"cull_ab_maxv{mv}", cull_k)


if "stile" in variants:
    for st in (0, 1024, 256):
        cfg_st = cfg.replace(shadow_tile=st)
        def full_st(V, lp, c=cfg_st):
            rad, hit = render_radiance(prep, c, lp, view_matrix=V)
            img = integ.finalize_image(rad, hit, c)
            return img.astype(jnp.int32).sum().astype(jnp.float32)
        timeit(f"full_stile{st}", full_st)


if "wbah" in variants:
    # any-hit window-width retune under the round-4 regime (in-process
    # monkeypatch; WINDOW_BLOCKS_AH is read at trace time inside anyhit)
    for wb in (4, 2):   # 8 fails NB%wb for this scene
        tiled_t.WINDOW_BLOCKS_AH = wb
        os.environ["SRT_ATTR_FETCH"] = "1"
        os.environ["SRT_FUSED_PHONG"] = "1"
        run_full(f"full_wbah{wb}")
    tiled_t.WINDOW_BLOCKS_AH = 4


for v in variants:
    # config-override fulls under the production fused pipeline, e.g.
    # fmaxv128 (cull_maxv), ftpx32 (tile_px)
    if v.startswith("fmaxv"):
        os.environ["SRT_ATTR_FETCH"] = "1"
        os.environ["SRT_FUSED_PHONG"] = "1"
        os.environ["SRT_FUSED_SHADOW"] = "1"
        run_full(f"full_{v}", cfg.replace(cull_maxv=int(v[5:])))
    if v.startswith("ftpx"):
        os.environ["SRT_ATTR_FETCH"] = "1"
        os.environ["SRT_FUSED_PHONG"] = "1"
        os.environ["SRT_FUSED_SHADOW"] = "1"
        run_full(f"full_{v}", cfg.replace(tile_px=int(v[4:])))

for v in variants:
    if v.startswith("fsub"):
        # fused from-t shadow at FINER subtiles (exact per-group bounds):
        # e.g. fsub1024 -> shadow_tile 1024 = 4 subtiles of the 4096 tile
        os.environ["SRT_ATTR_FETCH"] = "1"
        os.environ["SRT_FUSED_PHONG"] = "1"
        os.environ["SRT_FUSED_SHADOW"] = "1"
        os.environ["SRT_FUSED_SHADOW_SUB"] = "1"
        run_full(f"full_{v}", cfg.replace(shadow_tile=int(v[4:])))
        os.environ.pop("SRT_FUSED_SHADOW_SUB")
