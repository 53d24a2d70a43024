"""Same-process HONEST full-frame A/B on the COMPLEX scene (the
reference's headline benchmark: ground cube + bunny + 3 textured trees,
600x400, hard shadows — simple_raytracer.cpp:530-796).

Round-4 measurement discipline (scripts/frame_ab.py): every variant
varies the VIEW per frame (orbit angle interpolation via per-frame
epsilon on the view matrix), N-frame amortization of the ~27 ms tunnel
call overhead, same-process comparisons only.

Variants:
  full       production pipeline (fused tex epilogue engages by default)
  nofused    SRT_FUSED_PHONG=0 (record-gather shade path)
  noshadow   production minus the occlusion pass
  kshaded    nearest + fused epilogue only (hits_shaded, no XLA finish)
  cull       the nearest-pass plan only
  fshadow    full with shadow_tile forced to the primary tile so the
             fused from-t shadow path engages (vs the dense-scene
             default stile=256 legacy path)
  stile[N]   full with shadow_tile=N (legacy path at that tile)

Usage: python scripts/complex_ab.py [variants...]
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
from simple_raytracer_tpu.scene.catalog import CATALOG, orbit_view
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled, tiled_t
from simple_raytracer_tpu.render import integrator as integ
from simple_raytracer_tpu.render.renderer import render_radiance
from simple_raytracer_tpu.ops.camera import primary_rays_tiled

W, H = 600, 400
N = 64
variants = sys.argv[1:] or ["full", "nofused", "noshadow", "kshaded",
                            "cull", "fshadow"]

sm, _view, light_np = CATALOG["complex"]("/root/reference", 0.0,
                                         bake_view=False)
cfg = default_config().replace(
    mode="tiled", camera=CameraConfig(width=W, height=H),
    bvh=BVHConfig(split="sah"))
prep = prepare(sm.build(), cfg)
light = jnp.asarray(light_np, jnp.float32)
tpx = tiled.effective_tile_px(cfg, prep.scene.verts.shape[0])
TILE = tpx * tpx
MAXV = cfg.cull_maxv
FOCAL = cfg.camera.focal
V0 = jnp.asarray(orbit_view(37.0, 50.0, -50.0, 30.0), jnp.float32)
print(f"tris={prep.scene.verts.shape[0]} tile_px={tpx} "
      f"attr_tex={prep.attr_tex}", flush=True)


def calibrate():
    a = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def one(i, acc):
            return acc + (a @ a).astype(jnp.float32).sum() + i * 0.0
        return jax.lax.fori_loop(0, 32, one, jnp.float32(0))
    float(mm(a))
    t0 = time.time(); float(mm(a)); dt = (time.time() - t0) / 32
    print(f"[calibration] {dt*1e3:.2f} ms/matmul", flush=True)


calibrate()


def timeit(name, body):
    """body(V, light) -> scalar; V varies per frame (hoist-proof)."""
    @jax.jit
    def many(V0, light):
        def one(i, acc):
            V = V0.at[0, 3].add(i.astype(jnp.float32) * 1e-5)
            return acc + body(V, light + i.astype(jnp.float32) * 1e-4)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(V0, light)); c = time.time() - t0
    t0 = time.time(); float(many(V0, light)); dt = (time.time() - t0) / N
    print(f"[{name}] {dt*1e3:.2f} ms/frame (compile {c:.0f}s)", flush=True)


def run_full(name, c=None):
    c = c or cfg

    def full(V, lp):
        rad, hit = render_radiance(prep, c, lp, view_matrix=V)
        img = integ.finalize_image(rad, hit, c)
        return img.astype(jnp.int32).sum().astype(jnp.float32)
    timeit(name, full)


def rays(V):
    o, d, _tx, _ty = primary_rays_tiled(W, H, tpx, FOCAL, False,
                                        view_matrix=V)
    return o.reshape(-1, 3), d.reshape(-1, 3)


if "full" in variants:
    run_full("full")

if "nofused" in variants:
    os.environ["SRT_FUSED_PHONG"] = "0"
    run_full("nofused")
    os.environ.pop("SRT_FUSED_PHONG")

if "noshadow" in variants:
    import dataclasses as _dc
    run_full("noshadow", cfg.replace(
        light=_dc.replace(cfg.light, enable_shadows=False)))

if "kshaded" in variants:
    def kshaded(V, lp):
        oo, dd = rays(V)
        t, idx, objv, comp = tiled_t.hits_shaded(
            prep, oo, dd, TILE, cfg.mt_eps, lp,
            jnp.asarray(cfg.light.color, jnp.float32), MAXV,
            (V, FOCAL, W, H, tpx))
        return (jnp.where(jnp.isfinite(t), t, 0.).sum()
                + jnp.where(jnp.isfinite(t)[:, None], comp, 0.).sum())
    timeit("kshaded", kshaded)

if "cull" in variants:
    def cull_only(V, lp):
        oo, dd = rays(V)
        ab = tiled_t.analytic_tile_bounds((V, FOCAL, W, H, tpx),
                                          oo.shape[0] // TILE)
        plan = tiled_t.cull(prep, oo, dd, TILE, MAXV, apex=True, ab=ab)
        return plan.astype(jnp.float32).sum() + lp.sum() * 0
    timeit("cull", cull_only)

if "fshadow" in variants:
    run_full("fshadow_tile_primary", cfg.replace(shadow_tile=TILE))

for v in variants:
    if v.startswith("stile"):
        run_full(f"full_{v}", cfg.replace(shadow_tile=int(v[5:])))
    if v.startswith("tpx"):
        run_full(f"full_{v}", cfg.replace(tile_px=int(v[3:])))
    if v.startswith("maxv"):
        run_full(f"full_{v}", cfg.replace(cull_maxv=int(v[4:])))
    if v.startswith("wide"):
        # plan width 4096 + maxv high enough that EVERY tile stays in
        # list mode (sorted front-to-back + the bound16 early break);
        # the p90 through-geometry tile walks 2215 windows in RANGE mode
        # (no break) at the shipping maxv=248/plan_w=1024
        os.environ["SRT_TILED_PLAN_W_BIG"] = "4096"
        run_full(f"full_{v}", cfg.replace(cull_maxv=int(v[4:])))
        os.environ.pop("SRT_TILED_PLAN_W_BIG")

if "sstages" in variants:
    # shadow-stage decomposition: points fixed (one nearest pass up
    # front), LIGHT varied per iteration (the whole stage depends on it,
    # so nothing hoists).  socull = the legacy shadow cull+plan build
    # from points; soccl = cull + any-hit kernel.
    from simple_raytracer_tpu.kernels import tiled as tk
    oo, dd = rays(V0)
    t0_, idx0_ = tiled_t.hits(prep, oo, dd, TILE, cfg.mt_eps, MAXV,
                              apex=True, cam_spec=(V0, FOCAL, W, H, tpx))
    hm = jnp.isfinite(t0_)
    ts = jnp.where(hm, t0_, 0.0)
    point = jnp.where(hm[:, None], oo + ts[:, None] * dd, 0.0)
    objv = prep.scene.tri_obj[jnp.maximum(idx0_, 0)]
    stile = tk._shadow_tile(cfg, TILE, prep)
    maxv_eff = tk.effective_cull_maxv(cfg, prep)
    print(f"# sstages: stile={stile} maxv={maxv_eff} "
          f"hits={int(hm.sum())}", flush=True)

    def socull(V, lp):
        lpb = jnp.broadcast_to(lp, point.shape)
        plan = tiled_t.cull_occl(prep, point, lpb - point, stile,
                                 maxv_eff, None, apex_rev=True)
        return plan.astype(jnp.float32).sum()
    try:
        timeit("socull", socull)
    except Exception as e:
        print(f"# socull failed: {e!r}", flush=True)

    def soccl(V, lp):
        sh = tk.tiled_shadow_fn(prep, stile, cfg.mt_eps, maxv_eff,
                                cfg.light.shadow_no_max_t, 1,
                                impl=tiled_t)
        s = sh(point, jnp.broadcast_to(lp, point.shape), objv, hit=hm)
        return s.sum().astype(jnp.float32)
    timeit("soccl", soccl)
