"""TPU frame-cost decomposition on the reference's HEADLINE scene (active
complex scene: ground cube + bunny + 3 textured trees, 600x400, hard
shadows; simple_raytracer.cpp:530-796) — the turntable frame bench_sweep.py
times end-to-end.  Stages are timed as batched frames inside one device
program (amortizes the ~1 s tunnel RTT).

Run on a TPU host: python scripts/profile_complex.py [stages...]
Stages: cull hits shade occl full noshadow   (default: all)
Knobs:  SRT_PROF_TILE (tile_px, default config), SRT_PROF_ANGLE (deg),
        plus the kernel's SRT_TILED_* / SRT_MT_PRECISION env switches.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                         CameraConfig)
from simple_raytracer_tpu.scene.catalog import CATALOG
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled
from simple_raytracer_tpu.ops.camera import primary_rays_tiled
from simple_raytracer_tpu.render import integrator as integ

W, H = 600, 400
stages = set(sys.argv[1:]) or {"cull", "hits", "shade", "occl", "full",
                               "noshadow"}

angle = float(os.environ.get("SRT_PROF_ANGLE", "0"))
sm, view, light_np = CATALOG["complex"]("/root/reference", angle,
                                        bake_view=False)
cfg = default_config().replace(mode="tiled", bvh=BVHConfig(split="sah"),
                               camera=CameraConfig(width=W, height=H))
if os.environ.get("SRT_PROF_TILE"):
    cfg = cfg.replace(tile_px=int(os.environ["SRT_PROF_TILE"]))
prep = prepare(sm.build(), cfg)
if not cfg.tile_px:            # resolve the adaptive default for the
    from simple_raytracer_tpu.kernels.tiled import effective_tile_px
    cfg = cfg.replace(tile_px=effective_tile_px(
        cfg, prep.scene.verts.shape[0]))       # stage timers below
light = jnp.asarray(light_np, jnp.float32)
o, d, _tx, _ty = primary_rays_tiled(W, H, cfg.tile_px, cfg.camera.focal,
                                    cfg.camera.normalize_dirs,
                                    view_matrix=jnp.asarray(view, jnp.float32))
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
TILE = cfg.tile_px * cfg.tile_px
MAXV = cfg.cull_maxv
IMPL = tiled.get_impl(None)
N = 8
print(f"tris={prep.scene.verts.shape[0]} tile_px={cfg.tile_px} "
      f"impl={os.environ.get('SRT_TILED_IMPL', 'sublane')}", flush=True)


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def one(i, acc):
            return acc + fn(*a, i)
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0 = time.time(); float(many(*args)); c = time.time() - t0
    t0 = time.time(); float(many(*args)); dt = (time.time() - t0) / N
    print(f"[{name}] {dt*1e3:.1f} ms/frame (compile {c:.0f}s)", flush=True)


if "cull" in stages:
    def cull_only(prep, o, d, i):
        plan = IMPL.cull(prep, o + i * 1e-4, d, TILE, MAXV)
        return plan.astype(jnp.float32).sum()
    timeit("cull", cull_only, prep, o, d)

if "hits" in stages:
    def hits_only(prep, o, d, i):
        t, idx = IMPL.hits(prep, o + i * 1e-4, d, TILE, cfg.mt_eps, MAXV)
        return jnp.where(jnp.isfinite(t), t, 0.0).sum()
    timeit("hits", hits_only, prep, o, d)

_need_hits = {"shade", "occl", "socull"} & stages
if _need_hits:
    t0_, idx0_ = jax.jit(lambda oo, dd: IMPL.hits(
        prep, oo, dd, TILE, cfg.mt_eps, MAXV))(o, d)
    t0_ = t0_.block_until_ready()

if "shade" in stages:
    def shade_only(t, idx, i):
        rad = integ.shade(prep.scene, cfg, o, d, t, idx,
                          light + i * 1e-4, None)
        return jnp.where(jnp.isfinite(t)[:, None], rad, 0.).sum()
    timeit("shade", shade_only, t0_, idx0_)

if "socull" in stages:
    # shadow-pass plan build only (cull_occl on surface-origin rays)
    STILE0 = int(os.environ.get("SRT_PROF_STILE", str(TILE)))
    hitm0 = jnp.isfinite(t0_)
    point0 = jnp.where(hitm0[:, None], o + t0_[:, None] * d, 0.0)

    def socull_only(point, i):
        dd = (light + i * 1e-4) - point
        plan = getattr(IMPL, "cull_occl", IMPL.cull)(
            prep, point, dd, STILE0, MAXV)
        return plan.astype(jnp.float32).sum()
    timeit("socull", socull_only, point0)

if "occl" in stages:
    # SRT_PROF_STILE: shadow-pass tile RAY count override (e.g. 256 = one
    # 8x32 strip of a 32px primary tile) — finer tiles give tighter cull
    # bounds for surface-origin shadow rays
    STILE = int(os.environ.get("SRT_PROF_STILE", str(TILE)))
    shadow_fn2 = tiled.tiled_shadow_fn(prep, STILE, cfg.mt_eps, MAXV,
                                       cfg.light.shadow_no_max_t, 1,
                                       impl=IMPL)

    def occl_only(t, idx, i):
        hitm = jnp.isfinite(t)
        point = jnp.where(hitm[:, None], o + t[:, None] * d, 0.0)
        objv = prep.scene.tri_obj[jnp.maximum(idx, 0)]
        lps = jnp.broadcast_to(light + i * 1e-4, point.shape)
        s = shadow_fn2(point, lps, objv, hit=hitm)
        return s.astype(jnp.float32).sum()
    timeit("occl", occl_only, t0_, idx0_)

if "full" in stages or "noshadow" in stages:
    def full_fn(cfg_):
        def f(o, d, i):
            rad, hit = tiled.render_flat_tiled(prep, cfg_, o, d,
                                               light + i * 1e-4)
            return jnp.where(hit[:, None], rad, 0.).sum()
        return f
    if "full" in stages:
        timeit("full", full_fn(cfg), o, d)
    if "noshadow" in stages:
        import dataclasses
        cfg_ns = cfg.replace(
            light=dataclasses.replace(cfg.light, enable_shadows=False))
        timeit("noshadow", full_fn(cfg_ns), o, d)
