"""TPU frame-cost decomposition on the BENCH scene (bunny + ground slab,
shadows on): cull / primary kernel / shading / occlusion stages, timed as
batched frames inside one device program (amortizes the ~1s tunnel RTT).

Run on a TPU host: python scripts/profile_frame.py [stages...]
Stages: cull hits shade occl full noshadow   (default: all)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                         CameraConfig, LightConfig)
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled
from simple_raytracer_tpu.ops.camera import primary_rays
from simple_raytracer_tpu.render.renderer import render_radiance
from simple_raytracer_tpu.render import integrator as integ

W, H = 1920, 1080
stages = set(sys.argv[1:]) or {"cull", "hits", "shade", "occl", "full",
                               "noshadow"}

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
    mode="tiled",
    tile_px=int(os.environ.get("SRT_PROF_TILE", "16")),
    camera=CameraConfig(width=W, height=H, focal=6000.0),
    bvh=BVHConfig(split="sah",
                  page_tris=int(os.environ.get("SRT_PROF_PT", "128")),
                  block_size=int(os.environ.get("SRT_PROF_BS", "32"))))
prep = prepare(scene, cfg)
light = jnp.asarray([500., -300., -200.], jnp.float32)
o, d = primary_rays(W, H, focal=6000.0)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
perm, inv = tiled.tile_permutation(W, H, cfg.tile_px)
operm = jnp.asarray(np.asarray(o)[perm])
dperm = jnp.asarray(np.asarray(d)[perm])
TILE = cfg.tile_px * cfg.tile_px
# nearest-pass sub-tile override (config.hit_tile semantics)
HTILE = int(os.environ.get("SRT_PROF_HTILE", "0")) or TILE
if HTILE != TILE:
    cfg = cfg.replace(hit_tile=HTILE)
MAXV = cfg.cull_maxv
IMPL = tiled.get_impl(None)          # SRT_TILED_IMPL: paged | sublane
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


if "cull" in stages:
    def cull_only(prep, o, d, i):
        plan = IMPL.cull(prep, o + i * 1e-4, d, HTILE, MAXV, apex=True)
        return plan.astype(jnp.float32).sum()
    timeit("cull", cull_only, prep, operm, dperm)

if "hits" in stages:
    def hits_only(prep, o, d, i):
        t, idx = IMPL.hits(prep, o + i * 1e-4, d, HTILE, cfg.mt_eps, MAXV,
                               apex=True)
        return jnp.where(jnp.isfinite(t), t, 0.0).sum()
    timeit("hits", hits_only, prep, operm, dperm)

if "shade" in stages:
    # shade-only on fixed precomputed hits (gathers + phong + tonemap,
    # flat-normal untextured path as the real config uses)
    t0_, idx0_ = jax.jit(lambda o, d: IMPL.hits(
        prep, o, d, HTILE, cfg.mt_eps, MAXV, apex=True))(operm, dperm)
    t0_ = t0_.block_until_ready()

    def shade_only(t, idx, i):
        rad = integ.shade(prep.scene, cfg, operm, dperm, t, idx,
                          light + i * 1e-4, None)
        return jnp.where(jnp.isfinite(t)[:, None], rad, 0.).sum()
    timeit("shade", shade_only, t0_, idx0_)

if "grec" in stages or "srec" in stages:
    # shade decomposition: record gather vs shading math
    t0_, idx0_ = jax.jit(lambda o, d: IMPL.hits(
        prep, o, d, HTILE, cfg.mt_eps, MAXV, apex=True))(operm, dperm)
    t0_ = t0_.block_until_ready()
    if "grec" in stages:
        def grec_only(t, idx, i):
            rec = integ.gather_hit_records(prep.scene, idx + (i - i), cfg)
            return sum(v.astype(jnp.float32).sum() for v in rec.values())
        timeit("grec", grec_only, t0_, idx0_)
    if "srec" in stages:
        rec0 = jax.jit(lambda idx: integ.gather_hit_records(
            prep.scene, idx, cfg))(idx0_)
        rec0 = {k: v.block_until_ready() for k, v in rec0.items()}
        def srec_only(t, i):
            rad = integ.shade_records(prep.scene, cfg, rec0, operm, dperm,
                                      t, light + i * 1e-4, None)
            return jnp.where(jnp.isfinite(t)[:, None], rad, 0.).sum()
        timeit("srec", srec_only, t0_)

if "occl" in stages:
    # occlusion pass alone on fixed hit points (the real shadow query the
    # integrator issues: origins on surfaces, repaired misses, S=1)
    t0_, idx0_ = jax.jit(lambda o, d: IMPL.hits(
        prep, o, d, HTILE, cfg.mt_eps, MAXV, apex=True))(operm, dperm)
    t0_ = t0_.block_until_ready()
    hitm = jnp.isfinite(t0_)
    point = jnp.where(hitm[:, None], operm + t0_[:, None] * dperm, 0.0)
    objv = prep.scene.tri_obj[jnp.maximum(idx0_, 0)]
    shadow_fn = tiled.tiled_shadow_fn(prep, TILE, cfg.mt_eps, MAXV,
                                      cfg.light.shadow_no_max_t, 1,
                                      impl=IMPL)

    def occl_only(point, objv, hitm, i):
        lps = jnp.broadcast_to(light + i * 1e-4, point.shape)
        s = shadow_fn(point, lps, objv, hit=hitm)
        return s.astype(jnp.float32).sum()
    timeit("occl", occl_only, point, objv, hitm)

if "occl2" in stages:
    # occlusion pass including the per-frame prep the REAL pipeline pays
    # (isfinite mask, point arithmetic, tri_obj gather) — vs "occl" which
    # precomputes them outside the timed loop
    t0_, idx0_ = jax.jit(lambda o, d: IMPL.hits(
        prep, o, d, HTILE, cfg.mt_eps, MAXV, apex=True))(operm, dperm)
    t0_ = t0_.block_until_ready()
    shadow_fn2 = tiled.tiled_shadow_fn(prep, TILE, cfg.mt_eps, MAXV,
                                       cfg.light.shadow_no_max_t, 1,
                                       impl=IMPL)

    def occl2_only(t, idx, i):
        hitm = jnp.isfinite(t)
        point = jnp.where(hitm[:, None], operm + t[:, None] * dperm, 0.0)
        objv = prep.scene.tri_obj[jnp.maximum(idx, 0)]
        lps = jnp.broadcast_to(light + i * 1e-4, point.shape)
        s = shadow_fn2(point, lps, objv, hit=hitm)
        return s.astype(jnp.float32).sum()
    timeit("occl2", occl2_only, t0_, idx0_)

if "noshadow" in stages:
    cfg_ns = cfg.replace(light=LightConfig(enable_shadows=False))
    def render_ns(prep, i):
        rad, hit = render_radiance(prep, cfg_ns, light + i * 1e-4)
        return jnp.where(hit[..., None], rad, 0.).sum()
    timeit("render-noshadow", render_ns, prep)

if "full" in stages:
    def render_full(prep, i):
        rad, hit = render_radiance(prep, cfg, light + i * 1e-4)
        return jnp.where(hit[..., None], rad, 0.).sum()
    timeit("render-shadow", render_full, prep)
