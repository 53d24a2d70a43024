"""TPU frame-cost decomposition: cull / intersection kernel / shading /
shadow stages, timed as batched frames (amortizing the ~1s tunnel round trip).

Run on a TPU host: python scripts/profile_kernel.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import default_config, BVHConfig, CameraConfig, LightConfig
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled
from simple_raytracer_tpu.ops.camera import primary_rays
from simple_raytracer_tpu.render.renderer import render_radiance
from simple_raytracer_tpu.render import integrator

sm = SceneManager(root="/root/reference")
sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="b")
sm.set_color("b", (0.8,0.7,0.6))
sm.transform_triangles("b", T.translate((0.,-5.5,60.)) @ T.rotate_y(3.14159) @ T.scale(50.,50.,50.))
scene = sm.build()
cfg = default_config().replace(mode="tiled", camera=CameraConfig(width=1920, height=1080, focal=6000.0), bvh=BVHConfig(split="sah"))
prep = prepare(scene, cfg)
light = jnp.asarray([500.,-300.,-200.], jnp.float32)
W,H = 1920,1080
o, d = primary_rays(W, H, focal=6000.0)
o, d = o.reshape(-1,3), d.reshape(-1,3)
perm, inv = tiled.tile_permutation(W, H, 16)
operm = jnp.asarray(np.asarray(o)[perm]); dperm = jnp.asarray(np.asarray(d)[perm])
N = 8

def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def one(i, acc):
            r = fn(*a, i)
            return acc + r
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    t0=time.time(); float(many(*args)); c=time.time()-t0
    t0=time.time(); float(many(*args)); dt=(time.time()-t0)/N
    print(f"[{name}] {dt*1e3:.1f} ms/frame (compile {c:.0f}s)", flush=True)

# 1: cull only
def cull_only(prep, o, d, i):
    plan = tiled._cull(o + i*1e-4, d, 256, prep, 64)
    return plan.astype(jnp.float32).sum()
timeit("cull", cull_only, prep, operm, dperm)

# 2: hits (cull + kernel)
def hits_only(prep, o, d, i):
    t, idx = tiled.tiled_hits(prep, o + i*1e-4, d, 256, 1e-12)
    return jnp.where(jnp.isfinite(t), t, 0.0).sum()
timeit("hits", hits_only, prep, operm, dperm)

# 3: full render no shadows
cfg_ns = cfg.replace(light=LightConfig(enable_shadows=False))
def render_ns(prep, i):
    rad, hit = render_radiance(prep, cfg_ns, light + i*1e-4)
    return jnp.where(hit[...,None], rad, 0.).sum()
timeit("render-noshadow", render_ns, prep)

# 4: full render with shadows
def render_full(prep, i):
    rad, hit = render_radiance(prep, cfg, light + i*1e-4)
    return jnp.where(hit[...,None], rad, 0.).sum()
timeit("render-shadow", render_full, prep)

# 5: hits + record gathers only
from simple_raytracer_tpu.render import integrator as integ
def hits_gather(prep, i):
    t, idx = tiled.tiled_hits(prep, operm + i*1e-4, dperm, 256, 1e-12)
    rec = integ.gather_hit_records(prep.scene, idx)
    return sum(jnp.sum(v.astype(jnp.float32)) for v in rec.values()) + jnp.where(jnp.isfinite(t), t, 0.).sum()
timeit("hits+gather", hits_gather, prep)

# 6: F features + cull + permutation only (no kernel)
def prep_only(prep, i):
    F, n, R = tiled.ray_tile_features(operm + i*1e-4, dperm, 256)
    plan = tiled._cull(operm + i*1e-4, dperm, 256, prep, 64)
    return F.sum() + plan.astype(jnp.float32).sum()
timeit("F+cull", prep_only, prep)
