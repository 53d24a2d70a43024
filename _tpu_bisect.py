"""One-shot TPU bisect: progressively larger tiled-kernel workloads, each
printed before/after, so a worker crash pinpoints the breaking step."""
import os, sys, time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from simple_raytracer_tpu.config import default_config
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled
from simple_raytracer_tpu.ops.camera import primary_rays
from simple_raytracer_tpu.render.renderer import brute_force_hits

def scene_obj(rel, mat):
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file(f"/root/reference/{rel}", key="o")
    sm.transform_triangles("o", mat)
    return sm.build()

def run(name, scene, W, H, check=True):
    cfg = default_config().replace(mode="tiled")
    prep = prepare(scene, cfg)
    o, d = primary_rays(W, H); o, d = o.reshape(-1,3), d.reshape(-1,3)
    print(f"[{name}] NB={prep.num_blocks} rays={W*H} START", flush=True)
    t0=time.time()
    t, idx = jax.jit(lambda p,oo,dd: tiled.tiled_hits(p,oo,dd,256,1e-12))(prep,o,d)
    t = np.asarray(t)
    dt = time.time()-t0
    msg = f"[{name}] DONE {dt:.1f}s finite={np.isfinite(t).sum()}"
    if check:
        tr,_ = jax.jit(lambda s,oo,dd: brute_force_hits(s,oo,dd))(prep.scene,o,d)
        tr = np.asarray(tr)
        ok = np.isclose(np.where(np.isfinite(t),t,0), np.where(np.isfinite(tr),tr,0), rtol=1e-4).mean()
        msg += f" match={ok:.4f}"
    # timed frames
    ts=[]
    for _ in range(2):
        t0=time.time(); x,_ = jax.jit(lambda p,oo,dd: tiled.tiled_hits(p,oo,dd,256,1e-12))(prep,o,d); np.asarray(x); ts.append(time.time()-t0)
    print(msg, "frames:", [round(x,4) for x in ts], f"rays/s={W*H/min(ts):.3g}", flush=True)

tree = T.translate((0.,10.,40.)) @ T.rotate_x(-1.5708) @ T.scale(0.03,0.03,0.03)
run("tree18k", scene_obj("obj/tree/tree.obj", tree), 128, 64)
bunny = T.translate((0.,-5.5,60.)) @ T.rotate_y(3.14159) @ T.scale(50.,50.,50.)
sb = scene_obj("obj/stanford-bunny.obj", bunny)
run("bunny-small", sb, 64, 32)
run("bunny-512", sb, 512, 288, check=False)
run("bunny-1080p", sb, 1920, 1080, check=False)
print("ALL OK", flush=True)
