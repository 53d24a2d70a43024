import os, time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import default_config, BVHConfig
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled
from simple_raytracer_tpu.ops.camera import primary_rays
from simple_raytracer_tpu.render.renderer import brute_force_hits

sm = SceneManager(root="/root/reference")
sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="b")
sm.transform_triangles("b", T.translate((0.,-5.5,60.)) @ T.rotate_y(3.14159) @ T.scale(50.,50.,50.))
scene = sm.build()
prep = prepare(scene, default_config().replace(mode="tiled", bvh=BVHConfig(split="sah")))
o2, d2 = primary_rays(160, 120, focal=6000.0); o2, d2 = o2.reshape(-1,3), d2.reshape(-1,3)
tr, ir = jax.jit(lambda s,oo,dd: brute_force_hits(s,oo,dd,chunk=512))(prep.scene, o2, d2)
tr, ir = np.asarray(tr), np.asarray(ir)
tk, ik = jax.jit(lambda p,oo,dd: tiled.tiled_hits(p,oo,dd,256,1e-12))(prep, o2, d2)
tk, ik = np.asarray(tk), np.asarray(ik)
okt = np.isclose(np.where(np.isfinite(tr),tr,0), np.where(np.isfinite(tk),tk,0), rtol=1e-4).mean()
oki = (ir == ik).mean()
hitagree = (np.isfinite(tr) == np.isfinite(tk)).mean()
print(f"prec={os.environ.get('SRT_MT_PRECISION','highest')}: t match {okt:.5f} idx match {oki:.5f} hit agree {hitagree:.5f}", flush=True)
