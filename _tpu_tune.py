import os, time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import default_config, BVHConfig, CameraConfig
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled
from simple_raytracer_tpu.ops.camera import primary_rays
from simple_raytracer_tpu.render.renderer import brute_force_hits

sm = SceneManager(root="/root/reference")
sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="b")
sm.set_color("b", (0.8,0.7,0.6))
sm.transform_triangles("b", T.translate((0.,-5.5,60.)) @ T.rotate_y(3.14159) @ T.scale(50.,50.,50.))
scene = sm.build()
W,H = 1920,1080
o, d = primary_rays(W, H, focal=6000.0)
o, d = o.reshape(-1,3), d.reshape(-1,3)
perm, inv = tiled.tile_permutation(W, H, 16)
operm = jnp.asarray(np.asarray(o)[perm]); dperm = jnp.asarray(np.asarray(d)[perm])
N = 8

# accuracy reference at low res (cheap brute force)
o2, d2 = primary_rays(96, 64, focal=6000.0); o2, d2 = o2.reshape(-1,3), d2.reshape(-1,3)

for bs in [128, 256, 512]:
    cfg = default_config().replace(mode="tiled", bvh=BVHConfig(split="sah", block_size=bs))
    prep = prepare(scene, cfg)
    tr, _ = jax.jit(lambda s,oo,dd: brute_force_hits(s,oo,dd))(prep.scene, o2, d2)
    tk, _ = jax.jit(lambda p,oo,dd: tiled.tiled_hits(p,oo,dd,256,1e-12))(prep, o2, d2)
    tr, tk = np.asarray(tr), np.asarray(tk)
    ok = np.isclose(np.where(np.isfinite(tr),tr,0), np.where(np.isfinite(tk),tk,0), rtol=1e-4).mean()
    @jax.jit
    def many(prep, o, d):
        def one(i, acc):
            t, idx = tiled.tiled_hits(prep, o + i*1e-4, d, 256, 1e-12)
            return acc + jnp.where(jnp.isfinite(t), t, 0.).sum()
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    float(many(prep, operm, dperm))
    t0=time.time(); float(many(prep, operm, dperm)); dt=(time.time()-t0)/N
    prec = os.environ.get("SRT_MT_PRECISION", "highest")
    print(f"block={bs} prec={prec}: hits {dt*1e3:.1f} ms/frame  match={ok:.5f}", flush=True)
