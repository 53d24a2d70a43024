import time, numpy as np, jax, jax.numpy as jnp
from simple_raytracer_tpu.config import default_config, BVHConfig, CameraConfig
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled
from simple_raytracer_tpu.ops.camera import primary_rays

sm = SceneManager(root="/root/reference")
sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="b")
sm.transform_triangles("b", T.translate((0.,-5.5,60.)) @ T.rotate_y(3.14159) @ T.scale(50.,50.,50.))
scene = sm.build()
cfg = default_config().replace(mode="tiled", bvh=BVHConfig(split="sah"))
prep = prepare(scene, cfg)
W,H = 1920,1080
o, d = primary_rays(W, H, focal=6000.0); o, d = o.reshape(-1,3), d.reshape(-1,3)
F, n, R = tiled.ray_tile_features(o, d, 256)
NB = prep.num_blocks
N = 8
print("tiles:", n, "NB:", NB, flush=True)
for K in [0, 1, 4, 8, 16, 32]:
    ids = np.tile(np.arange(tiled.PLAN_MAXV, dtype=np.int32) % NB, (n,1))
    aux = np.zeros((n,4), np.int32)
    aux[:,2] = K; aux[:,3] = 1
    plan = jnp.asarray(np.concatenate([aux, ids], axis=1))
    @jax.jit
    def many(F, plan, Gt):
        def one(i, acc):
            t, idx = tiled.tiled_nearest(F, plan, Gt, 256, 128, 1e-12)
            return acc + jnp.where(jnp.isfinite(t), t+i*0., 0.).sum()
        return jax.lax.fori_loop(0, N, one, jnp.float32(0))
    float(many(F, plan, prep.gram))
    t0=time.time(); float(many(F, plan, prep.gram)); dt=(time.time()-t0)/N
    print(f"K={K:3d}: {dt*1e3:7.2f} ms/frame  ({dt/n*1e6:.2f} us/tile)", flush=True)
