"""Plan-size (window-count) distribution at the PRODUCTION config (CPU).

The resident nearest kernel walks ceil(cnt/KW) super-steps of KW windows
each; padded positions clamp to a repeated window but still pay full
matmul+epilogue cost.  This prints the per-tile window-count histogram for
the nearest and occlusion plans at the shipping tile size, and the implied
padding waste for a given KW — the data behind the SUPER_ROWS retunes.

Run: JAX_PLATFORMS=cpu python scripts/plan_stats.py [tile_px]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from simple_raytracer_tpu.config import default_config, BVHConfig, CameraConfig
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled, tiled_t
from simple_raytracer_tpu.ops.camera import primary_rays

W, H = 1920, 1080
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
    mode="tiled", camera=CameraConfig(width=W, height=H, focal=6000.0),
    bvh=BVHConfig(split="sah"))
prep = prepare(scene, cfg)
tp = int(sys.argv[1]) if len(sys.argv) > 1 else \
    tiled.effective_tile_px(cfg, prep.scene.verts.shape[0])
TILE = tp * tp
print(f"tile_px={tp} blocks={prep.block_min.shape[0]} "
      f"block={prep.block_size}")

o, d = primary_rays(W, H, focal=6000.0)
o, d = np.asarray(o.reshape(-1, 3)), np.asarray(d.reshape(-1, 3))
perm, _ = tiled.tile_permutation(W, H, tp)
o, d = jnp.asarray(o[perm]), jnp.asarray(d[perm])


def stats(name, plan, wb, rows):
    plan = np.asarray(plan)
    use_list = plan[:, 3] == 1
    cnt = np.where(use_list, plan[:, 2], plan[:, 1])
    KW = tiled_t._kw(prep.block_size, wb, "stack", rows=rows)
    ns = -(-cnt // KW)
    pad = ns * KW - cnt
    print(f"{name}: tiles={len(cnt)} use_list={use_list.mean():.3f} "
          f"windows/tile mean={cnt.mean():.2f} p50={np.percentile(cnt,50):.0f} "
          f"p90={np.percentile(cnt,90):.0f} max={cnt.max()}")
    print(f"  KW={KW}: steps mean={ns.mean():.2f} padded-window fraction="
          f"{pad.sum()/max((ns*KW).sum(),1):.3f} "
          f"(computed {int((ns*KW).sum())} vs needed {int(cnt.sum())})")
    for kw2 in (1, 2, 4, 8, 16):
        ns2 = -(-cnt // kw2)
        print(f"  KW={kw2}: steps/tile {ns2.mean():.2f} computed "
              f"{int(ns2.sum()*kw2)} waste {(ns2*kw2-cnt).sum()/max(cnt.sum(),1):.2f}x")


plan_n = jax.jit(lambda o, d: tiled_t.cull(
    prep, o, d, TILE, cfg.cull_maxv, apex=True))(o, d)
stats("nearest", plan_n, tiled_t.WINDOW_BLOCKS, tiled_t.SUPER_ROWS_RES)

# occlusion plan: shadow rays from hit points toward the light
t, idx = tiled_t.hits(prep, o, d, TILE, cfg.mt_eps, maxv=cfg.cull_maxv,
                      apex=True)
light = jnp.asarray([500., -300., -200.], jnp.float32)
hit = np.asarray(t) < np.inf
pts = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
pts = np.where(hit[:, None], pts, 0.0)
sd = np.asarray(light)[None] - pts
st = tiled._shadow_tile(cfg, TILE, prep)
plan_o = jax.jit(lambda o2, d2: tiled_t.cull_occl(
    prep, o2, d2, st, cfg.cull_maxv, apex_rev=True))(
        jnp.asarray(pts), jnp.asarray(sd))
stats(f"occl(tile={st})", plan_o, tiled_t.WINDOW_BLOCKS_AH,
      tiled_t.SUPER_ROWS_AH)
