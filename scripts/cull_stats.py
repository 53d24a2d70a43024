"""Cull-granularity statistics on the BENCH scene (CPU, numpy-fed jax).

For each ray-tile size, computes visible CULL BLOCKS (32 tris) and visible
PAGES (128 tris) per tile: the pairs-tested-per-ray number that bounds the
kernel's VPU epilogue cost, and the page-fetch count that bounds DMA.
Decides whether finer tiles / finer pages pay before any kernel rewrite.

Run: JAX_PLATFORMS=cpu python scripts/cull_stats.py
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
from simple_raytracer_tpu.kernels import tiled
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
o, d = primary_rays(W, H, focal=6000.0)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
NB = prep.block_min.shape[0]
BPP = prep.page_tris // prep.block_size
print(f"blocks={NB} pages={prep.num_pages} block={prep.block_size} "
      f"page_tris={prep.page_tris}")

vis_fn = jax.jit(
    lambda o, d, t: tiled._visibility(o, d, t, prep.block_min,
                                      prep.block_max)[0],
    static_argnums=2)

for tpx in (16, 8, 4):
    perm, inv = tiled.tile_permutation(W, H, tpx)
    op = np.asarray(o)[perm]
    dp = np.asarray(d)[perm]
    tile = tpx * tpx
    n = op.shape[0] // tile
    CH = max(1, (1 << 22) // NB)    # tiles per chunk
    pages_v = []
    blocks_v = []
    for s in range(0, n, CH):
        e = min(n, s + CH)
        v = np.asarray(vis_fn(jnp.asarray(op[s * tile:e * tile]),
                              jnp.asarray(dp[s * tile:e * tile]), tile))
        blocks_v.append(v.sum(-1))
        pages_v.append(v.reshape(v.shape[0], -1, BPP).any(-1).sum(-1))
    bl = np.concatenate(blocks_v).astype(np.int64)
    pg = np.concatenate(pages_v).astype(np.int64)
    rays = n * tile
    print(f"tile {tpx}x{tpx}: tiles={n}"
          f" pages/tile mean={pg.mean():.1f} p50={np.percentile(pg,50):.0f}"
          f" p99={np.percentile(pg,99):.0f} max={pg.max()}"
          f" | blocks/tile mean={bl.mean():.1f}"
          f" | tris-tested/ray page-gran={pg.mean()*prep.page_tris:.0f}"
          f" block-gran={bl.mean()*prep.block_size:.0f}"
          f" | total page-fetches={pg.sum()}")

# Greedy fixed-width window covers of the visible 32-block set (tile 16x16):
# one descriptor per window; fetched = W_B*32 tris per window (waste included).
perm, inv = tiled.tile_permutation(W, H, 16)
op = np.asarray(o)[perm]; dp = np.asarray(d)[perm]
tile = 256
n = op.shape[0] // tile
CH = max(1, (1 << 22) // NB)
vs = []
for s in range(0, n, CH):
    e = min(n, s + CH)
    vs.append(np.asarray(vis_fn(jnp.asarray(op[s*tile:e*tile]),
                                jnp.asarray(dp[s*tile:e*tile]), tile)))
V = np.concatenate(vs)          # [n, NB] bool
for WB in (2, 4, 8, 16):
    nw = np.zeros(n, np.int64); fetched = np.zeros(n, np.int64)
    for i in range(n):
        ids = np.nonzero(V[i])[0]
        j = 0; w = 0
        while j < len(ids):
            s0 = ids[j]; w += 1
            j2 = j
            while j2 < len(ids) and ids[j2] < s0 + WB:
                j2 += 1
            j = j2
        nw[i] = w; fetched[i] = w * WB
    print(f"W_B={WB:2d}: windows/tile mean={nw.mean():.1f} p99="
          f"{np.percentile(nw,99):.0f} fetched-tris/ray mean="
          f"{fetched.mean()*prep.block_size:.0f} "
          f"(visible {V.sum(1).mean()*prep.block_size:.0f}) "
          f"descr-total={nw.sum()}")
