"""Numpy prototype: pixel-space (projective) block culling vs the shipped
interval cull, on the bench bunny scene.

For PRIMARY tiles all rays share the camera origin, so tile-vs-block
visibility is exactly a 2D rect-overlap test in pixel space: project the
block AABB's 8 corners through the pinhole (u = x*f/z, v = y*f/z), take the
bounding rect, and intersect with the tile's pixel rect.  Exact for blocks
fully in front of the camera; conservative fallback (interval result) when
any corner has z <= eps.

Reports, per frame: windows/tile and tested tris/ray for
  interval   — the shipped _visibility (+ wb aggregation)
  px         — pixel-rect overlap alone
  both       — AND of the two
and the per-ray useful set (exact per-ray slab+frustum oracle) for scale.

Usage: python scripts/pxcull_proto.py [--angle 0]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--angle", type=float, default=0.0)
    p.add_argument("--wb", type=int, default=2)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig, LightConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.kernels import tiled
    from simple_raytracer_tpu.ops.camera import primary_rays

    W, H, focal = 1920, 1080, 6000.0
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    sm.transform_triangles("bunny", T.translate((0.0, -5.5, 60.0))
                           @ T.rotate_y(3.14159265) @ T.scale(50., 50., 50.))
    sm.load_obj_file("/root/reference/cube.obj", key="ground")
    sm.set_color("ground", (0.0, 1.0, 0.0))
    sm.transform_triangles(
        "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    scene = sm.build()
    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=W, height=H, focal=focal),
        light=LightConfig(enable_shadows=True), bvh=BVHConfig(split="sah"))
    prep = prepare(scene, cfg)
    bmin = np.asarray(prep.block_min)
    bmax = np.asarray(prep.block_max)
    NB = bmin.shape[0]
    BS = prep.block_size

    tpx = tiled.effective_tile_px(cfg, prep.scene.verts.shape[0])
    tile = tpx * tpx
    o, d = primary_rays(W, H, focal)
    o = np.asarray(o.reshape(-1, 3))
    d = np.asarray(d.reshape(-1, 3))
    perm, n_tiles = tiled.tile_permutation(W, H, tpx)
    o = o[np.asarray(perm)]
    d = d[np.asarray(perm)]

    # shipped interval visibility
    vis_i, tlo, n = tiled._visibility(jnp.asarray(o), jnp.asarray(d), tile,
                                      jnp.asarray(bmin), jnp.asarray(bmax))
    vis_i = np.asarray(vis_i)

    # production px visibility (projective frame derived from the rays)
    vp_prod, _, _ = tiled._visibility_px(jnp.asarray(o), jnp.asarray(d),
                                         tile, jnp.asarray(bmin),
                                         jnp.asarray(bmax))
    vp_prod = np.asarray(vp_prod)

    # pixel-space: project block AABBs once (camera frame: d = (u, v, focal))
    corners = np.stack([np.where(
        np.array([(k >> a) & 1 for a in range(3)], bool), bmax[i], bmin[i])
        for i in range(NB) for k in range(8)]).reshape(NB, 8, 3)
    z = corners[..., 2]
    eps = 1e-6
    ok = (z > eps).all(axis=1)                         # [NB] fully in front
    zs = np.maximum(z, eps)
    u = corners[..., 0] * focal / zs
    v = corners[..., 1] * focal / zs
    ulo, uhi = u.min(1), u.max(1)
    vlo, vhi = v.min(1), v.max(1)
    BIG = 1e9
    ulo = np.where(ok, ulo, -BIG); uhi = np.where(ok, uhi, BIG)
    vlo = np.where(ok, vlo, -BIG); vhi = np.where(ok, vhi, BIG)

    # tile pixel rects from the rays themselves (d = (u, v, focal))
    dt = d.reshape(n, tile, 3)
    ti_lo = dt[..., 0].min(1); ti_hi = dt[..., 0].max(1)
    tj_lo = dt[..., 1].min(1); tj_hi = dt[..., 1].max(1)
    vis_p = ((ulo[None] <= ti_hi[:, None]) & (uhi[None] >= ti_lo[:, None]) &
             (vlo[None] <= tj_hi[:, None]) & (vhi[None] >= tj_lo[:, None]))

    vis_b = vis_i & vis_p

    # per-ray useful oracle on a sample of tiles: per-ray slab test
    rng = np.random.default_rng(0)
    samp = rng.choice(n, size=min(200, n), replace=False)
    per_ray = []
    for ti in samp:
        ot = o[ti * tile:(ti + 1) * tile]
        dtt = d[ti * tile:(ti + 1) * tile]
        # [tile, NB, 3] slab per axis
        inv = 1.0 / np.where(dtt == 0, 1e-30, dtt)
        t1 = (bmin[None] - ot[:, None]) * inv[:, None]
        t2 = (bmax[None] - ot[:, None]) * inv[:, None]
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        hit = (tf >= np.maximum(tn, 0.0))
        per_ray.append(hit.any(0))                    # block needed by ANY ray
    per_ray = np.stack(per_ray)                       # [S, NB] union per tile

    wb = args.wb
    NBW = NB // wb * wb

    def windows(vis):
        vw = vis[:, :NBW].reshape(vis.shape[0], -1, wb).any(-1)
        return vw.sum(-1)

    def wstat(vis, name, idx=None):
        wins = windows(vis if idx is None else vis[idx])
        print(f"{name:10s} windows/tile mean {wins.mean():7.2f}  "
              f"tris/ray {wins.mean() * wb * BS:7.0f}")

    wstat(vis_i, "interval")
    wstat(vis_p, "px")
    wstat(vis_b, "both")
    wstat(vp_prod, "px-prod")
    # soundness vs the per-ray oracle on the sampled tiles
    miss = (per_ray & ~vp_prod[samp]).sum()
    print(f"px-prod misses {miss} needed (tile, block) pairs "
          f"of {per_ray.sum()}")
    wstat(per_ray, "union*")
    print(f"(*union = per-ray slab oracle ORed over each of {len(samp)} "
          f"sampled tiles; same wb aggregation)")


if __name__ == "__main__":
    main()
