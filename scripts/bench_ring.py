"""Ring (geometry-sharded) scaling benchmark on the virtual CPU mesh.

Demonstrates the VERDICT-r1 requirement: with culled shards (per-shard BVH +
page plans, dist/ring.py) the per-rotation cost must scale with the rays'
VISIBLE pages, not with shard size — unlike the round-1 dense R x Tl Gram
contraction.  Runs the bunny at several shard sizes on an 8-device CPU mesh
and reports per-step page statistics + wall time for culled vs dense shards.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_ring.py [--rays 64x48] [--sizes 8192,...]

(CPU interpret-mode Pallas is slow in absolute terms; the point is the
SCALING SHAPE and the tested-triangle counts, which are machine-independent.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", default="64x48")
    # sizes are rounded UP to whole bunny instances (69,451 tris each)
    p.add_argument("--sizes", default="69451,138902,277804")
    args = p.parse_args()
    W, H = (int(x) for x in args.rays.split("x"))
    sizes = [int(s) for s in args.sizes.split(",")]

    from simple_raytracer_tpu.config import default_config
    from simple_raytracer_tpu.dist import make_mesh
    from simple_raytracer_tpu.dist import ring as ring_mod
    from simple_raytracer_tpu.ops.camera import primary_rays
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.kernels import tiled

    n = 8
    mesh = make_mesh(n, ("gp",))
    cfg = default_config()
    o, d = primary_rays(W, H, 400.0)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    R = o.shape[0]
    pad = (-R) % n
    if pad:
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))], 0)
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))], 0)

    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.transform_triangles(
        "bunny", T.translate((0.0, 5.0, 60.0)) @ T.rotate_y(3.14159265)
        @ T.scale(50.0, 50.0, 50.0))
    full = sm.build()

    def body(shard, o, d):
        shard = jax.tree.map(lambda a: a[0], shard)
        t, rec = ring_mod.ring_nearest_hit(shard, o, d, "gp", cfg.mt_eps)
        return t

    for T_target in sizes:
        reps = max(1, -(-T_target // full.num_triangles))
        smr = SceneManager(root="/root/reference")
        smr.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="b0")
        for r in range(1, reps):
            smr.instance("b0", f"b{r}")
        for key in list(smr.objects):
            smr.transform_triangles(
                key, T.translate((0.0, 5.0, 60.0))
                @ T.rotate_y(3.14159265) @ T.scale(50.0, 50.0, 50.0))
        scene = smr.build()
        Tn = scene.num_triangles

        rec = {"triangles": Tn, "devices": n, "rays": R}
        for culled in (True, False):
            shard = ring_mod.shard_geometry(scene, n, culled=culled)
            f = jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=(P("gp"), P("gp"), P("gp")),
                out_specs=P("gp"), check_vma=False))
            t = np.asarray(f(shard, o, d))          # compile + run
            t0 = time.time()
            t = np.asarray(f(shard, o, d))
            dt = time.time() - t0
            tag = "culled" if culled else "dense"
            rec[f"{tag}_s"] = round(dt, 3)
            if culled:
                # machine-independent work metric: pages visited per tile
                perm, _ = tiled.tile_permutation(W, H, 16)
                prep = tiled.BlockSet.from_arrays(
                    jnp.asarray(shard["block_min"][0]),
                    jnp.asarray(shard["block_max"][0]),
                    jnp.asarray(shard["gram"][0]))
                vis, _, _ = tiled._visibility(
                    o[:R][perm], d[:R][perm], 256,
                    prep.block_min, prep.block_max)
                bpp = prep.page_tris // prep.block_size
                NBv = vis.shape[1] - vis.shape[1] % bpp
                pages = np.asarray(vis)[:, :NBv].reshape(
                    vis.shape[0], -1, bpp).any(-1)
                rec["pages_per_tile_shard0"] = round(
                    float(pages.sum(1).mean()), 2)
                rec["tris_tested_frac"] = round(
                    float(pages.sum(1).mean())
                    * prep.page_tris / max(shard["gram"].shape[1]
                                           * prep.page_tris, 1), 4)
        rec["speedup_culled_vs_dense"] = round(
            rec["dense_s"] / max(rec["culled_s"], 1e-9), 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
