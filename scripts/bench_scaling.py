"""Scaling benchmark: render throughput vs device count (SURVEY.md §7 step 6).

Runs the SAME shard_map code paths on 1/2/4/8 devices and reports scaling
efficiency.  On a real TPU slice the mesh spans chips over ICI; on CPU (with
XLA_FLAGS=--xla_force_host_platform_device_count=8) the numbers measure
code-path overhead shape, not absolute speed — the harness and the sharding
layout are identical either way.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/bench_scaling.py [--mode bvh] [--width 512]
Emits JSONL records + a final scaling summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="bruteforce",
                   choices=["bruteforce", "bvh", "tiled"])
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--geometry", action="store_true",
                   help="also bench the geometry-sharded ring path")
    p.add_argument("--scene", default="bunny", choices=["bunny", "cube"])
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "auto"],
                   help="cpu (default; virtual device mesh) / tpu / auto")
    args = p.parse_args()

    import jax
    if args.platform != "auto":
        # the axon TPU plugin ignores JAX_PLATFORMS alone; pin explicitly
        jax.config.update("jax_platforms",
                          "cpu" if args.platform == "cpu" else None)
    import numpy as np
    import jax.numpy as jnp
    from simple_raytracer_tpu.config import default_config, CameraConfig
    from simple_raytracer_tpu.dist import make_mesh, render_sharded
    from simple_raytracer_tpu.dist.ring import render_geometry_sharded
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T

    sm = SceneManager(root="/root/reference")
    if args.scene == "bunny":
        sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="b")
        sm.set_color("b", (0.9, 0.9, 0.9))
        sm.transform_triangles(
            "b", T.translate((0.0, -5.5, 60.0)) @ T.rotate_y(3.14159)
            @ T.scale(50.0, 50.0, 50.0))
    else:
        sm.load_obj_file("/root/reference/cube.obj", key="c")
        sm.set_color("c", (0.2, 0.8, 0.3))
        sm.transform_triangles(
            "c", T.translate((0.0, 5.0, 80.0)) @ T.scale(15.0, 15.0, 15.0))
    scene = sm.build()
    cfg = default_config().replace(
        mode=args.mode, camera=CameraConfig(width=args.width,
                                            height=args.height))
    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
    rays = args.width * args.height

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = {}
    for n in counts:
        mesh = make_mesh(n, ("dp",))
        img = np.asarray(render_sharded(scene, cfg, light, mesh))  # warm
        ts = []
        for _ in range(args.frames):
            t0 = time.time()
            img = np.asarray(render_sharded(scene, cfg, light, mesh))
            ts.append(time.time() - t0)
        best = min(ts)
        results[n] = best
        print(json.dumps({
            "bench": "dp_scaling", "devices": n, "mode": args.mode,
            "ms": round(best * 1e3, 2),
            "rays_per_s": round(rays / best, 1),
            "speedup_vs_1": round(results[1] / best, 3),
            "efficiency": round(results[1] / best / n, 3)}))

    if args.geometry:
        for n in counts:
            if n == 1:
                continue
            mesh = make_mesh(n, ("gp",))
            img = np.asarray(render_geometry_sharded(scene, cfg, light, mesh))
            ts = []
            for _ in range(args.frames):
                t0 = time.time()
                img = np.asarray(render_geometry_sharded(scene, cfg, light,
                                                         mesh))
                ts.append(time.time() - t0)
            print(json.dumps({
                "bench": "ring_geometry_scaling", "devices": n,
                "ms": round(min(ts) * 1e3, 2),
                "rays_per_s": round(rays / min(ts), 1)}))


if __name__ == "__main__":
    main()
