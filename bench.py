"""Benchmark harness: primary rays/s/chip on the flagship bunny scene.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference's best published number is 4.9k primary rays/s on the
69k-tri complex scene (BVH, single CPU thread — BASELINE.md, transcribed from
images/bounding_hierarchy/time_bb_hierarchy_complex_scene.png).  vs_baseline
is the speedup over that.

Usage: python bench.py [--mode bvh|tiled|bruteforce] [--width W] [--height H]
                       [--frames N] [--json-only]
"""

import argparse
import json
import sys
import time

REFERENCE_RAYS_PER_S = 4900.0   # BASELINE.md: complex scene + BVH


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default=None,
                   help="render mode (default: tiled if available, else bvh)")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--shadows", action="store_true", default=True)
    p.add_argument("--no-shadows", dest="shadows", action="store_false")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from simple_raytracer_tpu.config import (default_config, CameraConfig,
                                             LightConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.render.renderer import render_radiance
    from simple_raytracer_tpu.render import integrator

    mode = args.mode
    if mode is None:
        try:
            from simple_raytracer_tpu.kernels import tiled  # noqa: F401
            mode = "tiled"
        except Exception:
            mode = "bvh"

    t0 = time.time()
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    m = T.translate((0.0, 20.0, 120.0)) @ T.rotate_y(180.0) @ \
        T.scale(50.0, 50.0, 50.0)
    sm.transform_triangles("bunny", m)
    scene = sm.build()
    cfg = default_config().replace(
        mode=mode,
        camera=CameraConfig(width=args.width, height=args.height),
        light=default_config().light.__class__(enable_shadows=args.shadows))
    prep = prepare(scene, cfg) if mode != "bruteforce" else scene
    print(f"# scene+prep: {time.time()-t0:.2f}s, mode={mode}, "
          f"{args.width}x{args.height}, device={jax.devices()[0].platform}",
          file=sys.stderr)

    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)

    @jax.jit
    def frame(operand, light_pos):
        radiance, hit = render_radiance(operand, cfg, light_pos)
        return integrator.finalize_image(radiance, hit, cfg)

    t0 = time.time()
    img = frame(prep, light)
    img.block_until_ready()
    print(f"# compile+first frame: {time.time()-t0:.2f}s", file=sys.stderr)

    times = []
    for _ in range(args.frames):
        t0 = time.time()
        img = frame(prep, light)
        img.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    rays = args.width * args.height
    rays_per_s = rays / best
    print(f"# frame times: {[round(t*1000,1) for t in times]} ms; "
          f"best {best*1000:.1f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": f"primary_rays_per_s_per_chip_bunny_{args.width}x{args.height}_{mode}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
