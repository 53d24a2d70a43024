"""Repeatable full-size turntable benchmark (BASELINE config-5 class).

Renders the reference's headline benchmark — the ACTIVE complex scene
(ground cube + bunny + 3 textured trees, 600x400, hard shadows) over the
36-frame turntable (simple_raytracer.cpp:530-796) — on the current backend
and emits per-sweep metrics as JSON lines (driver/animation.py metrics) plus
a one-line summary comparable to BASELINE.md's 48.99 s/frame.

Usage: python scripts/bench_sweep.py [--mode tiled] [--width 600]
       [--height 400] [--frames 36] [--out /tmp/sweep_out]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="tiled")
    p.add_argument("--width", type=int, default=600)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--frames", type=int, default=36)
    p.add_argument("--out", default="/tmp/sweep_out")
    p.add_argument("--tile", type=int, default=0,
                   help="tile_px override (0 = config default)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from simple_raytracer_tpu.config import (default_config, AnimationConfig,
                                             BVHConfig, CameraConfig)
    from simple_raytracer_tpu.driver.animation import render_turntable

    os.makedirs(args.out, exist_ok=True)
    cfg = default_config().replace(
        mode=args.mode,
        camera=CameraConfig(width=args.width, height=args.height),
        bvh=BVHConfig(split="sah"))
    if args.tile:
        cfg = cfg.replace(tile_px=args.tile)
    anim = AnimationConfig(start_deg=0.0, stop_deg=args.frames * 10.0,
                           step_deg=10.0)
    metrics = os.path.join(args.out, "metrics.jsonl")
    t0 = time.time()
    written = render_turntable(
        "complex", "/root/reference", cfg, anim, out_dir=args.out,
        fmt="bmp", world_space=True, resume=False, metrics_path=metrics)
    e2e = time.time() - t0
    n = max(len(written), 1)

    # Device render time, measured separately: the dev box reaches the TPU
    # through a ~0.25 MB/s tunnel, so fetching 36 full frames costs minutes
    # of pure transfer that a real TPU host (PCIe) would not pay.  One jitted
    # program renders ALL frames and reduces each to a checksum; only [F]
    # floats cross the wire.  (block_until_ready can return early through
    # the tunnel; np.asarray of the tiny result is the reliable fence.)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from simple_raytracer_tpu.scene import catalog
    from simple_raytracer_tpu.render.renderer import (ensure_prepared,
                                                      render_radiance)
    from simple_raytracer_tpu.driver.animation import sweep_angles
    sm, _, light = catalog.CATALOG["complex"]("/root/reference", 0.0,
                                              bake_view=False)
    prep = ensure_prepared(sm.build(), cfg)
    angles = sweep_angles(anim)
    views = jnp.asarray(np.stack([
        catalog.orbit_view(a, anim.orbit_radius, anim.camera_y,
                           anim.pitch_deg, anim.yaw_offset_deg)
        for a in angles]), jnp.float32)
    light = jnp.asarray(light, jnp.float32)

    @jax.jit
    def sweep_sums(prep, Vs, light):
        def body(V):
            radiance, hit = render_radiance(prep, cfg, light, view_matrix=V)
            return jnp.where(hit[..., None], radiance, 0.0).sum()
        return jax.lax.map(body, Vs)

    np.asarray(sweep_sums(prep, views, light))          # compile + warm
    t0 = time.time()
    sums = np.asarray(sweep_sums(prep, views, light))
    dev = time.time() - t0
    ms_dev = dev * 1e3 / len(angles)
    print(json.dumps({
        "metric": f"complex_scene_turntable_{args.width}x{args.height}_"
                  f"{args.mode}",
        "frames": len(written),
        "ms_per_frame_device": round(ms_dev, 2),
        "ms_per_frame_incl_tunnel_transfer": round(e2e * 1e3 / n, 2),
        "vs_reference_48990ms": round(48990.0 / ms_dev, 1),
        "checksum": float(sums.sum()),
        "metrics_jsonl": metrics,
    }))


if __name__ == "__main__":
    main()
