"""Render the reference's 36-frame complex turntable
(simple_raytracer.cpp:530-796) on the TPU and commit a GIF as the
animation-evidence artifact (the analog of the reference's example.mp4).

Usage: python scripts/make_turntable.py [--out docs/gallery/turntable.gif]
       [--scale 2] [--frames 36]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/gallery/turntable.gif")
    p.add_argument("--mp4", default="example.mp4",
                   help="also write an MPEG-4 (reference example.mp4 "
                        "analog); empty string disables")
    p.add_argument("--scale", type=int, default=2,
                   help="downscale factor for the GIF")
    p.add_argument("--frames", type=int, default=36)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    from simple_raytracer_tpu.config import (default_config, AnimationConfig,
                                             BVHConfig, CameraConfig)
    from simple_raytracer_tpu.scene import catalog
    from simple_raytracer_tpu.render.renderer import (ensure_prepared,
                                                      render_radiance)
    from simple_raytracer_tpu.render import integrator
    from simple_raytracer_tpu.driver.animation import sweep_angles

    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=600, height=400),
        bvh=BVHConfig(split="sah"))
    anim = AnimationConfig(start_deg=0.0, stop_deg=args.frames * 10.0,
                           step_deg=10.0)
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
    def sweep(prep, Vs, light):
        def body(V):
            radiance, hit = render_radiance(prep, cfg, light, view_matrix=V)
            return integrator.finalize_image(radiance, hit, cfg)
        return jax.lax.map(body, Vs)

    t0 = time.time()
    frames = np.asarray(sweep(prep, views, light))   # [F, H, W, 3] u8
    print(f"# rendered+fetched {len(frames)} frames in "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    s = args.scale
    imgs = [Image.fromarray(f).resize((600 // s, 400 // s),
                                      Image.LANCZOS) for f in frames]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    imgs[0].save(args.out, save_all=True, append_images=imgs[1:],
                 duration=120, loop=0, optimize=True)
    print(f"# wrote {args.out} "
          f"({os.path.getsize(args.out)/1e6:.2f} MB)", file=sys.stderr)

    if args.mp4:
        # the reference ships example.mp4 at its repo root (300x250 MPEG-4);
        # mp4v is the one codec this image's OpenCV can write into an .mp4
        import cv2
        arr = [np.asarray(i) for i in imgs]
        h, w = arr[0].shape[:2]
        vw = cv2.VideoWriter(args.mp4, cv2.VideoWriter_fourcc(*"mp4v"),
                             12, (w, h))
        assert vw.isOpened(), "cv2 VideoWriter failed to open"
        for f in arr:
            vw.write(f[:, :, ::-1])
        vw.release()
        print(f"# wrote {args.mp4} "
              f"({os.path.getsize(args.mp4)/1e6:.2f} MB)", file=sys.stderr)


if __name__ == "__main__":
    main()
