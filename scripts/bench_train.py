"""Training-step benchmark: forward + backward + param update on device.

Measures the differentiable render pipeline end to end (the north star
includes the backward pass): a DP train step fitting DiffParams to a target
image of the two-object cube+ground scene, timed as N steps inside one
device program.  Runs single-chip by default; pass --mesh N for an N-device
DP mesh (CPU: set XLA_FLAGS=--xla_force_host_platform_device_count=N).

Usage: python scripts/bench_train.py [--width 256 --height 192] [--steps 8]
       [--mesh N] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--mesh", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--scene", default="cube", choices=["cube", "bunny"],
                   help="bunny = flagship-scale geometry (69k tris), "
                        "trained through the TILED kernel via the "
                        "fixed-topology recompute (prep passed to "
                        "make_train_step)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the forward in the backward pass")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from simple_raytracer_tpu.config import (default_config, CameraConfig,
                                             LightConfig)
    from simple_raytracer_tpu.dist import (make_mesh, make_train_step,
                                           extract_params)
    from simple_raytracer_tpu.render.renderer import render_radiance
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T

    sm = SceneManager(root="/root/reference")
    if args.scene == "bunny":
        sm.load_obj_file("/root/reference/obj/stanford-bunny.obj",
                         key="bunny")
        sm.set_color("bunny", (0.8, 0.7, 0.6))
        sm.transform_triangles(
            "bunny", T.translate((0.0, -5.5, 60.0)) @ T.rotate_y(3.14159265)
            @ T.scale(50.0, 50.0, 50.0))
        sm.load_obj_file("/root/reference/cube.obj", key="ground")
        sm.set_color("ground", (0.0, 1.0, 0.0))
        sm.transform_triangles(
            "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30., 2., 30.))
    else:
        sm.load_obj_file("/root/reference/cube.obj", key="cube")
        sm.set_color("cube", (0.2, 0.8, 0.3))
        sm.transform_triangles(
            "cube", T.translate((0.0, 5.0, 80.0)) @ T.rotate_y(25.0)
            @ T.scale(15.0, 15.0, 15.0))
        sm.load_obj_file("/root/reference/cube.obj", key="ground")
        sm.set_color("ground", (0.7, 0.6, 0.2))
        sm.transform_triangles(
            "ground", T.translate((0.0, 24.0, 80.0)) @ T.scale(30., 2., 30.))
    scene = sm.build()

    focal = (6000.0 * args.height / 1080.0 if args.scene == "bunny"
             else 400.0)
    cfg = default_config().replace(
        mode="tiled" if args.scene == "bunny" else "bruteforce",
        camera=CameraConfig(width=args.width, height=args.height,
                            focal=focal),
        light=LightConfig(enable_shadows=True))
    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
    if args.scene == "bunny":
        # flagship scale: dense fwd is O(R x T) — train through the tiled
        # kernel (fixed-topology recompute); params come from the PREPARED
        # (padded+reordered) scene, the ordering the kernel reports ids in
        from simple_raytracer_tpu.accel.prepared import prepare
        operand = prepare(scene, cfg)
        pscene = operand.scene
        lr = 1e-8
    else:
        operand = pscene = scene
        lr = 1e-6
    target, hit = render_radiance(operand, cfg, light)
    target = jnp.where(hit[..., None], target, 0.0)

    mesh = make_mesh(args.mesh, ("dp",)) if args.mesh else None
    step = make_train_step(operand, cfg, mesh=mesh, lr=lr, remat=args.remat)
    params = extract_params(pscene, light)
    params.light_pos = params.light_pos + 20.0
    params.obj_color = params.obj_color * 0.7

    N = args.steps
    # step is already jitted; call it in a host loop but time the whole run
    # after a warmup (device-bound: per-step host overhead is one dispatch)
    params2, loss = step(params, target)
    float(loss)                               # compile + warm
    t0 = time.time()
    p = params
    for _ in range(N):
        p, loss = step(p, target)
    float(loss)
    dt = (time.time() - t0) / N
    rays = args.width * args.height
    print(json.dumps({
        "metric": f"dp_train_step_{args.scene}_{args.width}x{args.height}"
                  + ("_remat" if args.remat else "")
                  + (f"_mesh{args.mesh}" if args.mesh else "_singlechip"),
        "ms_per_step": round(dt * 1e3, 2),
        "rays_per_s_fwd_bwd": round(rays / dt, 1),
        "final_loss": float(loss),
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
