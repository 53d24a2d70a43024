"""Benchmark harness: primary rays/s/chip on the flagship bunny scene.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference's best published number is 4.9k primary rays/s on the
69k-tri complex scene (BVH, single CPU thread — BASELINE.md, transcribed from
images/bounding_hierarchy/time_bb_hierarchy_complex_scene.png).  vs_baseline
is the speedup over that.

Robustness: the TPU tunnel can drop mid-run; each (mode, resolution) attempt
is retried in a fresh subprocess, falling back down a chain of configurations
until one completes.  Timing uses a full host fetch (np.asarray) — on the
tunneled TPU, block_until_ready alone returns before the device work is done.

Usage: python bench.py [--mode tiled|bvh|bruteforce] [--width W] [--height H]
                       [--frames N] [--no-shadows] [--single-attempt]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REFERENCE_RAYS_PER_S = 4900.0   # BASELINE.md: complex scene + BVH
REFERENCE_COMPLEX_MS = 48990.0  # BASELINE.md: 48.99 s/frame, 36-frame sweep


def run_complex(frames: int = 36) -> dict:
    """Head-to-head on the reference's own headline benchmark: the active
    complex scene (ground cube + bunny + 3 textured trees, 600x400, hard
    shadows) over a turntable sweep (simple_raytracer.cpp:530-796), rendered
    device-side with checksum reduction (only [F] floats cross the tunnel).
    Returns extra fields merged into bench.py's single JSON line."""
    import jax
    if os.environ.get("SRT_BENCH_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from simple_raytracer_tpu.config import (default_config, AnimationConfig,
                                             BVHConfig, CameraConfig)
    from simple_raytracer_tpu.scene import catalog
    from simple_raytracer_tpu.render.renderer import (ensure_prepared,
                                                      render_radiance)
    from simple_raytracer_tpu.driver.animation import sweep_angles

    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=600, height=400),
        bvh=BVHConfig(split="sah"))
    anim = AnimationConfig(start_deg=0.0, stop_deg=frames * 10.0,
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
    def sweep_sums(prep, Vs, light):
        def body(V):
            radiance, hit = render_radiance(prep, cfg, light, view_matrix=V)
            return jnp.where(hit[..., None], radiance, 0.0).sum()
        return jax.lax.map(body, Vs)

    np.asarray(sweep_sums(prep, views, light))          # compile + warm
    t0 = time.time()
    np.asarray(sweep_sums(prep, views, light))
    ms = (time.time() - t0) * 1e3 / len(angles)
    return {
        "complex_turntable_ms_per_frame": round(ms, 2),
        "complex_turntable_frames": len(angles),
        "complex_vs_reference_48990ms": round(REFERENCE_COMPLEX_MS / ms, 1),
    }


def run_golden_agreement() -> dict:
    """Render the golden tone-map frame (complex@0, 600x400, reinhard 0.5,
    gamma predates the series -> 1.0) with the SHIPPING configuration —
    mode=tiled, stack precision tier, real TPU — and record masked
    agreement against the reference author's committed
    images/tone_mapping/0_5_divide.bmp (VERDICT r2 weak #3: the goldens
    run in bvh mode on CPU; this pins the hardware kernel's fidelity as a
    driver-tracked number).  Returns fields merged into bench.py's JSON
    line."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image
    from simple_raytracer_tpu.config import default_config, CameraConfig
    from simple_raytracer_tpu.render.renderer import render
    from simple_raytracer_tpu.scene import catalog

    ref = np.asarray(Image.open(
        "/root/reference/images/tone_mapping/0_5_divide.bmp").convert(
        "RGB")).astype(np.int32)
    sm, _, light = catalog.complex_scene("/root/reference", 0.0,
                                         bake_view=True)
    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=600, height=400))
    cfg = cfg.replace(shading=dataclasses.replace(
        cfg.shading, reinhard_offset=0.5, gamma=1.0))
    ours = np.asarray(render(sm.build(), cfg, jnp.asarray(light))
                      ).astype(np.int32)
    bg = np.array([173, 216, 230])
    obg = np.all(ours == bg, axis=-1)
    rbg = np.all(ref == bg, axis=-1)
    both = ~obg & ~rbg
    sil = float((obg == rbg).mean())
    fg2 = float((np.abs(ours - ref).max(-1)[both] <= 2).mean())
    out = {
        "golden_tiled_silhouette": round(sil, 5),
        "golden_tiled_fg_tol2": round(fg2, 4),   # ~0.85: gap = the absent
    }                                            # cats + their shadows
    # Masked tripwire (VERDICT r3 weak #5): docs/golden_cat_mask.png is
    # the FROZEN known-gap footprint (missing cats + their shadows, plus
    # tol-2 LSB speckle on the tree textures and bunny shading vs the
    # author's MSVC build), generated once from the round-4 bvh/CPU render
    # and dilated 2 px.  Agreement OUTSIDE it is ~1.0, so a real shading
    # regression of any size moves this number; the unmasked metric's 15%
    # permanent slack could hide one.
    try:
        mask = np.asarray(Image.open(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "docs/golden_cat_mask.png"))) > 127
        keep = both & ~mask
        fg2m = float((np.abs(ours - ref).max(-1)[keep] <= 2).mean())
        out["golden_tiled_fg_tol2_masked"] = round(fg2m, 4)
    except Exception as e:              # noqa: BLE001
        print(f"# golden mask unavailable: {e!r}", file=sys.stderr)
    return out


def run_soft_shadow(frames: int = 32) -> dict:
    """Soft-shadow hardware metric (VERDICT r3 weak-metric ask): the
    BASELINE config-4 class — bunny + ground, 600x400, S=16 jittered
    light samples folded into one batched any-hit pass
    (simple_raytracer.cpp:348-401, images/soft_shadows/) — timed with
    view-varied frames.  Returns fields merged into the JSON line."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig, LightConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.render.renderer import render_radiance
    from simple_raytracer_tpu.render import integrator

    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    sm.transform_triangles(
        "bunny", T.translate((0.0, -5.5, 60.0)) @ T.rotate_y(3.14159265)
        @ T.scale(50.0, 50.0, 50.0))
    sm.load_obj_file("/root/reference/cube.obj", key="ground")
    sm.set_color("ground", (0.0, 1.0, 0.0))
    sm.transform_triangles(
        "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    cfg = default_config().replace(
        mode="tiled", camera=CameraConfig(width=600, height=400),
        light=LightConfig(num_samples=16), bvh=BVHConfig(split="sah"))
    prep = prepare(sm.build(), cfg)
    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
    eye = jnp.eye(4, dtype=jnp.float32)
    NF = frames

    @jax.jit
    def many(prep, light, eye):
        def one(i, acc):
            V = eye.at[0, 3].add(i.astype(jnp.float32) * 1e-5)
            rad, hit = render_radiance(prep, cfg, light
                                       + i.astype(jnp.float32) * 1e-4,
                                       view_matrix=V)
            img = integrator.finalize_image(rad, hit, cfg)
            return acc + img.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, NF, one, jnp.int32(0))

    int(many(prep, light, eye))
    t0 = time.time()
    int(many(prep, light, eye))
    ms = (time.time() - t0) * 1e3 / NF
    return {"soft_shadow_s16_ms_per_frame": round(ms, 2)}


def run_train_step() -> dict:
    """Gradient-path hardware metric (VERDICT r3 #5): full train step
    (fwd + bwd + SGD update) at bunny 960x540 through the production tiled
    kernel via the fixed-topology recompute.  Steps chain (params evolve),
    so nothing param-dependent hoists; the frozen-geometry walk is
    legitimately step-invariant under fixed rays and is excluded by
    timing steps at their steady state."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.render.renderer import render_radiance
    from simple_raytracer_tpu.dist import make_train_step, extract_params

    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    sm.transform_triangles(
        "bunny", T.translate((0.0, -5.5, 60.0)) @ T.rotate_y(3.14159265)
        @ T.scale(50.0, 50.0, 50.0))
    sm.load_obj_file("/root/reference/cube.obj", key="ground")
    sm.set_color("ground", (0.0, 1.0, 0.0))
    sm.transform_triangles(
        "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    W, H = 960, 540
    cfg = default_config().replace(
        mode="tiled",
        camera=CameraConfig(width=W, height=H, focal=6000.0 * H / 1080.0),
        bvh=BVHConfig(split="sah"))
    prep = prepare(sm.build(), cfg)
    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)
    rad, hit = jax.jit(lambda p, l: render_radiance(p, cfg, l))(prep, light)
    target = jnp.where(hit[..., None], rad, 0.0)
    params = extract_params(prep.scene, light + 40.0)
    step = make_train_step(prep, cfg, lr=1e-3)
    N = 32

    @jax.jit
    def many(params, target):
        def one(i, st):
            pp, acc = st
            pp, loss = step(pp, target)
            return pp, acc + loss
        _, acc = jax.lax.fori_loop(0, N, one, (params, jnp.float32(0)))
        return acc
    float(many(params, target))
    t0 = time.time()
    float(many(params, target))
    ms = (time.time() - t0) * 1e3 / N
    return {"train_step_bunny_960x540_ms": round(ms, 2)}


def run_calibration() -> dict:
    """Per-process calibration kernel (VERDICT r4 #5): the tunneled chip
    shows 2-4x PROCESS-to-process throughput variance on short kernels
    (DESIGN.md part 3 — the same standalone walk measured 1.8 and 7.0 ms
    in different processes), so stage absolutes from different processes
    are not comparable raw.  Every BENCH line now carries ``calib_ms``:
    the amortized per-iteration time of a FIXED reference workload (a
    matmul + elementwise chain shaped like one walk super-step), measured
    in the same process as the headline.  Cross-process stage comparisons
    quote ratios against their own line's calib_ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    K, M, T = 64, 2048, 4096      # one nearest super-step's contraction
    a = jnp.ones((K, M), jnp.bfloat16)
    b = jnp.ones((K, T), jnp.bfloat16)
    N = 256

    @jax.jit
    def calib(a, b):
        def one(i, acc):
            q = jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = q[:128] * (1.0 / jnp.maximum(q[128:256], 1.0))
            return jnp.minimum(acc, jnp.min(t, axis=0) + i)
        return jax.lax.fori_loop(0, N, one,
                                 jnp.full((T,), jnp.inf, jnp.float32))
    np.asarray(calib(a, b))
    t0 = time.time()
    np.asarray(calib(a, b))
    return {"calib_ms": round((time.time() - t0) * 1e3 / N, 4)}


def run_once(mode: str, width: int, height: int, frames: int,
             shadows: bool) -> dict:
    import jax
    if os.environ.get("SRT_BENCH_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from simple_raytracer_tpu.config import (default_config, BVHConfig,
                                             CameraConfig, LightConfig)
    from simple_raytracer_tpu.scene.scene import SceneManager
    import simple_raytracer_tpu.scene.transforms as T
    from simple_raytracer_tpu.accel.prepared import prepare
    from simple_raytracer_tpu.render.renderer import render_radiance
    from simple_raytracer_tpu.render import integrator

    t0 = time.time()
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file("/root/reference/obj/stanford-bunny.obj", key="bunny")
    sm.set_color("bunny", (0.8, 0.7, 0.6))
    # bunny at 50x spans ~8 units; center of a focal-400 frustum at z=60
    m = T.translate((0.0, -5.5, 60.0)) @ T.rotate_y(3.14159265) @ \
        T.scale(50.0, 50.0, 50.0)
    sm.transform_triangles("bunny", m)
    if shadows:
        # a ground slab under the bunny so the occlusion pass does real work
        # (the reference's headline scene also shadows onto a ground cube)
        sm.load_obj_file("/root/reference/cube.obj", key="ground")
        sm.set_color("ground", (0.0, 1.0, 0.0))
        sm.transform_triangles(
            "ground", T.translate((0.0, 9.0, 60.0)) @ T.scale(30.0, 2.0, 30.0))
    scene = sm.build()
    # focal zoomed so the bunny fills most of the frame: rays/s must measure
    # full-frame WORK, not empty-tile overhead (bunny at 50x spans ~±4 units
    # at z=60; focal 6000 -> ~±450 px of a 1080-tall frame)
    focal = 6000.0 * height / 1080.0
    cfg = default_config().replace(
        mode=mode,
        camera=CameraConfig(width=width, height=height, focal=focal),
        light=LightConfig(enable_shadows=shadows),
        bvh=BVHConfig(split="sah"))   # tighter blocks -> 25% fewer visits
    prep = prepare(scene, cfg) if mode != "bruteforce" else scene
    print(f"# scene+prep: {time.time()-t0:.2f}s, mode={mode}, "
          f"{width}x{height}, shadows={shadows}, "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    light = jnp.asarray([500.0, -300.0, -200.0], jnp.float32)

    @jax.jit
    def frame(operand, light_pos):
        radiance, hit = render_radiance(operand, cfg, light_pos)
        return integrator.finalize_image(radiance, hit, cfg)

    # 64 frames per timed call: the tunneled TPU has a ~27 ms FIXED
    # per-call overhead (dispatch + scalar fetch + program launch,
    # scripts/xla_op_probe.py + /tmp overhead fit: N=1 27.2 ms, N=256
    # 0.13 ms/iter) — at 8 frames that inflated every "ms/frame" by
    # ~3.4 ms.  64 amortizes it to ~0.4 ms while keeping the call < 1 s.
    NF = max(frames, 64)

    @jax.jit
    def many(operand, light_pos, eye):
        # N frames inside ONE device program: the tunneled TPU adds ~1s of
        # round-trip per host call, so per-frame time must be measured
        # amortized.  HONESTY (round-4 fix): varying only the LIGHT lets
        # XLA hoist the light-invariant stages (cull + nearest walk +
        # record gather) out of the loop — measured 17.9 ms/frame hoisted
        # vs 61.2 honest (scripts/bench_hoist.py), i.e. rounds 1-3 bunny
        # headlines amortized the nearest pass over the batch.  Every
        # frame now gets an epsilon-translated VIEW matrix: identical
        # work, but no stage is loop-invariant.
        def one(i, acc):
            lp = light_pos + i.astype(jnp.float32) * 1e-4
            V = eye.at[0, 3].add(i.astype(jnp.float32) * 1e-5)
            radiance, hit = render_radiance(operand, cfg, lp, view_matrix=V)
            img = integrator.finalize_image(radiance, hit, cfg)
            return acc + img.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, NF, one, jnp.int32(0))

    t0 = time.time()
    img = np.asarray(frame(prep, light))          # full host fetch
    print(f"# compile+first frame: {time.time()-t0:.2f}s", file=sys.stderr)
    bg = np.all(img == np.array([173, 216, 230]), axis=-1)
    frac = float((~bg).mean())
    assert 0.05 < frac < 0.99, f"implausible bunny coverage {frac}"

    eye = jnp.eye(4, dtype=jnp.float32)
    t0 = time.time()
    int(many(prep, light, eye))                   # compile + warm
    print(f"# many() compile+first: {time.time()-t0:.2f}s", file=sys.stderr)
    t0 = time.time()
    int(many(prep, light, eye))
    best = (time.time() - t0) / NF
    rays = width * height
    print(f"# {NF} frames batched: {best*NF:.3f}s -> {best*1e3:.2f} ms/frame",
          file=sys.stderr)
    platform = jax.devices()[0].platform
    return {
        "metric": (f"primary_rays_per_s_per_chip_bunny_"
                   f"{width}x{height}_{mode}"
                   + ("" if shadows else "_noshadow")
                   + ("" if platform == "tpu" else f"_{platform}")),
        "value": round(rays / best, 1),
        "unit": "rays/s",
        "methodology": "view-varied frames (r4 fix: light-only loops let XLA hoist the nearest pass)",
        "vs_baseline": round(rays / best / REFERENCE_RAYS_PER_S, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--no-shadows", dest="shadows", action="store_false",
                   default=True)
    p.add_argument("--single-attempt", action="store_true",
                   help="run in-process, no retry chain (internal)")
    args = p.parse_args()

    if args.single_attempt:
        result = run_once(args.mode or "tiled", args.width or 1920,
                          args.height or 1080, args.frames, args.shadows)
        try:
            result.update(run_calibration())
        except Exception as e:                 # noqa: BLE001
            print(f"# run_calibration failed: {e!r}", file=sys.stderr)
        if (args.mode or "tiled") == "tiled" and (args.width or 1920) >= 960:
            # head-to-head on the reference's own benchmark scene, merged
            # into the same JSON line; never allowed to kill the headline
            # metric (VERDICT r2 weak #6)
            try:
                result.update(run_complex())
            except Exception as e:             # noqa: BLE001
                print(f"# run_complex failed: {e!r}", file=sys.stderr)
            try:
                result.update(run_golden_agreement())
            except Exception as e:             # noqa: BLE001
                print(f"# run_golden_agreement failed: {e!r}",
                      file=sys.stderr)
            try:
                result.update(run_soft_shadow())
            except Exception as e:             # noqa: BLE001
                print(f"# run_soft_shadow failed: {e!r}", file=sys.stderr)
            try:
                result.update(run_train_step())
            except Exception as e:             # noqa: BLE001
                print(f"# run_train_step failed: {e!r}", file=sys.stderr)
        print(json.dumps(result))
        return

    # fallback chain: (mode, W, H, env) — first success wins.  The final
    # entry pins CPU so a dead TPU tunnel still yields a (clearly labeled)
    # measurement instead of nothing.
    chain = []
    if args.mode or args.width:
        chain.append((args.mode or "tiled", args.width or 1920,
                      args.height or 1080, None))
    chain += [("tiled", 1920, 1080, None), ("tiled", 960, 540, None),
              ("bvh", 960, 540, None), ("tiled", 512, 288, None),
              ("bvh", 512, 288, None), ("bvh", 256, 192, "cpu")]

    deadline = time.time() + 30 * 60
    for attempt, (mode, w, h, platform) in enumerate(chain):
        last = attempt == len(chain) - 1
        for retry in range(2):
            budget = deadline - time.time()
            if budget < 60 and not last:
                break
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--single-attempt", "--mode", mode, "--width", str(w),
                   "--height", str(h), "--frames", str(args.frames)]
            if not args.shadows:
                cmd.append("--no-shadows")
            env = dict(os.environ)
            if platform:
                env["SRT_BENCH_PLATFORM"] = platform
            else:
                env.pop("SRT_BENCH_PLATFORM", None)   # no stale CPU pinning
            # the terminal CPU fallback gets a full timeout regardless of the
            # spent budget — it is the "always yield a measurement" leg
            # (r4: first attempts get 1200 s — the JSON line now carries 5
            # hardware metrics and the remote-compile service is bursty)
            tmo = 700 if last else max(min(budget, 1200), 120)
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=tmo,
                                   env=env, cwd=os.path.dirname(
                                       os.path.abspath(__file__)))
            except subprocess.TimeoutExpired:
                print(f"# attempt {mode} {w}x{h} timed out", file=sys.stderr)
                continue
            sys.stderr.write(r.stderr[-2000:])
            if r.returncode == 0 and r.stdout.strip():
                line = r.stdout.strip().splitlines()[-1]
                try:
                    json.loads(line)
                except json.JSONDecodeError:
                    continue
                print(line)
                return
            if last and retry == 1:
                break       # nothing left to wait for
            print(f"# attempt {mode} {w}x{h} failed (rc={r.returncode}); "
                  f"waiting for TPU recovery", file=sys.stderr)
            time.sleep(45)
    print(json.dumps({"metric": "primary_rays_per_s_per_chip_bunny",
                      "value": 0.0, "unit": "rays/s",
        "methodology": "view-varied frames (r4 fix: light-only loops let XLA hoist the nearest pass)", "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
