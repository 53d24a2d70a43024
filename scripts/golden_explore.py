"""Recover the render configs of the reference's committed ablation series.

images/soft_shadows/{N}Shadows_distance{D}.bmp are 600x400 complex-scene
frames (silhouette agrees with the tone_mapping goldens to 0.9999) rendered
with softShadow(lightAmount=N) (simple_raytracer.cpp:366-383) and a jitter
step of D ("Before it was 2" comment: the committed +3.0f step postdates
these).  This script renders each candidate config and reports masked
foreground agreement + cross-discrimination, to pick the config
tests/test_golden_ablations.py pins.

Usage: python scripts/golden_explore.py [--cpu] [--series soft|phong]
"""

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BG = np.array([173, 216, 230])


def ref_image(rel):
    from PIL import Image
    return np.asarray(Image.open(
        os.path.join("/root/reference", rel)).convert("RGB")).astype(np.int32)


def tol_frac(ours, ref, tol=2):
    obg = np.all(ours == BG, axis=-1)
    rbg = np.all(ref == BG, axis=-1)
    both = ~obg & ~rbg
    return float((np.abs(ours - ref).max(-1)[both] <= tol).mean())


def render_soft(num_samples, jitter_step, gamma, mode):
    import dataclasses
    import jax.numpy as jnp
    from simple_raytracer_tpu.config import default_config, CameraConfig
    from simple_raytracer_tpu.render.renderer import render
    from simple_raytracer_tpu.scene import catalog

    sm, _, light = catalog.complex_scene("/root/reference", 0.0,
                                         bake_view=True)
    scene = sm.build()
    cfg = default_config().replace(
        mode=mode, camera=CameraConfig(width=600, height=400))
    cfg = cfg.replace(
        shading=dataclasses.replace(cfg.shading, gamma=gamma),
        light=dataclasses.replace(cfg.light, num_samples=num_samples,
                                  jitter_step=jitter_step))
    return np.asarray(render(scene, cfg, jnp.asarray(light))).astype(np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--mode", default="bvh")
    p.add_argument("--series", default="soft")
    args = p.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    series = [("8Shadows_distance8.bmp", 8, 8.0),
              ("16Shadows_distance4.bmp", 16, 4.0),
              ("32Shadows_distance4.bmp", 32, 4.0),
              ("32shadows_distance2.bmp", 32, 2.0),
              ("32shadows_distance3.bmp", 32, 3.0)]
    refs = {f: ref_image("images/soft_shadows/" + f) for f, _, _ in series}
    for gamma in (1.1, 1.0):
        renders = {}
        for f, S, D in series:
            renders[f] = render_soft(S, D, gamma, args.mode)
            row = " ".join(
                f"{f2.split('.')[0][:18]}={tol_frac(renders[f], refs[f2]):.3f}"
                for f2, _, _ in series)
            print(f"gamma={gamma} render({S},{D}): {row}", flush=True)


if __name__ == "__main__":
    main()
