"""Generate the feature-evidence gallery (docs/gallery/ + docs/gallery.md).

The reference documents every feature empirically with parameter-ablation
renders under images/ (SURVEY.md §2 #24: phong_illumination/, soft_shadows/,
tone_mapping/, homogenious_notation_images/, ...).  This script regenerates
the same evidence matrix with the new framework.

Run: python scripts/make_gallery.py  (CPU-friendly, ~a minute)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from simple_raytracer_tpu.config import (default_config, CameraConfig,
                                         LightConfig, ShadingConfig)
from simple_raytracer_tpu.render.renderer import render
from simple_raytracer_tpu.scene.scene import SceneManager
from simple_raytracer_tpu.scene import catalog
import simple_raytracer_tpu.scene.transforms as T
from simple_raytracer_tpu.io.image import save_image

ROOT = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "gallery")
LIGHT = jnp.array([500.0, -300.0, -200.0], jnp.float32)
CAM = CameraConfig(width=300, height=200)

entries = []


def shot(name, caption, scene, cfg, light=LIGHT, view=None):
    path = os.path.join(OUT, f"{name}.png")
    img = np.asarray(render(scene, cfg, light, view_matrix=view))
    save_image(path, img)
    entries.append((name, caption))
    print(f"wrote {path}")


def sphere_scene():
    sm = SceneManager(root=ROOT)
    sm.load_obj_file(os.path.join(ROOT, "sphere.obj"), key="s")
    sm.transform_triangles("s", T.translate((0.0, 2.0, 18.0)))
    return sm.build()


def shadow_scene():
    sm = SceneManager(root=ROOT)
    sm.load_obj_file(os.path.join(ROOT, "cube.obj"), key="ground")
    sm.set_color("ground", (0.1, 0.8, 0.2))
    sm.transform_triangles("ground", T.scale(25.0, 2.0, 25.0))
    sm.transform_triangles("ground", T.translate((0.0, 9.0, 60.0)))
    sm.load_obj_file(os.path.join(ROOT, "sphere.obj"), key="s")
    sm.set_color("s", (0.9, 0.3, 0.2))
    sm.transform_triangles("s", T.scale(3.0, 3.0, 3.0))
    sm.transform_triangles("s", T.translate((0.0, 2.0, 60.0)))
    return sm.build()


def main():
    os.makedirs(OUT, exist_ok=True)
    base = default_config().replace(camera=CAM)

    # --- Phong ablations (reference images/phong_illumination/) ---------
    s = sphere_scene()
    shot("phong_default", "Phong: default material (ambient .2/spec .5/shin 15)",
         s, base)
    sm = SceneManager(root=ROOT)
    sm.load_obj_file(os.path.join(ROOT, "sphere.obj"), key="s")
    sm.transform_triangles("s", T.translate((0.0, 2.0, 18.0)))
    sm.set_properties("s", specular=1.0)
    shot("phong_2x_specular", "Phong: doubled specular strength", sm.build(), base)
    sm2 = SceneManager(root=ROOT)
    sm2.load_obj_file(os.path.join(ROOT, "sphere.obj"), key="s")
    sm2.transform_triangles("s", T.translate((0.0, 2.0, 18.0)))
    sm2.set_properties("s", ambient=0.6)
    shot("phong_3x_ambient", "Phong: tripled ambient", sm2.build(), base)
    shot("phong_smooth_normals",
         "Smooth vertex-normal interpolation (reference :132-140, toggled)",
         s, base.replace(shading=ShadingConfig(smooth_normals=True)))

    # --- Transforms (reference images/homogenious_notation_images/) ----
    for name, mat, cap in [
        ("xform_scale", T.scale(20.0, 10.0, 20.0), "Non-uniform scale"),
        ("xform_shear", T.scale(15., 15., 15.) @ T.shear(shear_xy=0.5),
         "Shear (xy)"),
        ("xform_mirror_rotate",
         T.mirror(mx=True) @ T.rotate_y(0.5) @ T.scale(15., 15., 15.),
         "Mirror x + rotate y"),
    ]:
        sm = SceneManager(root=ROOT)
        sm.load_obj_file(os.path.join(ROOT, "cube.obj"), key="c")
        sm.set_color("c", (0.9, 0.7, 0.1))
        sm.transform_triangles("c", T.translate((0.0, 0.0, 80.0)) @ mat)
        shot(name, cap, sm.build(), base)

    # --- Soft shadows N ablation (reference images/soft_shadows/) -------
    sh = shadow_scene()
    for n in (1, 8, 16):
        shot(f"soft_shadows_{n}",
             f"Soft shadows, {n} light sample(s) (cumulative +3.0 jitter)",
             sh, base.replace(light=LightConfig(num_samples=n)))

    # --- Tone mapping ablation (reference images/tone_mapping/) ---------
    for div in (0.1, 0.5, 4.0):
        shot(f"tonemap_{str(div).replace('.', '_')}",
             f"Reinhard c/(c+{div}) + gamma 1.1",
             sh, base.replace(shading=ShadingConfig(reinhard_offset=div)))
    shot("tonemap_off", "Tone mapping disabled",
         sh, base.replace(shading=ShadingConfig(tonemap_enabled=False)))

    # --- Texture mapping (reference images/texture_mapping/) ------------
    sm = SceneManager(root=ROOT)
    sm.load_obj_file(os.path.join(ROOT, "obj/tree/tree.obj"), key="tree")
    sm.transform_triangles("tree", T.scale(0.035, 0.035, 0.035))
    sm.transform_triangles("tree", T.rotate_x(float(np.radians(-90.0))))
    sm.transform_triangles("tree", T.translate((0.0, 12.0, 40.0)))
    shot("texture_tree", "Baked-texel texture mapping (oak), 18k tris",
         sm.build(), base.replace(mode="bvh"))

    # --- Bunny + BVH (reference images/bounding_hierarchy/) -------------
    sm = SceneManager(root=ROOT)
    sm.load_obj_file(os.path.join(ROOT, "obj/stanford-bunny.obj"), key="b")
    sm.set_color("b", (0.9, 0.9, 0.9))
    sm.transform_triangles("b", T.scale(50., 50., 50.))
    sm.transform_triangles("b", T.rotate_y(float(np.pi)))
    sm.transform_triangles("b", T.translate((0.0, -5.5, 60.0)))
    shot("bunny_bvh", "Stanford bunny (69,451 tris), stackless BVH",
         sm.build(), base.replace(mode="bvh"))

    # --- The reference's ACTIVE complex scene (:553-618) ----------------
    sm, view, light = catalog.complex_scene(ROOT, 120.0, bake_view=False)
    shot("complex_scene",
         "The reference's active scene: ground + bunny + 3 textured trees, "
         "BVH + hard shadows", sm.build(),
         base.replace(mode="bvh"), light=jnp.asarray(light), view=view)

    # --- Turntable frames (reference images/image_series/) --------------
    sm, _, light = catalog.four_cubes(ROOT, 0.0, bake_view=False)
    scene = sm.build()
    for a in (0, 40, 80):
        V = catalog.orbit_view(float(a), 100.0, 0.0, 0.0)
        shot(f"turntable_{a}", f"Four-cubes turntable, {a} deg",
             scene, base, light=jnp.asarray(light), view=V)

    md = ["# Feature gallery",
          "",
          "Regenerates the reference's empirical feature evidence "
          "(`images/` ablation matrix) with the TPU framework. "
          "Produced by `scripts/make_gallery.py`.",
          ""]
    for name, cap in entries:
        md.append(f"### {cap}\n\n![{name}](gallery/{name}.png)\n")
    with open(os.path.join(OUT, "..", "gallery.md"), "w") as f:
        f.write("\n".join(md))
    print(f"wrote docs/gallery.md with {len(entries)} entries")


if __name__ == "__main__":
    main()
