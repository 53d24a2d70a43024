"""End-to-end smoke tests: BASELINE config 1 (sphere, 256x256, brute force)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_raytracer_tpu import RenderConfig, CameraConfig, SceneManager, render
from simple_raytracer_tpu.render.renderer import render_radiance
from simple_raytracer_tpu.scene import transforms as T
from tests.conftest import needs_assets, reference_asset


def _sphere_scene():
    mgr = SceneManager(root=reference_asset(""))
    mgr.load_obj_file(reference_asset("sphere.obj"), key="sphere.obj")
    mgr.transform_triangles("sphere.obj", T.translate([0.0, 6.0, 30.0]))
    return mgr.build()


def _cfg(n=128):
    return RenderConfig(camera=CameraConfig(width=n, height=n, focal=float(n)))


@needs_assets
def test_sphere_render_smoke():
    scene = _sphere_scene()
    cfg = _cfg(128)
    light = jnp.array([50.0, -30.0, -20.0])
    img = np.asarray(render(scene, cfg, light))
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # background light-blue present around the sphere
    assert tuple(img[0, 0]) == (173, 216, 230)
    # sphere center (0,6,30) projects to col 64, row 64 + 6/30*128 ≈ 89;
    # it is red (default color, Object.cpp:29)
    cy, cx = 89, 64
    assert img[cy, cx, 0] > img[cy, cx, 2]      # red-dominant
    hit_frac = np.mean(np.any(img != np.array([173, 216, 230]), axis=-1))
    assert 0.01 < hit_frac < 0.9


@needs_assets
def test_render_jit_compiles_and_caches():
    scene = _sphere_scene()
    cfg = _cfg(64)
    f = jax.jit(lambda s, l: render_radiance(s, cfg, l)[0])
    light = jnp.array([50.0, -30.0, -20.0])
    r1 = f(scene, light)
    r2 = f(scene, light + 0.0)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


@needs_assets
def test_shadow_dims_not_zeroes():
    """Shadowed samples are divided by 5, not zeroed (cpp:369): a scene with an
    occluder keeps nonzero radiance in shadowed pixels."""
    mgr = SceneManager(root=reference_asset(""))
    mgr.load_obj_file(reference_asset("cube.obj"), key="ground")
    mgr.transform_triangles("ground", T.scale(30.0, 2.0, 30.0))
    mgr.transform_triangles("ground", T.translate([0.0, 10.0, 40.0]))
    mgr.load_obj_file(reference_asset("cube.obj"), key="blocker")
    mgr.transform_triangles("blocker", T.scale(4.0, 4.0, 4.0))
    mgr.transform_triangles("blocker", T.translate([0.0, -2.0, 40.0]))
    scene = mgr.build()
    cfg = _cfg(64)
    # light above: blocker shadows part of the ground
    light = jnp.array([0.0, -100.0, 40.0])
    rad, hit = render_radiance(scene, cfg, light)
    rad = np.asarray(rad)
    hit = np.asarray(hit)
    assert hit.any()
    # ambient keeps every hit pixel nonzero in at least one channel (the cube
    # is default-red, so only the R channel is guaranteed)
    assert np.all(rad[hit].max(axis=-1) > 0.0)


@needs_assets
def test_black_pixels_become_background():
    """Hits shading to exactly (0,0,0) after quantization are swallowed by the
    light-blue background fill (cpp:481, :518)."""
    mgr = SceneManager(root=reference_asset(""))
    mgr.load_obj_file(reference_asset("cube.obj"), key="cube")
    mgr.set_color("cube", (0.0, 0.0, 0.0))       # black object
    mgr.set_properties("cube", ambient=0.0, specular=0.0)
    mgr.transform_triangles("cube", T.scale(10.0, 10.0, 10.0))
    mgr.transform_triangles("cube", T.translate([0.0, 0.0, 40.0]))
    scene = mgr.build()
    cfg = _cfg(64)
    img = np.asarray(render(scene, cfg, jnp.array([0.0, -100.0, 0.0])))
    assert np.all(img.reshape(-1, 3) == np.array([173, 216, 230], np.uint8))
