"""OBJ/MTL/texture loader tests (reference: Object.cpp:25-170)."""

import os

import numpy as np
import pytest

from simple_raytracer_tpu.scene.obj_loader import (
    TextureRegistry, load_obj)
from tests.conftest import needs_assets, reference_asset


def test_missing_file_soft_failure(capsys):
    """Missing OBJ prints to stderr and yields an empty mesh (Object.cpp:35-39)."""
    mesh = load_obj("/nonexistent/cat.obj")
    assert mesh.num_triangles == 0
    assert "cat.obj" in capsys.readouterr().err


def test_inline_obj(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 3//1\n")
    mesh = load_obj(str(p))
    assert mesh.num_triangles == 1
    np.testing.assert_allclose(mesh.verts[0, :, 3], 1.0)          # homogeneous w
    np.testing.assert_allclose(mesh.verts[0, 1, :3], [1, 0, 0])
    np.testing.assert_allclose(mesh.normals[0, 0], [0, 0, 1])
    assert mesh.tri_tex[0] == -1


def test_quad_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    mesh = load_obj(str(p))
    assert mesh.num_triangles == 2


def test_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    mesh = load_obj(str(p))
    assert mesh.num_triangles == 1
    np.testing.assert_allclose(mesh.verts[0, 2, :3], [0, 1, 0])


def test_uv_bake_semantics(tmp_path):
    """UV bake: u = floor(tx*W) % W, v = floor((1-ty)*H) % H, positive mod,
    plus vertex-0 color sampling (Object.cpp:113-125)."""
    from PIL import Image
    img = np.zeros((4, 8, 3), np.uint8)
    img[3, 2] = (255, 0, 0)      # the texel vertex 0 should hit
    Image.fromarray(img).save(tmp_path / "tex.png")
    (tmp_path / "m.mtl").write_text("newmtl m0\nmap_Kd tex.png\n")
    # vertex 0: tx=0.25, ty=0.1 -> u=floor(0.25*8)%8=2, v=floor(0.9*4)%4=3
    (tmp_path / "t.obj").write_text(
        "mtllib m.mtl\nusemtl m0\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0.25 0.1\nvt 0.5 0.5\nvt 0.75 0.9\n"
        "f 1/1 2/2 3/3\n")
    mesh = load_obj(str(tmp_path / "t.obj"))
    assert mesh.num_triangles == 1
    np.testing.assert_allclose(mesh.uvs[0, 0], [2, 3])
    np.testing.assert_allclose(mesh.tri_color[0], [1.0, 0.0, 0.0])
    assert mesh.tri_tex[0] == 0
    # negative-u wrap: floor stays negative, positive modulo fixes it
    (tmp_path / "t2.obj").write_text(
        "mtllib m.mtl\nusemtl m0\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt -0.125 0.1\nvt 0.5 0.5\nvt 0.75 0.9\n"
        "f 1/1 2/2 3/3\n")
    mesh2 = load_obj(str(tmp_path / "t2.obj"))
    assert mesh2.uvs[0, 0, 0] == (int(np.floor(-0.125 * 8)) % 8 + 8) % 8 == 7


@needs_assets
def test_reference_asset_counts():
    """Known triangle counts (SURVEY.md §2 #23)."""
    assert load_obj(reference_asset("cube.obj")).num_triangles == 12
    assert load_obj(reference_asset("sphere.obj")).num_triangles == 320
    bunny = load_obj(reference_asset("obj/stanford-bunny.obj"))
    assert bunny.num_triangles == 69451
    # bunny has no normals or UVs
    assert np.all(bunny.normals == 0)
    assert np.all(bunny.tri_tex == -1)


@needs_assets
def test_tree_texture_loads():
    reg = TextureRegistry(root=reference_asset(""))
    mesh = load_obj(reference_asset("obj/tree/tree.obj"), textures=reg)
    assert mesh.num_triangles > 0
    assert len(mesh.textures) == 1          # oak diffuse
    assert np.any(mesh.tri_tex >= 0)
