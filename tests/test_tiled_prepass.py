"""bf16 prepass + exact-refine pipeline (kernels/tiled_t.py).

Covers: bit-equality of the two-pass path vs the direct HIGHEST walk, that
the refined plan is a genuine subset, and — the load-bearing claim — that
PREPASS_M soundly majorizes real bf16 matmul error (simulated f32->bf16
operand rounding, which is what the TPU MXU does at DEFAULT precision).
"""

import numpy as np
import jax
import jax.numpy as jnp

from simple_raytracer_tpu.config import default_config
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.kernels import tiled, tiled_t
from simple_raytracer_tpu.ops.camera import primary_rays
from simple_raytracer_tpu.ops.intersect import pack_mt_gram_np, ray_features
from simple_raytracer_tpu.scene.scene import SceneManager
import simple_raytracer_tpu.scene.transforms as T

from conftest import reference_asset


def _scene():
    sm = SceneManager(root="/root/reference")
    sm.load_obj_file(reference_asset("cube.obj"), key="cube")
    sm.set_color("cube", (0.2, 0.8, 0.3))
    sm.transform_triangles(
        "cube", T.translate((0.0, 5.0, 80.0)) @ T.rotate_y(25.0)
        @ T.scale(15.0, 15.0, 15.0))
    sm.load_obj_file(reference_asset("sphere.obj"), key="sphere")
    sm.set_color("sphere", (0.9, 0.9, 0.2))
    sm.transform_triangles(
        "sphere", T.translate((-10.0, -15.0, 60.0)) @ T.scale(6.0, 6.0, 6.0))
    return sm.build()


def test_prepass_exact_and_subset(monkeypatch):
    scene = _scene()
    prep = prepare(scene, default_config().replace(mode="tiled"))
    o, d = primary_rays(64, 32)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    tile = 256

    monkeypatch.setenv("SRT_TILED_PREPASS", "0")
    t0, i0 = jax.jit(lambda p, o, d: tiled_t.hits(p, o, d, tile, 1e-12))(
        prep, o, d)
    t0, i0 = np.asarray(t0), np.asarray(i0)

    monkeypatch.setenv("SRT_TILED_PREPASS", "1")
    t1, i1 = jax.jit(lambda p, o, d: tiled_t.hits(p, o, d, tile, 1e-12))(
        prep, o, d)
    np.testing.assert_array_equal(t0, np.asarray(t1))
    np.testing.assert_array_equal(i0, np.asarray(i1))

    # the refined plan must be a subset of the original plan's windows
    Ft, n, R = tiled_t.ray_tile_features_t(o, d, tile)
    plan = tiled_t.cull(prep, o, d, tile, 248)
    flags = tiled_t.tiled_prepass_t(Ft, plan, prep.gram_t, tile,
                                    prep.block_size, tiled_t.WINDOW_BLOCKS,
                                    1e-12)
    plan2 = tiled_t._refine_plan(plan, flags)
    plan, plan2 = np.asarray(plan), np.asarray(plan2)
    cnt1 = np.where(plan[:, 3] == 1, plan[:, 2], plan[:, 1])
    cnt2 = plan2[:, 2]
    assert (cnt2 <= cnt1).all()
    assert plan2[:, 3].all(), "refined plans are always list-mode"
    for r in range(plan.shape[0]):
        orig = set((plan[r, 8:8 + cnt1[r]] & 0xFFFF).tolist()
                   if plan[r, 3] == 1 else
                   range(plan[r, 0], plan[r, 0] + plan[r, 1]))
        got = (plan2[r, 8:8 + cnt2[r]] & 0xFFFF).tolist()
        assert set(got) <= orig
        # front-to-back bound ordering preserved
        bounds = (plan2[r, 8:8 + cnt2[r]].astype(np.int64) >> 16).tolist()
        assert bounds == sorted(bounds)


def test_prepass_margin_majorizes_bf16_error():
    """PREPASS_M * sum_k |G_k| * alpha_k must dominate the observed error of
    a bf16-rounded-operand f32-accumulated dot product — on REAL scene MT
    factors and real camera ray features (the adversarial part: t_num rows
    mix ~1e2-scale origin terms, so cancellation is heavy)."""
    scene = _scene()
    prep = prepare(scene, default_config().replace(mode="tiled"))
    v = np.asarray(prep.scene.verts[..., :3] / prep.scene.verts[..., 3:4])
    G = pack_mt_gram_np(v).reshape(-1, 10, 4)            # [T, 10, 4]
    o, d = primary_rays(64, 32)
    F = np.asarray(ray_features(o.reshape(-1, 3), d.reshape(-1, 3)))

    rng = np.random.default_rng(0)
    ti = rng.integers(0, G.shape[0], 4096)
    ri = rng.integers(0, F.shape[0], 4096)
    Gs = G[ti].reshape(4096, 40).astype(np.float32)      # 4 groups each
    Fs = F[ri].astype(np.float32)                        # [4096, 10]

    def bf16(x):
        return np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                          .astype(jnp.float32))

    Gq = Gs.reshape(4096, 10, 4)
    exact = np.einsum("nfg,nf->ng", Gq.astype(np.float64),
                      Fs.astype(np.float64))
    approx = np.einsum("nfg,nf->ng", bf16(Gq).astype(np.float64),
                       bf16(Fs).astype(np.float64))
    err = np.abs(approx - exact)
    alpha = np.abs(Fs).max(axis=0)                       # per-feature max
    bound = tiled_t.PREPASS_M * np.einsum("nfg,f->ng", np.abs(Gq), alpha)
    # strict headroom: the bound must not merely cover, but cover 2x
    assert (err * 2.0 <= bound + 1e-30).all(), (
        f"margin too tight: max err/bound = "
        f"{(err / np.maximum(bound, 1e-30)).max():.4f}")


def test_prepass_disabled_for_pure_ranges(monkeypatch):
    """maxv=0 (range-only culling) must bypass the prepass and still match."""
    scene = _scene()
    prep = prepare(scene, default_config().replace(mode="tiled"))
    o, d = primary_rays(48, 16)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    monkeypatch.setenv("SRT_TILED_PREPASS", "1")
    t_r, i_r = jax.jit(
        lambda p, o, d: tiled_t.hits(p, o, d, 256, 1e-12, maxv=0))(prep, o, d)
    t_l, i_l = jax.jit(
        lambda p, o, d: tiled_t.hits(p, o, d, 256, 1e-12, maxv=248))(
            prep, o, d)
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_l))
    np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_l))
