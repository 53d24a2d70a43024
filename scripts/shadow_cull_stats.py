"""Shadow-cull tightness statistics on the complex scene (CPU).

The any-hit pass dominates the turntable frame (complex@180: occl 57 of
83 ms), and its cost ~ visible windows per shadow tile.  The production
cull (tiled.cull_blocks_lists) abstracts a tile by INDEPENDENT origin and
direction AABBs — but shadow rays all pass through one light point
(p = (1-t)·o + t·L), so the true swept volume pinches at the light while
the interval test keeps growing.  This script measures the gap:

  interval — the production visibility (what the kernel walks today)
  exact    — per-tile oracle: a window is needed iff ANY ray of the tile
             (segment o -> o + t_max*(L-o), t unbounded per the reference
             no-max-t quirk) intersects the window AABB

Reports visible windows/tile for both and the inflation factor.

Run: python scripts/shadow_cull_stats.py [width height]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from simple_raytracer_tpu.config import default_config, BVHConfig, CameraConfig
from simple_raytracer_tpu.scene.catalog import CATALOG
from simple_raytracer_tpu.accel.prepared import prepare
from simple_raytracer_tpu.accel import traverse
from simple_raytracer_tpu.kernels import tiled, tiled_t
from simple_raytracer_tpu.ops.camera import primary_rays_tiled

W = int(sys.argv[1]) if len(sys.argv) > 1 else 300
H = int(sys.argv[2]) if len(sys.argv) > 2 else 200
STILE = 256
angle = float(os.environ.get("SRT_PROF_ANGLE", "180"))

sm, view, light_np = CATALOG["complex"]("/root/reference", angle,
                                        bake_view=False)
cfg = default_config().replace(mode="tiled", bvh=BVHConfig(split="sah"),
                               camera=CameraConfig(width=W, height=H),
                               tile_px=16)
prep = prepare(sm.build(), cfg)
light = jnp.asarray(light_np, jnp.float32)
o, d, _tx, _ty = primary_rays_tiled(W, H, cfg.tile_px, cfg.camera.focal,
                                    cfg.camera.normalize_dirs,
                                    view_matrix=jnp.asarray(view, jnp.float32))
o, d = o.reshape(-1, 3), d.reshape(-1, 3)

print(f"tris={prep.scene.verts.shape[0]} rays={o.shape[0]}", flush=True)
t, idx = traverse.bvh_hits(prep, o, d, cfg.mt_eps)
t = np.asarray(t)
hitm = np.isfinite(t)
print(f"hit rays: {hitm.sum()} / {t.size}", flush=True)

point = np.where(hitm[:, None], np.asarray(o) + t[:, None] * np.asarray(d),
                 0.0)
# same-tile miss repair as tiled_shadow_fn
R0 = point.shape[0]
padn = (-R0) % STILE
if padn:
    point = np.concatenate([point, np.zeros((padn, 3), point.dtype)], 0)
    hitm = np.concatenate([hitm, np.zeros(padn, bool)])
nt = point.shape[0] // STILE
p3 = point.reshape(nt, STILE, 3)
h2 = hitm.reshape(nt, STILE)
first = np.argmax(h2, axis=1)
fill = p3[np.arange(nt), first][:, None, :]
p3 = np.where(h2[..., None], p3, fill)
any_hit = h2.any(axis=1)

L = np.asarray(light, np.float32)
dirs = L[None, None] - p3                                # [nt, STILE, 3]

# --- production interval cull (window granularity, WB_AH) -------------------
wb = tiled_t.WINDOW_BLOCKS_AH
bmin = np.asarray(prep.block_min)
bmax = np.asarray(prep.block_max)
NB = bmin.shape[0]
plan = np.asarray(tiled_t.cull_occl(
    prep, jnp.asarray(p3.reshape(-1, 3)), jnp.asarray(dirs.reshape(-1, 3)),
    STILE, cfg.cull_maxv))
use_list = plan[:, 3] == 1
cnt = np.where(use_list, plan[:, 2], plan[:, 1])
cnt = np.where(any_hit, cnt, 0)

# --- exact oracle: any RAY of the tile intersects the window AABB ----------
nw = (NB + wb - 1) // wb
wmin = bmin.reshape(-1, wb, 3)[:nw].min(1) if NB % wb == 0 else None
wmin = bmin[:nw * wb].reshape(nw, wb, 3).min(1)
wmax = bmax[:nw * wb].reshape(nw, wb, 3).max(1)

exact_mask = np.zeros((nt, nw), bool)
CH = 16                                                 # tile chunks
for t0 in range(0, nt, CH):
    te = min(t0 + CH, nt)
    oo = p3[t0:te, :, None, :]                          # [c, S, 1, 3]
    dd = dirs[t0:te, :, None, :]
    inv = np.where(np.abs(dd) > 1e-30, 1.0 / dd, np.inf)
    t1 = (wmin[None, None] - oo) * inv                  # [c, S, nw, 3]
    t2 = (wmax[None, None] - oo) * inv
    tlo = np.minimum(t1, t2)
    thi = np.maximum(t1, t2)
    # axes with dd == 0: inside-slab iff o within bounds
    par = np.abs(dd) <= 1e-30
    inside = (oo >= wmin[None, None]) & (oo <= wmax[None, None])
    tlo = np.where(par, np.where(inside, -np.inf, np.inf), tlo)
    thi = np.where(par, np.where(inside, np.inf, -np.inf), thi)
    enter = np.maximum(tlo.max(-1), 0.0)                # t >= 0, no max-t
    exit_ = thi.min(-1)
    vis = (exit_ >= enter) & np.isfinite(enter)         # [c, S, nw]
    exact_mask[t0:te] = vis.any(axis=1)
exact_mask &= any_hit[:, None]
exact_cnt = exact_mask.sum(-1)

# --- hourglass per-tile test: p(t) = (1-t)·obox + t·qbox, q = o + d --------
# Two branches (t<=1 / t>=1; the no-max-t quirk keeps rays alive past the
# light).  Per axis the p-range bounds are the lines f1 = olo + t(qlo-olo)
# ... no: branch A (t<=1): [olo,ohi] -> [qlo,qhi] endpoints; min p(t) =
# (1-t)olo + t qlo, max = (1-t)ohi + t qhi.  Branch B (t>=1): min =
# (1-t)ohi + t qlo, max = (1-t)olo + t qhi  (1-t flips sign).
q3 = p3 + dirs
olo, ohi = p3.min(1), p3.max(1)                          # [nt, 3]
qlo, qhi = q3.min(1), q3.max(1)


def branch_feasible(lo0, lo1, hi0, hi1, tmin, tmax):
    """Feasible t-interval of {t in [tmin,tmax]: forall axes
    lo(t) <= bhi and hi(t) >= blo} with lo(t) = lo0 + t*(lo1-lo0) etc.
    Returns per-(tile, window) boolean.  lo0/lo1/hi0/hi1: [nt, 3]."""
    ta = np.full((nt, nw), tmin, np.float64)
    tb = np.full((nt, nw), tmax, np.float64)
    for ax in range(3):
        for (c0, c1, bnd, sense) in (
                (lo0[:, ax], lo1[:, ax], wmax[:, ax], "le"),
                (hi0[:, ax], hi1[:, ax], wmin[:, ax], "ge")):
            # c0 + t*(c1-c0) <= bnd  (or >=)
            slope = (c1 - c0)[:, None]                  # [nt, 1]
            off = bnd[None, :] - c0[:, None]            # [nt, nw]
            if sense == "ge":
                slope, off = -slope, -off
            # slope*t <= off
            with np.errstate(divide="ignore", invalid="ignore"):
                thr = off / slope
            pos = slope > 0
            neg = slope < 0
            zero_ok = (np.abs(slope) <= 0) & (off >= 0)
            tb = np.where(pos, np.minimum(tb, thr), tb)
            ta = np.where(neg, np.maximum(ta, thr), ta)
            infeas = (np.abs(slope) <= 0) & ~zero_ok
            ta = np.where(infeas, np.inf, ta)
    return tb >= ta


visA = branch_feasible(olo, qlo, ohi, qhi, 0.0, 1.0)
visB = branch_feasible(ohi, qlo, olo, qhi, 1.0, 1e30)
hour_cnt = np.where(any_hit, (visA | visB).sum(-1), 0)

m = any_hit & (cnt > 0)
print(f"tiles: {nt} ({m.sum()} active)")
print(f"interval windows/tile: mean {cnt[m].mean():.1f} "
      f"p50 {np.percentile(cnt[m], 50):.0f} p90 {np.percentile(cnt[m], 90):.0f} "
      f"max {cnt[m].max()}")
print(f"exact    windows/tile: mean {exact_cnt[m].mean():.1f} "
      f"p50 {np.percentile(exact_cnt[m], 50):.0f} "
      f"p90 {np.percentile(exact_cnt[m], 90):.0f} max {exact_cnt[m].max()}")
print(f"hourglass windows/tile: mean {hour_cnt[m].mean():.1f} "
      f"p50 {np.percentile(hour_cnt[m], 50):.0f} "
      f"p90 {np.percentile(hour_cnt[m], 90):.0f} max {hour_cnt[m].max()}")
print(f"inflation: interval {cnt[m].sum() / max(exact_cnt[m].sum(), 1):.2f}x"
      f"  hourglass {hour_cnt[m].sum() / max(exact_cnt[m].sum(), 1):.2f}x")
unsound = (exact_mask & ~(visA | visB) & any_hit[:, None]).sum()
print(f"hourglass soundness: {unsound} exact-needed windows missed "
      f"(MUST be 0)")
