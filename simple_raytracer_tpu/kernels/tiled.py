"""Tiled Pallas renderer: MXU Möller–Trumbore over culled triangle blocks.

The TPU performance path.  Design (SURVEY.md §7, DESIGN.md):

* **MT on the MXU.**  All four Möller–Trumbore scalars for a (ray, triangle)
  pair are one contraction of ray features F[r,:] = [d, o×d, o, 1] with a
  per-triangle Gram matrix (ops/intersect.py:pack_mt_gram).  A ray tile
  (TILE_R rays) × triangle block (B tris) intersection is then a single
  [TILE_R,16] @ [16,4B] matmul — the hot loop lives on the systolic array
  instead of the VPU, replacing the reference's scalar kernel
  (simple_raytracer.cpp:42-75).
* **Tile culling instead of per-ray BVH walks.**  Per-ray pointer chasing
  (simple_raytracer.cpp:296-317) is hostile to a lockstep SIMD machine.
  Triangles are BVH-reordered so consecutive triangles are spatially coherent
  (accel/bvh.py:triangle_blocks); each RAY TILE (2D pixel tile) culls blocks
  with a conservative interval slab test (tile ray bounds × block AABB).
* **Two granularities: cull blocks, fetch pages.**  Triangles are grouped
  into fine CULL BLOCKS (``block_size``=32, AABB each — tight visibility:
  measured ~1/3 the visible triangles of 128-tri blocks) and into coarser
  PAGES (``page_tris``=128 consecutive triangles) that are the DMA/matmul
  unit: a page is one CONTIGUOUS `pltpu.make_async_copy` descriptor and one
  epilogue slice.  A page is fetched iff ANY of its member blocks is
  visible.  Covering invisible member blocks is harmless by construction —
  culling is conservative, so an invisible block can never produce a valid
  hit for this tile's rays; extra tested columns only waste matmul work.
  (Round-1 layouts that fetched per fine block serialized the scalar core
  on descriptor issue: 4x the descriptors => 5x the runtime, DESIGN.md.)
  Tiles whose visible-page set fits ``cull_maxv`` walk an EXACT compacted
  page list ordered front-to-back (the canonical scalar-prefetch
  block-sparse pattern — the table lives in SMEM); heavier tiles (rare:
  whole-object silhouette tiles) fall back to stepping the covering
  contiguous page range.  Manual HBM→SMEM id DMA was tried and faulted
  under Mosaic; scalar prefetch is the supported path.
* **Super-steps + double-buffered DMA.**  Each super-step fetches KP pages
  (KP descriptors, each contiguous) and runs ONE
  [TILE_R,16]@[16,KP*4*page_tris] contraction, overlapping the next
  super-step's fetches with the current matmul; cross-lane reductions run
  once per super-step.  SRT_TILED_SYNC=1 disables the overlap (debug).
* Misses return t=+inf / idx=-1, matching ops/intersect.py conventions.

Falls back to interpret mode off-TPU so the same code is CPU-testable.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..ops import intersect as isect
from ..render import integrator
from ..utils import pad_rays

F_DIM = 16          # ray feature rows, padded 10 -> 16 (f32 sublane tile 8)

# Debug escape hatch: SRT_TILED_SYNC=1 disables the double-buffered DMA
# overlap (each block fetch completes before compute starts).
_SYNC_DMA = bool(_os.environ.get("SRT_TILED_SYNC"))
# Perf probe: SRT_TILED_NO_BREAK=1 drops the front-to-back early-termination
# test (a cross-lane reduction per loop iteration) to measure its cost.
_NO_BREAK = bool(_os.environ.get("SRT_TILED_NO_BREAK"))
# Perf probe: SRT_TILED_ABLATE=dma|matmul strips the nearest kernel to just
# the page DMAs (dma) or DMA+contraction (matmul) to decompose per-super-step
# cost on hardware.  WRONG RESULTS — measurement only.
_ABLATE = _os.environ.get("SRT_TILED_ABLATE", "")
# MXU precision for the MT contraction (HIGHEST=safest; "tri" = hand-rolled
# 3-pass bf16, sublane kernel only — Mosaic rejects Precision.HIGH; unknown
# values fall back to HIGHEST for this ray-major kernel).
_PRECISION = {"default": jax.lax.Precision.DEFAULT,
              "highest": jax.lax.Precision.HIGHEST}.get(
    _os.environ.get("SRT_MT_PRECISION", "highest").lower(),
    jax.lax.Precision.HIGHEST)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Host/jnp-side packing
# ---------------------------------------------------------------------------

def pack_gram_blocks(verts_cart: jnp.ndarray, page_tris: int) -> jnp.ndarray:
    """[T,3,3] (T a multiple of ``page_tris``) -> Gram pages
    [NP, F_DIM, 4*page_tris] with page-level scalar grouping
    det | u_num | v_num | t_num, each ``page_tris`` wide.
    (accel/prepared.py:pack_pages_np is the host-numpy twin used at prepare
    time; this jnp version serves ad-hoc use/tests.)"""
    G = isect.pack_mt_gram(verts_cart)                  # [T, 10, 4]
    T = G.shape[0]
    NP_ = T // page_tris
    Gp = G.reshape(NP_, page_tris, 10, 4).transpose(0, 2, 3, 1)
    pad = jnp.zeros((NP_, F_DIM - 10, 4 * page_tris), G.dtype)
    return jnp.concatenate(
        [Gp.reshape(NP_, 10, 4 * page_tris), pad], axis=1)


def tile_permutation(width: int, height: int, tile_px: int):
    """Permutation mapping row-major flat pixel order -> 2D-tile-major order.

    Square tiles give far tighter per-tile direction AABBs than row slivers
    (a 256-pixel run of one row spans 13% of a 1080p image's width; a 16x16
    tile spans 0.8%), which multiplies the block-cull rate.  Returns
    (perm, inv) with perm/inv int32 [W*H]: tiled[i] = flat[perm[i]].
    Handles non-multiple sizes by padding tile edges with clamped pixels.
    """
    import numpy as np
    ty = -(-height // tile_px)
    tx = -(-width // tile_px)
    yy = np.minimum(np.arange(ty * tile_px), height - 1)
    xx = np.minimum(np.arange(tx * tile_px), width - 1)
    Y = yy.reshape(ty, tile_px)
    X = xx.reshape(tx, tile_px)
    # [ty, tx, tile_px, tile_px] pixel coordinates
    rows = Y[:, None, :, None]
    cols = X[None, :, None, :]
    perm = (rows * width + cols).reshape(-1).astype(np.int32)
    inv = np.full(width * height, -1, np.int64)
    # later writes win; duplicates (clamped pads) map to the same pixel
    inv[perm] = np.arange(perm.size)
    return perm, inv.astype(np.int32)


def ray_tile_features(o: jnp.ndarray, d: jnp.ndarray, tile: int):
    """Flat rays [R,3] -> (F [n_tiles, tile, F_DIM], n_tiles, R).  Pads R up
    with the last ray (harmless duplicate work)."""
    o, d, R = pad_rays(o, d, tile)
    n = o.shape[0] // tile
    F = isect.ray_features(o, d)                         # [Rp, 10]
    F = jnp.concatenate(
        [F, jnp.zeros((F.shape[0], F_DIM - 10), F.dtype)], axis=-1)
    return F.reshape(n, tile, F_DIM), n, R


def cull_blocks(o: jnp.ndarray, d: jnp.ndarray, tile: int,
                block_min: jnp.ndarray, block_max: jnp.ndarray,
                block_obj=None, excl=None, hourglass: bool = False):
    """Conservative per-(ray tile, triangle block) visibility -> block RANGE.

    Interval-arithmetic slab test: each tile is abstracted by the AABBs of its
    ray origins and directions; a block can be skipped only if NO ray with
    o in [omin,omax], d in [dmin,dmax], t >= 0 can touch the block AABB.
    Per axis the reachable-t set is an interval (or everything, when the
    direction interval spans 0 or the offset interval spans 0); the block is
    visible iff the three axis intervals intersect.

    Returns (lo [n_tiles] i32, cnt [n_tiles] i32): the contiguous range
    [lo, lo+cnt) covering every visible block (cnt 0 when none).
    """
    vis_fn = _visibility_hourglass if hourglass else _visibility
    visible, _, n = vis_fn(o, d, tile, block_min, block_max,
                           block_obj, excl)
    NB = visible.shape[1]
    idx = jnp.arange(NB, dtype=jnp.int32)
    first = jnp.min(jnp.where(visible, idx, NB), axis=-1)     # [n]
    last = jnp.max(jnp.where(visible, idx, -1), axis=-1)
    cnt = jnp.maximum(last - first + 1, 0).astype(jnp.int32)
    lo = jnp.where(cnt > 0, first, 0).astype(jnp.int32)
    return lo, cnt


def cull_blocks_lists(o: jnp.ndarray, d: jnp.ndarray, tile: int,
                      block_min: jnp.ndarray, block_max: jnp.ndarray,
                      maxv: int, block: int, page_tris: int,
                      block_obj=None, excl=None, plan_w: int = None,
                      groups: int = 1, hourglass: bool = False,
                      apex: bool = False, apex_rev: bool = False,
                      ab=None):
    """Page-list culling with range fallback.  ``apex``: the rays share ONE
    origin (primary rays) — visibility is additionally tightened by the
    projective pixel-space test (:func:`_visibility_px`, measured 7.3x
    fewer windows/tile on the bench scene).  ``apex_rev``: the rays all
    END at one point (hard-shadow rays: o + d is the light for every ray)
    — same projective test from the LIGHT as apex, as the union of the
    two cones through it (toward the points, and beyond the light: the
    reference's shadow test has no max-t clipping, so occluders past the
    light still count — simple_raytracer.cpp:321-342).

    Conservative visibility is evaluated at fine BLOCK granularity
    (:func:`_visibility`) and reduced to PAGES (``page_tris``/``block``
    consecutive blocks): a page is fetched iff any member block is visible,
    and its front-to-back bound is the min member entry-t.  Tiles whose
    visible-page count fits ``maxv`` get an EXACT compacted page list (ids
    ride into SMEM via scalar prefetch); heavier tiles fall back to the
    covering contiguous page range.

    Returns the fused plan table [n, PLAN_W] i32 with aux columns
    (lo_page, range_pages, page_cnt, use_list, 0...) then packed entries
    ``page_id | bound16 << 16``, bound-ascending.

    With ``groups`` G > 1 the tile's rays are additionally split into G
    contiguous SUB-GROUPS (tile/G rays each) and every list entry gets a
    G-bit sub-group visibility mask, appended to the plan as packed words
    (8 entries x 4 bits per i32; requires maxv % 8 == 0).  The kernel can
    then skip a page for the sub-groups whose own (tighter) ray bounds
    cannot reach it — sub-tile culling that still shares the tile's plan
    and window DMA.  Masks are evaluated at PAGE granularity (page AABB =
    union of member block AABBs), which adds ~one tile-level cull pass of
    work, NOT a G-times-finer full cull.  A cleared bit is sound: every
    ray belongs to exactly one sub-group and the per-sub-group interval
    test is conservative for its rays.
    """
    # "and" (default): px refines the interval test.  "only": px REPLACES
    # it — the plans are equivalent (cnt 2.67 vs 2.59 on the bench frame,
    # same use_list/bounds) and the isolated cull is ~6 ms cheaper, but
    # the full-frame XLA schedule degrades 39 -> 145 ms/frame with the
    # interval ops absent (reproduced 4x; plan bytes near-identical, so
    # it is a scheduling pathology around the pallas calls, not data).
    # Kept as a measurement knob until that is understood.
    from ..config import KernelConfig
    _PX_MODE = _os.environ.get("SRT_PX_MODE", KernelConfig().px_mode)
    # analytic bounds come in two flavors: primary apex tiles
    # (tiled_t.analytic_tile_bounds) and hit-point-box shadow tiles
    # (tiled_t.analytic_shadow_bounds, tagged "rev")
    ab_rev = ab if (ab is not None and ab.get("rev")) else None
    if ab is not None and not (apex or (apex_rev and ab_rev is not None)):
        ab = None
    if apex and _PX_MODE == "only":
        visible_b, tlo_b, n = _visibility_px(o, d, tile, block_min,
                                             block_max, block_obj, excl,
                                             pxb=ab)
    elif hourglass:
        visible_b, tlo_b, n = _visibility_hourglass(o, d, tile, block_min,
                                                    block_max, block_obj,
                                                    excl)
    else:
        visible_b, tlo_b, n = _visibility(o, d, tile, block_min,
                                          block_max, block_obj, excl,
                                          bounds=ab)
    if apex and _PX_MODE == "and":
        visible_b = visible_b & _visibility_px(o, d, tile, block_min,
                                               block_max, pxb=ab)[0]
    if apex_rev:
        # REFINEMENT only: the sign-free line test cannot exclude blocks
        # BEHIND the shadow-ray origins (t < 0 on the line through the
        # light — e.g. the occluder mesh itself for points on it), so the
        # interval/hourglass test above keeps the t >= 0 bound and px_rev
        # adds the angular tightening around the light.
        visible_b = visible_b & _visibility_px_rev(
            o, d, tile, block_min, block_max, pxb=ab_rev)[0]
    # LOAD-BEARING barrier: the [n, NB] mask/bound are each consumed by
    # ~6 downstream reduces (page-any, tlo min, page_cnt, first/last,
    # sort key); XLA treats the producing compare chains as
    # cheap-to-recompute and would RE-FUSE them into every consumer —
    # measured 5x on the occlusion cull (9.5 -> 49.3 ms/frame) when the
    # px refinement joined the chain.  Materialize once.
    visible_b, tlo_b = jax.lax.optimization_barrier((visible_b, tlo_b))
    NB = visible_b.shape[1]
    BPP = page_tris // block            # blocks per page (exact: see prepare)
    NP_ = NB // BPP
    INF = jnp.float32(jnp.inf)
    visible = visible_b.reshape(n, NP_, BPP).any(-1)              # [n, NP]
    tlo = jnp.min(jnp.where(visible_b, tlo_b, INF).reshape(n, NP_, BPP),
                  axis=-1)
    # plan entries pack the page id into 16 bits
    assert NP_ <= 65536, (
        f"{NP_} Gram pages exceed the 16-bit plan-entry id space; "
        "use range culling (cull_maxv=0) or larger page_tris")
    idx = jnp.arange(NP_, dtype=jnp.int32)
    first = jnp.min(jnp.where(visible, idx, NP_), axis=-1)
    last = jnp.max(jnp.where(visible, idx, -1), axis=-1)
    range_cnt = jnp.maximum(last - first + 1, 0).astype(jnp.int32)
    lo = jnp.where(range_cnt > 0, first, 0).astype(jnp.int32)

    pw = plan_w or PLAN_W
    mv_cap = pw - PLAN_AUX
    page_cnt = visible.sum(axis=-1).astype(jnp.int32)
    maxv = min(maxv, mv_cap)
    use_list = (page_cnt <= maxv).astype(jnp.int32)

    # order entries front-to-back: bucket each page by its entry bound
    # (relative to the tile's range), and pack the truncated 16-bit float
    # bound so the kernel can stop once every ray's best hit beats the next
    # entry's bound
    tmin = jnp.min(jnp.where(visible, tlo, INF), axis=-1)         # [n]
    tmax = jnp.max(jnp.where(visible, tlo, -INF), axis=-1)
    tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    qscale = jnp.maximum(tmax - tmin, 1e-20) / T_BUCKETS
    qb = jnp.clip(((tlo - tmin[:, None]) / qscale[:, None]).astype(jnp.int32),
                  0, T_BUCKETS - 1)
    # the packed bound is the BUCKET FLOOR, not the entry's own t: within a
    # bucket entries are in page-index order, so only the floor lower-bounds
    # every later entry (bucket-ascending => floors non-decreasing).  The
    # 16-bit truncation rounds down, keeping it conservative.
    floor_t = jnp.maximum(tmin[:, None] + qb.astype(jnp.float32)
                          * qscale[:, None], 0.0)
    bound16 = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(floor_t, jnp.int32), 16)

    # bucket-ordered compaction via ONE top_k, NO rank pass, NO gather: the
    # plan entry ``(bound16 << 16) | page_id`` IS a valid sort key —
    # non-negative IEEE floats order as ints, so bound16 is monotone in
    # floor_t (and < 0x8000 for every finite floor_t: exponent <= 254
    # keeps the top bit clear), and the id low bits make keys unique with
    # idx-ascending tie order inside a bucket.  top_k of the negated key
    # returns the front-to-back entry list directly.  (History: a scatter
    # compaction measured 13.5 ms/frame — TPU scatters serialize; the
    # two-phase bucket-rank + top_k(-slot) + take_along_axis replacement
    # still spent ~16 [n, NP] ranking sweeps and a [n, 248] gather.)
    # Invisible pages key to +max and land past every real entry.
    key = jnp.where(visible, (bound16 << 16) | idx[None, :],
                    jnp.int32(0x7FFFFFFF))
    k = min(mv_cap, NP_)
    negv, _ = jax.lax.top_k(-key, k)           # ascending (bound16, idx)
    entries = -negv
    if k < mv_cap:
        entries = jnp.concatenate(
            [entries, jnp.zeros((n, mv_cap - k), jnp.int32)], axis=-1)
    z = jnp.zeros_like(lo)
    aux = jnp.stack(
        [lo, range_cnt, jnp.minimum(page_cnt, maxv), use_list,
         z, z, z, z], axis=-1)
    if groups <= 1:
        return jnp.concatenate([aux, entries], axis=-1)   # [n, PLAN_W]

    assert 2 <= groups <= 4 and tile % groups == 0, (groups, tile)
    assert mv_cap % 8 == 0, mv_cap
    # page AABBs (union of member blocks) tested against each sub-group's
    # own ray bounds -> [n*G, NP] visibility, reduced to a 4-bit mask/page
    page_min = block_min.reshape(NP_, BPP, 3).min(axis=1)
    page_max = block_max.reshape(NP_, BPP, 3).max(axis=1)
    op, dp, _ = pad_rays(o, d, tile)     # pad to FULL tiles first, so the
    # sub-group pass sees exactly n*G groups (pad_rays at tile/G alone
    # would under-pad a ragged tail tile)
    vis_g, _, _ = vis_fn(op, dp, tile // groups, page_min, page_max)
    vis_g = vis_g.reshape(n, groups, NP_)
    mask4 = jnp.zeros((n, NP_), jnp.int32)
    for g in range(groups):
        mask4 = mask4 | (vis_g[:, g].astype(jnp.int32) << g)
    maskk = jnp.take_along_axis(mask4, entries[:, :k] & 0xFFFF, axis=1)
    if k < mv_cap:
        maskk = jnp.concatenate(
            [maskk, jnp.zeros((n, mv_cap - k), jnp.int32)], axis=-1)
    m8 = maskk.reshape(n, mv_cap // 8, 8)
    maskw = jnp.zeros((n, mv_cap // 8), jnp.int32)
    for e in range(8):
        maskw = maskw | (m8[:, :, e] << (4 * e))
    return jnp.concatenate([aux, entries, maskw], axis=-1)


def _visibility_hourglass(o, d, tile, block_min, block_max,
                          block_obj=None, excl=None):
    """Apex-aware conservative (tile, block) visibility for SHADOW rays.

    Shadow rays from one tile all pass through (near) the light:
    p(t) = o + t*d = (1-t)*o + t*q with q = o + d, so the true swept
    volume PINCHES at t=1 while the independent-interval test
    (:func:`_visibility`) keeps growing — measured 9.9x more windows per
    shadow tile than a per-ray oracle needs on the complex scene
    (scripts/shadow_cull_stats.py); this test gets within 1.4x.

    Per axis, p(t) is bounded by two LINES between the tile's origin box
    [olo, ohi] and its endpoint box [qlo, qhi] (q per ray = o + d; for
    S folded light samples the box covers all of them).  Two branches
    (the reference's no-max-t quirk keeps rays alive past the light):
      t <= 1:  p in [olo + t(qlo-olo), ohi + t(qhi-ohi)]
      t >= 1:  p in [ohi + t(qlo-ohi), olo + t(qhi-olo)]   (1-t flips)
    Each "range intersects block slab" condition is linear in t, so a
    branch's feasible t-set is one interval; the block is visible iff
    either branch is non-empty.  f32 division rounding is absorbed by a
    relative margin on every threshold (widening only -> conservative).

    Same return contract as _visibility: (visible [n, NB], entry-t lower
    bound [n, NB] (0 when spanning), n).
    """
    o, d, _ = pad_rays(o, d, tile)
    n = o.shape[0] // tile
    ot = o.reshape(n, tile, 3)
    qt = ot + d.reshape(n, tile, 3)
    olo, ohi = ot.min(1), ot.max(1)                      # [n, 3]
    qlo, qhi = qt.min(1), qt.max(1)
    INF = jnp.float32(jnp.inf)
    EPS = jnp.float32(1e-5)

    def branch(lo0, lo1, hi0, hi1, tmin, tmax):
        """Feasible-t interval of {forall axes: lo(t) <= bhi, hi(t) >= blo}
        with lo(t) = lo0 + t*(lo1 - lo0) etc.  Streams per (axis,
        constraint) keeping [n, NB] running bounds."""
        ta = jnp.full((n, 1), tmin, jnp.float32)
        tb = jnp.full((n, 1), tmax, jnp.float32)
        feas = jnp.bool_(True)
        for ax in range(3):
            for c0t, c1t, bnd, ge in (
                    (lo0[:, ax], lo1[:, ax], block_max[None, :, ax], False),
                    (hi0[:, ax], hi1[:, ax], block_min[None, :, ax], True)):
                s = (c1t - c0t)[:, None]                 # [n, 1]
                r = bnd - c0t[:, None]                   # [n, NB]
                if ge:
                    s, r = -s, -r
                # s*t <= r ; widen thresholds against f32 rounding
                thr = r / jnp.where(s == 0.0, 1.0, s)
                mgn = EPS * (jnp.abs(thr) + 1.0)
                tb = jnp.where(s > 0.0, jnp.minimum(tb, thr + mgn), tb)
                ta = jnp.where(s < 0.0, jnp.maximum(ta, thr - mgn), ta)
                zf = (s == 0.0) & (r < -EPS * (jnp.abs(bnd) + 1.0))
                feas = feas & ~zf
        return feas & (tb >= ta), ta

    visA, taA = branch(olo, qlo, ohi, qhi, 0.0, 1.0)
    visB, taB = branch(ohi, qlo, olo, qhi, 1.0, 3.4e38)
    visible = visA | visB
    t_lo = jnp.minimum(jnp.where(visA, taA, INF),
                       jnp.where(visB, taB, INF))
    t_lo = jnp.where(visible, jnp.maximum(t_lo, 0.0), INF)
    # unreachable blocks keep t_lo=inf; cull_blocks_lists masks by
    # `visible` before using t_lo, matching _visibility's contract
    t_lo = jnp.where(jnp.isfinite(t_lo), t_lo, 0.0)
    if block_obj is not None and excl is not None:
        visible = visible & (block_obj[None, :] != excl[:, None])
    return visible, t_lo, n


def _visibility(o, d, tile, block_min, block_max,
                block_obj=None, excl=None, bounds=None):
    """Shared conservative (tile, block) visibility mask [n, NB].

    ``excl`` [n] i32 (with ``block_obj`` [NB] i32, see
    PreparedScene.block_obj) drops blocks whose every triangle belongs to
    the tile's excluded object — the shadow-time self-object cull: the
    reference skips the hit object's OWN triangles entirely
    (simple_raytracer.cpp:331), so when every shadow ray of a tile leaves
    the same object, that object's pure blocks can never occlude the tile
    and need not be fetched/tested at all.  -2 (or any id matching no
    block) disables masking for that tile; impure blocks carry -9.
    """
    if bounds is not None:
        # analytic per-tile bounds (tiled_t.analytic_tile_bounds): the
        # O(R) ray reductions collapse to O(tiles) corner math
        omin, omax = bounds["omin"], bounds["omax"]
        dmin, dmax = bounds["dmin"], bounds["dmax"]
        n = omin.shape[0]
    else:
        o, d, _ = pad_rays(o, d, tile)
        n = o.shape[0] // tile
        ot = o.reshape(n, tile, 3)
        dt = d.reshape(n, tile, 3)
        omin, omax = ot.min(1), ot.max(1)
        dmin, dmax = dt.min(1), dt.max(1)
    INF = jnp.float32(jnp.inf)
    # processed PER AXIS with [n, NB] running intervals: the axis-stacked
    # form materializes [4, n, NB, 3] f32 intermediates — at 8100 tiles x
    # 2171 blocks (bunny 1080p, 16px tiles) that is ~850 MB of HBM traffic
    # per temporary and the cull measured 47 ms/frame; the streamed form
    # keeps temporaries 12x smaller (identical math, bit-identical masks)
    t_lo = None
    t_hi = None
    for ax in range(3):
        lo_i = block_min[None, :, ax] - omax[:, None, ax]      # [n, NB]
        hi_i = block_max[None, :, ax] - omin[:, None, ax]
        dn = dmin[:, None, ax]
        dx = dmax[:, None, ax]
        c0 = _safe_div(lo_i, dn)
        c1 = _safe_div(lo_i, dx)
        c2 = _safe_div(hi_i, dn)
        c3 = _safe_div(hi_i, dx)
        tmin_ax = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
        tmax_ax = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
        spans = ((dn <= 0.0) & (dx >= 0.0)) | ((lo_i <= 0.0) & (hi_i >= 0.0))
        tmin_ax = jnp.where(spans, 0.0, jnp.maximum(tmin_ax, 0.0))
        tmax_ax = jnp.where(spans, INF, tmax_ax)
        t_lo = tmin_ax if t_lo is None else jnp.maximum(t_lo, tmin_ax)
        t_hi = tmax_ax if t_hi is None else jnp.minimum(t_hi, tmax_ax)
    # t_lo == +inf means the entry time is unbounded (an axis whose direction
    # interval is {0} with a strictly-positive offset interval produces
    # all-inf slab candidates): the block is genuinely unreachable.  Without
    # this guard inf >= inf would mark it visible and poison the tile's
    # front-to-back quantization (qscale=inf -> floor_t=NaN -> bogus early
    # break in the kernel).
    visible = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < jnp.inf)
    if block_obj is not None and excl is not None:
        visible = visible & (block_obj[None, :] != excl[:, None])
    return visible, jnp.maximum(t_lo, 0.0), n


def _px_frame(d):
    """Orthonormal (s, v, w) with w ~ the bundle's mean direction: the
    projection frame for :func:`_visibility_px`.  Any frame works (the test
    compares projections of the SAME rays and blocks), so robustness beats
    choice: s is built against the coordinate axis least aligned with w."""
    w = d.sum(0)
    nw = jnp.sqrt((w * w).sum())
    w = jnp.where(nw > 1e-20, w / jnp.maximum(nw, 1e-20),
                  jnp.array([0.0, 0.0, 1.0], d.dtype))
    e = (jnp.arange(3) == jnp.argmin(jnp.abs(w))).astype(d.dtype)
    s = jnp.cross(w, e)
    s = s / jnp.sqrt((s * s).sum())
    return s, jnp.cross(w, s), w


def _px_block_corners(block_min, block_max, apex):
    """Block AABB corners relative to the apex [NB, 8, 3] + the empty mask
    (the inverted-box convention marks pad/empty blocks)."""
    bits = ((jnp.arange(8)[:, None] >> jnp.arange(3)[None, :]) & 1) == 1
    corn = jnp.where(bits[None], block_max[:, None], block_min[:, None])
    empty = (block_min > block_max).any(axis=-1)
    return corn - apex, empty


def _visibility_px(o, d, tile, block_min, block_max,
                   block_obj=None, excl=None, pxb=None):
    """Projective (pixel-space) conservative (tile, block) visibility for
    COMMON-APEX ray bundles — primary rays, where every ray of the frame
    leaves one camera origin.  Returns (visible [n, NB], tlo [n, NB], n) —
    the same contract as :func:`_visibility`, which it REPLACES for apex
    tiles (running both doubles the cull's [n, NB] pass cost for nothing:
    measured px 6.6 ms vs interval 6.3 ms alone, and px & interval == px
    on the bench scene).

    A ray o0 + t*dir intersects a point x iff x - o0 is parallel to dir,
    so in any frame (s, v, w) with dir·w > 0 the ray's projective coords
    (dir·s/dir·w, dir·v/dir·w) must fall inside the block AABB's projected
    rect — the classic rasterizer frustum cull, EXACT per (tile rect, box)
    for boxes fully in front (the per-axis slab interval test treats the
    tile's direction box per axis and measured 7.3x looser on the bench
    scene: 18.8 vs 2.59 windows/tile, scripts/pxcull_proto.py; the
    per-ray oracle union is 1.95).

    The entry bound is projective too: every hit satisfies
    t = ((x-o0)·w)/(dir·w), so t >= min_corners(c·w) / max_tile(dir·w),
    both strictly positive for in-front blocks and in-cone rays.

    Conservative handling: rays with dir·w <= eps (outside the <90 deg
    projection cone) give their tile an unbounded rect and a zero entry
    bound; blocks with SOME corners behind the apex plane get an unbounded
    rect; blocks with ALL corners behind it are invisible to in-cone rays
    (t would be negative) and visible-unbounded to tiles containing
    out-of-cone rays; empty/inverted (pad) blocks are invisible; ``excl``
    culls pure self-object blocks exactly like :func:`_visibility`.
    Block rects are expanded by 1e-4*(1+|u|) against f32 projection
    rounding (<= half a pixel at the reference's focal range, orders
    tighter than the slack this test removes).
    """
    BIG = jnp.float32(3.0e38)
    eps = jnp.float32(1e-12)
    if pxb is not None:
        # analytic projective bounds (tiled_t.analytic_tile_bounds)
        s, v, w = pxb["s"], pxb["v"], pxb["w"]
        ru_lo, ru_hi = pxb["ru_lo"], pxb["ru_hi"]
        rv_lo, rv_hi = pxb["rv_lo"], pxb["rv_hi"]
        tile_bad, dw_hi = pxb["tile_bad"], pxb["dw_hi"]
        n = ru_lo.shape[0]
        apex = pxb["apex"]
    else:
        o, d, _ = pad_rays(o, d, tile)
        n = o.shape[0] // tile
        s, v, w = _px_frame(d)

        dw = d @ w
        bad_r = dw <= eps
        dws = jnp.maximum(dw, eps)
        ru = (d @ s) / dws
        rv = (d @ v) / dws
        ru_lo = jnp.where(bad_r, -BIG, ru).reshape(n, tile).min(1)
        ru_hi = jnp.where(bad_r, BIG, ru).reshape(n, tile).max(1)
        rv_lo = jnp.where(bad_r, -BIG, rv).reshape(n, tile).min(1)
        rv_hi = jnp.where(bad_r, BIG, rv).reshape(n, tile).max(1)
        tile_bad = bad_r.reshape(n, tile).any(1)
        dw_hi = jnp.where(bad_r, 0.0, dw).reshape(n, tile).max(1)
        apex = o[0]

    c, empty = _px_block_corners(block_min, block_max, apex)
    cw = c @ w
    front = (cw > eps).all(axis=1)                       # fully in front
    behind = (cw <= eps).all(axis=1)
    cws = jnp.maximum(cw, eps)
    cu = (c @ s) / cws
    cv = (c @ v) / cws

    def bounds(p):
        lo, hi = p.min(1), p.max(1)
        pad_lo = 1e-4 * (1.0 + jnp.abs(lo))
        pad_hi = 1e-4 * (1.0 + jnp.abs(hi))
        return (jnp.where(front, lo - pad_lo, -BIG),
                jnp.where(front, hi + pad_hi, BIG))

    bu_lo, bu_hi = bounds(cu)
    bv_lo, bv_hi = bounds(cv)
    visible = ((bu_lo[None] <= ru_hi[:, None]) &
               (bu_hi[None] >= ru_lo[:, None]) &
               (bv_lo[None] <= rv_hi[:, None]) &
               (bv_hi[None] >= rv_lo[:, None]))
    visible = visible & ~empty[None, :] & \
        ~(behind[None, :] & ~tile_bad[:, None])
    if block_obj is not None and excl is not None:
        visible = visible & (block_obj[None, :] != excl[:, None])
    # projective entry bound (0 whenever either side is unbounded: a tile
    # with ANY out-of-cone ray cannot bound t through dw_hi)
    cw_lo = jnp.where(front, cw.min(axis=1), 0.0)
    tlo = jnp.maximum(cw_lo[None, :], 0.0) / \
        jnp.maximum(dw_hi[:, None], eps)
    tlo = jnp.where(tile_bad[:, None], 0.0, tlo)
    return visible, tlo, n


def _visibility_px_rev(o, d, tile, block_min, block_max,
                       block_obj=None, excl=None, pxb=None):
    """Projective LINE-membership visibility for hard-shadow tiles: every
    ray passes through ONE shared light L = o[i] + d[i].  Returns
    (visible [n, NB], tlo [n, NB], n) — same contract as
    :func:`_visibility`, which it REPLACES for shared-light shadow tiles
    (tlo is all-zero: the any-hit walk has no front-to-back break).

    Under the reference's no-max-t rule (simple_raytracer.cpp:321-342)
    occluders anywhere along the line through the point and the light
    count, so the test is on LINES through the apex L.  A line with
    direction delta has sign-free projective coords u = delta.s/delta.w
    (flipping delta flips both factors), and a block whose corners are all
    strictly on ONE side of the apex's w-plane projects to a rect in the
    same coords — so one rect-overlap test covers the point-side cone,
    the beyond-the-light cone, and the behind-the-point extension at
    once.  Blocks straddling the w-plane (they contain directions where
    the projection degenerates) and rays with |d.w| <= eps are
    conservatively visible; empty (pad) blocks and ``excl``-pure blocks
    are culled exactly like :func:`_visibility`.
    """
    BIG = jnp.float32(3.0e38)
    eps = jnp.float32(1e-12)
    if pxb is not None:
        # analytic per-tile bounds (tiled_t.analytic_shadow_bounds): the
        # O(R) projective ray reductions collapse to O(tiles) corner math
        s, v, w = pxb["s"], pxb["v"], pxb["w"]
        apex = pxb["apex"]
        ru_lo, ru_hi = pxb["ru_lo"], pxb["ru_hi"]
        rv_lo, rv_hi = pxb["rv_lo"], pxb["rv_hi"]
        n = ru_lo.shape[0]
    else:
        o, d, _ = pad_rays(o, d, tile)
        n = o.shape[0] // tile
        s, v, w = _px_frame(-d)              # frame toward the scene
        apex = o[0] + d[0]                   # the shared light (contract)

        dw = d @ w
        bad_r = jnp.abs(dw) <= eps
        dws = jnp.where(bad_r, eps, dw)
        ru = (d @ s) / dws
        rv = (d @ v) / dws
        ru_lo = jnp.where(bad_r, -BIG, ru).reshape(n, tile).min(1)
        ru_hi = jnp.where(bad_r, BIG, ru).reshape(n, tile).max(1)
        rv_lo = jnp.where(bad_r, -BIG, rv).reshape(n, tile).min(1)
        rv_hi = jnp.where(bad_r, BIG, rv).reshape(n, tile).max(1)

    c, empty = _px_block_corners(block_min, block_max, apex)
    cw = c @ w
    ok = (cw > eps).all(axis=1) | (cw < -eps).all(axis=1)
    cws = jnp.where(jnp.abs(cw) > eps, cw, eps)
    cu = (c @ s) / cws
    cv = (c @ v) / cws

    def bounds(p):
        lo, hi = p.min(1), p.max(1)
        pad_lo = 1e-4 * (1.0 + jnp.abs(lo))
        pad_hi = 1e-4 * (1.0 + jnp.abs(hi))
        return (jnp.where(ok, lo - pad_lo, -BIG),
                jnp.where(ok, hi + pad_hi, BIG))

    bu_lo, bu_hi = bounds(cu)
    bv_lo, bv_hi = bounds(cv)
    visible = ((bu_lo[None] <= ru_hi[:, None]) &
               (bu_hi[None] >= ru_lo[:, None]) &
               (bv_lo[None] <= rv_hi[:, None]) &
               (bv_hi[None] >= rv_lo[:, None]))
    visible = visible & ~empty[None, :]
    if block_obj is not None and excl is not None:
        visible = visible & (block_obj[None, :] != excl[:, None])
    return visible, jnp.zeros(visible.shape, jnp.float32), n


def _safe_div(a, b):
    """Interval endpoint division: a/0 -> sign(a)*inf, 0/0 -> 0.  (Any NaN
    that could leak from these corners is masked by the ``spans`` branch in
    cull_blocks, but keep the endpoints finite-signed anyway.)"""
    return jnp.where(b == 0.0,
                     jnp.where(a == 0.0, 0.0, jnp.sign(a) * jnp.inf),
                     a / jnp.where(b == 0.0, 1.0, b))


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _mt_occlusion(q, B, eps, extra_valid, no_max_t):
    """Division-free occlusion test for one block's quad slice.

    The any-hit kernel never needs t's VALUE — only the validity predicate —
    and every Möller–Trumbore range test can be phrased on the numerators:
    u >= 0 <=> u_num*det >= 0,  u <= 1 <=> |u_num| <= |det| (given the sign
    test), u+v <= 1 <=> |u_num + v_num| <= |det|, t in [0,1] likewise.
    Drops the [TILE_R, B] reciprocal from the shadow inner loop.
    """
    det = q[:, :B]
    u_num = q[:, B:2 * B]
    v_num = q[:, 2 * B:3 * B]
    t_num = q[:, 3 * B:]
    adet = jnp.abs(det)
    occ = (adet >= eps) & extra_valid & \
        (u_num * det >= 0.0) & (jnp.abs(u_num) <= adet) & \
        (v_num * det >= 0.0) & (jnp.abs(u_num + v_num) <= adet) & \
        (t_num * det >= 0.0)
    if not no_max_t:
        occ = occ & (jnp.abs(t_num) <= adet)      # t <= 1: stop at the light
    return occ


def _mt_epilogue(q, B, eps, extra_valid):
    """One page's quad slice [TILE_R, 4B] -> t [TILE_R, B], misses=+inf.

    Single home for the Möller–Trumbore validity rules (det eps, u/v range,
    t>=0 — simple_raytracer.cpp:57-73) shared by the nearest-hit and
    occlusion kernels.  VPU-op-minimized (ablation showed the elementwise
    epilogue, not the contraction, bounds the kernel): the four range tests
    collapse to one sign test of min(u, v, 1-u-v, t), which is exact — the
    min is >= 0 iff every term is.
    """
    det = q[:, :B]
    inv = 1.0 / det
    u = q[:, B:2 * B] * inv
    v = q[:, 2 * B:3 * B] * inv
    t = q[:, 3 * B:] * inv
    m = jnp.minimum(jnp.minimum(u, v), jnp.minimum(1.0 - (u + v), t))
    valid = (jnp.abs(det) >= eps) & (m >= 0.0)
    if extra_valid is not True:
        valid = valid & extra_valid
    return jnp.where(valid, t, jnp.inf)


PLAN_W = int(_os.environ.get("SRT_TILED_PLAN_W", "256"))
                    # plan-table width (multiple of 128: SMEM lane padding).
                    # Sized so silhouette/through-body tiles still get EXACT
                    # front-to-back lists: on the 1080p bunny the 1.4% of
                    # tiles that overflowed a 120-entry list caused 29% of
                    # all page-visits (range fallback walks the covering
                    # range with no early break).
# cols 0-7: lo_page, range_pages, page_cnt, use_list, 0, 0, 0, 0;
# cols 8..: packed PAGE entries  page_id | (bound16 << 16),
# bound-ascending, where bound16 = top 16 bits of the f32 conservative
# entry-t (IEEE ordering: for non-negative floats, bit-pattern comparison ==
# value comparison, and truncation rounds the bound DOWN, keeping the break
# conservative).
PLAN_AUX = 8
PLAN_MAXV = PLAN_W - PLAN_AUX
T_BUCKETS = 8


def _tile_plan(plan_ref, i):
    """Per-tile work plan from the fused scalar-prefetch table [n, pw]:
    page count, a k -> page-id mapping (exact list when it fit, covering
    contiguous range else), and a conservative entry-t lower bound per
    position.  Fusing aux + packed entries into one 128-multiple row costs
    nothing (SMEM lane padding) and keeps exactly one prefetch operand.
    The plan WIDTH is taken from the table's own (static) shape — big
    scenes get wider plans (see _plan_width)."""
    mv = plan_ref.shape[-1] - PLAN_AUX
    lo = plan_ref[i, 0]
    use_list = plan_ref[i, 3] == 1
    cnt = jnp.where(use_list, plan_ref[i, 2], plan_ref[i, 1])

    def entry(k):
        return plan_ref[i, PLAN_AUX + jnp.minimum(k, mv - 1)]

    def page(k):
        # clamp the list index: in range mode k can exceed maxv and both
        # sides of the select are evaluated
        return jnp.where(use_list, entry(k) & 0xFFFF, lo + k)

    def bound16(k):
        # truncated-f32 entry-t bound, comparable in INT space against the
        # high 16 bits of any non-negative f32 (IEEE ordering); valid only
        # in list mode where entries are bound-ascending
        return jax.lax.shift_right_logical(entry(k), 16)
    return cnt, page, use_list, bound16


# One super-step = one [TILE_R,16]@[16,KP*4*page_tris] contraction over KP
# pages (KP tiny matmuls would be latency-bound; KP descriptors per step,
# each CONTIGUOUS).  SUPER_COLS is fixed so different page sizes keep the
# same MXU width per step.
SUPER_COLS = int(_os.environ.get("SRT_TILED_SUPER_COLS", "2048"))


def _kp(page_tris: int) -> int:
    """Pages per super-step."""
    return max(SUPER_COLS // (4 * page_tris), 1)


def _super_dma(G_hbm, gbuf, sem_g, page, slot, j, PT):
    """Start the KP page fetches of super-step j into gbuf[slot] columns.

    Unconditional (invalid steps clamp to a valid page; culling is
    conservative, so extra real triangles cannot produce wrong hits): a
    @pl.when around every DMA serializes the scalar core."""
    KP = _kp(PT)
    np_ = G_hbm.shape[0]
    for i in range(KP):
        pltpu.make_async_copy(
            G_hbm.at[jnp.minimum(page(j * KP + i), np_ - 1)],
            gbuf.at[slot, :, pl.ds(i * 4 * PT, 4 * PT)],
            sem_g.at[slot, i]).start()


def _super_wait(G_hbm, gbuf, sem_g, page, slot, j, PT):
    KP = _kp(PT)
    np_ = G_hbm.shape[0]
    for i in range(KP):
        pltpu.make_async_copy(
            G_hbm.at[jnp.minimum(page(j * KP + i), np_ - 1)],
            gbuf.at[slot, :, pl.ds(i * 4 * PT, 4 * PT)],
            sem_g.at[slot, i]).wait()


def _nearest_kernel(page_tris: int, eps: float, plan_ref, F_ref, G_hbm,
                    t_ref, idx_ref, gbuf, sem_g):
    i = pl.program_id(0)
    PT = page_tris
    KP = _kp(PT)
    cnt, page, use_list, bound16 = _tile_plan(plan_ref, i)
    ns = (cnt + KP - 1) // KP                            # super-steps
    F = F_ref[0]                                         # [TILE_R, F_DIM]
    TILE_R = F.shape[0]

    if not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            _super_dma(G_hbm, gbuf, sem_g, page, 0, 0, PT)

    def cond(state):
        j, done, best_t, best_i = state
        return (j < ns) & ~done

    def body(state):
        j, _, best_t, best_i = state
        slot = j % 2 if not _SYNC_DMA else 0

        if _SYNC_DMA:
            _super_dma(G_hbm, gbuf, sem_g, page, 0, j, PT)
        else:
            @pl.when(j + 1 < ns)
            def _():
                _super_dma(G_hbm, gbuf, sem_g, page, (j + 1) % 2, j + 1, PT)

        _super_wait(G_hbm, gbuf, sem_g, page, slot, j, PT)
        if _ABLATE == "dma":            # measurement only: skip all compute
            best_t = jnp.minimum(best_t, gbuf[slot][:1, :1] + 1e30)
            return j + 1, jnp.bool_(False), best_t, best_i
        quad = jnp.dot(F, gbuf[slot], preferred_element_type=jnp.float32,
                       precision=_PRECISION)             # [TILE_R, KP*4PT]
        if _ABLATE == "matmul":         # measurement only: skip epilogue
            best_t = jnp.minimum(best_t, quad[:, :PT] + 1e30)
            return j + 1, jnp.bool_(False), best_t, best_i
        # EVERYTHING in the loop is elementwise: per-page epilogues fold into
        # [TILE_R, PT] accumulators (t + global-id vectors) and the expensive
        # cross-lane reductions run ONCE PER TILE after the loop.  Pages may
        # repeat in tail slices (clamped) — harmless: duplicate real
        # triangles fold idempotently.
        np_ = G_hbm.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, PT), 1)
        for kk in range(KP):
            q = quad[:, kk * 4 * PT:(kk + 1) * 4 * PT]
            t = _mt_epilogue(q, PT, eps, True)
            pid = jnp.minimum(page(j * KP + kk), np_ - 1)
            idv = pid * PT + lane
            imp = t < best_t
            best_t = jnp.where(imp, t, best_t)
            best_i = jnp.where(imp, idv, best_i)
        # front-to-back break: entries ascend in conservative entry t, so
        # once every ray has a hit closer than the next entry's bound, no
        # remaining page can improve any ray in the tile.  Per-ray best =
        # min over accumulator lanes — the loop's ONLY cross-lane reduction
        # (the argmin reduction is deferred to after the loop).  Compared in
        # int space (IEEE: non-negative f32 order == bit order; Mosaic has
        # no scalar float bitcast).
        if _NO_BREAK:
            done = jnp.bool_(False)
        else:
            per_ray = jnp.min(best_t, axis=1, keepdims=True)   # [TILE_R, 1]
            worst_bits = jnp.max(jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(per_ray, jnp.int32), 16))
            done = use_list & (worst_bits < bound16((j + 1) * KP))
        return j + 1, done, best_t, best_i

    init = (jnp.int32(0), jnp.bool_(False),
            jnp.full((TILE_R, PT), jnp.inf, jnp.float32),
            jnp.full((TILE_R, PT), -1, jnp.int32))
    j_end, _, tv, iv = jax.lax.while_loop(cond, body, init)

    if not _SYNC_DMA:
        # drain the prefetched super-step left in flight by an early break
        @pl.when(j_end < ns)
        def _():
            _super_wait(G_hbm, gbuf, sem_g, page, j_end % 2, j_end, PT)

    # the one reduction pair per tile: winner t, then min global id among
    # winning lanes (ties break to the lowest triangle id)
    bt = jnp.min(tv, axis=1, keepdims=True)              # [TILE_R, 1]
    bid = jnp.min(jnp.where(tv == bt, iv, jnp.int32(0x7FFFFFFF)),
                  axis=1, keepdims=True)
    t_ref[0] = bt
    idx_ref[0] = jnp.where(jnp.isfinite(bt), bid, -1)


def _anyhit_kernel(block: int, eps: float, no_max_t: bool, plan_ref, F_ref,
                   self_ref, G_hbm, hit_ref, gbuf, sem_g):
    """Occlusion: ANY valid hit (t >= 0, no max-t — the reference quirk,
    simple_raytracer.cpp:321-342) on a triangle of a DIFFERENT object.
    Per-triangle object ids ride in Gram row 10 (prepare() packs them), so
    the same DMA stream feeds both the contraction and the self-exclusion."""
    i = pl.program_id(0)
    PT = block
    KP = _kp(PT)
    cnt, page, use_list, _bound16 = _tile_plan(plan_ref, i)
    ns = (cnt + KP - 1) // KP
    F = F_ref[0]
    TILE_R = F.shape[0]
    self_obj = self_ref[0]                               # [TILE_R, 1] f32

    def start_super(slot, j):
        _super_dma(G_hbm, gbuf, sem_g, page, slot, j, PT)

    def wait_super(slot, j):
        _super_wait(G_hbm, gbuf, sem_g, page, slot, j, PT)

    if not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            start_super(0, 0)

    def cond(state):
        j, found, done = state
        # early exit once every ray in the tile is occluded — shadow tiles
        # saturate fast, and any further pages are wasted DMA + matmul
        return (j < ns) & ~done

    def body(state):
        j, found, _ = state
        slot = j % 2 if not _SYNC_DMA else 0

        if _SYNC_DMA:
            start_super(0, j)
        else:
            @pl.when(j + 1 < ns)
            def _():
                start_super((j + 1) % 2, j + 1)

        wait_super(slot, j)
        quad = jnp.dot(F, gbuf[slot], preferred_element_type=jnp.float32,
                       precision=_PRECISION)             # [TILE_R, KP*4PT]
        # elementwise-only per page; the cross-lane reduction runs ONCE per
        # super-step on the [TILE_R, PT] accumulator
        occ_vec = jnp.zeros((TILE_R, PT), jnp.float32)
        for kk in range(KP):
            q = quad[:, kk * 4 * PT:(kk + 1) * 4 * PT]
            objs = gbuf[slot][10:11, kk * 4 * PT:kk * 4 * PT + PT]  # [1, PT]
            occm = _mt_occlusion(q, PT, eps, True, no_max_t) & \
                (objs != self_obj)
            occ_vec = jnp.maximum(occ_vec, jnp.where(occm, 1.0, 0.0))
        occ = jnp.max(occ_vec, axis=1, keepdims=True)
        # carry f32, not bool: Mosaic cannot legalize i1 loop carries
        found = jnp.maximum(found, occ)
        return j + 1, found, jnp.min(found) > 0.0

    init = (jnp.int32(0), jnp.zeros((TILE_R, 1), jnp.float32),
            jnp.bool_(False))
    j_end, found, _ = jax.lax.while_loop(cond, body, init)

    if not _SYNC_DMA:
        # early exit leaves at most one prefetched super-step in flight
        # (started for j_end when iteration j_end-1 ran); drain it so the
        # semaphores are clean for the next grid step
        @pl.when(j_end < ns)
        def _():
            wait_super(j_end % 2, j_end)

    hit_ref[0] = (found > 0.0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

# SMEM is ~1 MB; a plan row occupies plan_w*4 bytes, so cap tiles per
# pallas_call and lax.map over chunks for bigger frames.
MAX_TILES_PER_CALL = (896 * 1024) // (PLAN_W * 4)


def _plan_width(num_units: int) -> int:
    """Plan-table width for a scene with ``num_units`` cullable units
    (pages or windows).  Dense scenes overflow a 248-entry list on
    through-geometry tiles and fall back to full covering-range walks —
    measured 6x the whole frame on the 177k-tri complex scene — so big
    scenes take wider (more SMEM, finer-chunked) plans instead."""
    if num_units <= 1500 or PLAN_W >= 1024:
        return PLAN_W
    return int(_os.environ.get("SRT_TILED_PLAN_W_BIG", "1024"))


def _max_tiles(plan_w: int) -> int:
    # Mosaic pads the prefetched SMEM plan to a 128-lane multiple (e.g. a
    # width-287 grouped plan allocates 384 i32/row), so budget on the
    # PADDED width or dense frames overflow the ~1MB SMEM.
    wpad = -(-plan_w // 128) * 128
    return max((896 * 1024) // (wpad * 4), 8)


def _out_struct(shape, dtype, ref):
    """ShapeDtypeStruct for a pallas_call output, carrying the varying-manual-
    axes of ``ref`` so the kernel is legal inside shard_map(check_vma=True)
    (the DP production path: dist/sharding.py routes mode='tiled' here)."""
    try:
        vma = jax.typeof(ref).vma
    except AttributeError:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _chunk_tiles(fn, n, *arrays, plan_w: int = None, max_tiles: int = None):
    """Run ``fn(chunk_arrays...)`` over tile chunks sized to the SMEM plan
    budget (leading axis n).  Pads with zeros (plan rows of zeros =
    cnt 0).  ``max_tiles``: additional per-chunk cap (the resident fetch
    kernel's outputs live in scoped VMEM alongside its operands — callers
    cap the chunk so outputs fit the budget; see tiled_t.tiled_nearest_t)."""
    C = _max_tiles(plan_w or PLAN_W)
    if max_tiles is not None:
        C = max(1, min(C, max_tiles))
    if n <= C:
        return fn(*arrays)
    nc = -(-n // C)
    pad = nc * C - n

    def pz(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape((nc, C) + a.shape[1:])

    outs = jax.lax.map(lambda xs: fn(*xs), tuple(pz(a) for a in arrays))
    return jax.tree.map(
        lambda o: o.reshape((nc * C,) + o.shape[2:])[:n], outs)


@functools.partial(jax.jit, static_argnames=("tile", "page_tris", "eps"))
def tiled_nearest(F, plan, Gt, tile: int, page_tris: int, eps: float):
    """F [n,tile,F_DIM], plan [n,PLAN_W] i32, Gt [NP,F_DIM,4*page_tris]
    -> (t [n,tile], idx [n,tile])."""
    n = F.shape[0]

    def call(Fc, planc):
        nl = Fc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl,),
            in_specs=[
                pl.BlockSpec((1, tile, F_DIM), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),   # Gt
            ],
            out_specs=[
                pl.BlockSpec((1, tile, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, F_DIM, 4 * page_tris * _kp(page_tris)),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2, _kp(page_tris))),
            ],
        )
        return pl.pallas_call(
            functools.partial(_nearest_kernel, page_tris, eps),
            grid_spec=grid_spec,
            out_shape=[
                _out_struct((nl, tile, 1), jnp.float32, Fc),
                _out_struct((nl, tile, 1), jnp.int32, Fc),
            ],
            interpret=_interpret(),
        )(planc, Fc, Gt)

    t, idx = _chunk_tiles(call, n, F, plan, plan_w=plan.shape[1])
    return t.reshape(n, tile), idx.reshape(n, tile)


@functools.partial(jax.jit,
                   static_argnames=("tile", "page_tris", "eps", "no_max_t"))
def tiled_anyhit(F, self_obj, plan, Gt,
                 tile: int, page_tris: int, eps: float,
                 no_max_t: bool = True):
    """Occlusion query.  self_obj [n, tile] f32.  Object ids come from Gram
    row 10 (see accel/prepared.py).  -> found [n, tile] bool."""
    n = F.shape[0]

    def call(Fc, selfc, planc):
        nl = Fc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl,),
            in_specs=[
                pl.BlockSpec((1, tile, F_DIM), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),   # Gt
            ],
            out_specs=[
                pl.BlockSpec((1, tile, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, F_DIM, 4 * page_tris * _kp(page_tris)),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2, _kp(page_tris))),
            ],
        )
        (found,) = pl.pallas_call(
            functools.partial(_anyhit_kernel, page_tris, eps, no_max_t),
            grid_spec=grid_spec,
            out_shape=[_out_struct((nl, tile, 1), jnp.int32, Fc)],
            interpret=_interpret(),
        )(planc, Fc, selfc, Gt)
        return found

    found = _chunk_tiles(call, n, F, self_obj.reshape(n, tile, 1), plan,
                         plan_w=plan.shape[1])
    return found.reshape(n, tile) != 0


# ---------------------------------------------------------------------------
# Renderer front-end
# ---------------------------------------------------------------------------

import dataclasses as _dc


@jax.tree_util.register_pytree_node_class
@_dc.dataclass
class BlockSet:
    """Minimal geometry bundle the tiled kernels consume: flat Gram columns +
    per-block AABBs.  PreparedScene satisfies the same attribute protocol;
    this container serves SHARD-LOCAL geometry (dist/ring.py runs the same
    kernels on each resident triangle shard).

    ``from_arrays`` derives the static block geometry from shapes alone, so
    it can be called inside shard_map/jit bodies."""

    block_min: jnp.ndarray    # [NB, 3] — cull-granularity AABBs
    block_max: jnp.ndarray    # [NB, 3]
    gram: jnp.ndarray         # [NP, 16, 4*page_tris] — Gram pages
    num_blocks: int = 0
    block_size: int = 32

    def tree_flatten(self):
        return ((self.block_min, self.block_max, self.gram),
                (self.num_blocks, self.block_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_pages(self) -> int:
        return int(self.gram.shape[0])

    @property
    def page_tris(self) -> int:
        return int(self.gram.shape[2]) // 4

    @classmethod
    def from_arrays(cls, block_min, block_max, gram):
        nb = block_min.shape[0]
        pt = gram.shape[2] // 4
        bs = gram.shape[0] * pt // nb       # total padded tris / blocks
        return cls(block_min, block_max, gram, num_blocks=int(nb),
                   block_size=int(bs))


def _cull(origin, direction, tile, prep, maxv, excl=None,
          hourglass: bool = False, apex: bool = False,
          apex_rev: bool = False):
    """Unified cull -> plan table [n, PLAN_W] for the kernels.  maxv > 0:
    exact page lists with range fallback; maxv == 0: pure page ranges.
    Scenes beyond the 16-bit page-id space of list entries (> 65536 pages
    = 8.4M triangles at page_tris 128) force range mode.  ``excl`` [n] i32:
    per-tile self-object id to cull (shadow passes; see _visibility).
    ``hourglass``: apex-aware shadow-ray visibility
    (:func:`_visibility_hourglass`)."""
    pt = prep.page_tris
    bobj = getattr(prep, "block_obj", None) if excl is not None else None
    pw = _plan_width(prep.num_pages)
    if prep.num_pages > 65536:
        maxv = 0
    if maxv > 0:
        return cull_blocks_lists(origin, direction, tile,
                                 prep.block_min, prep.block_max, maxv,
                                 prep.block_size, pt, bobj, excl,
                                 plan_w=pw, hourglass=hourglass, apex=apex,
                                 apex_rev=apex_rev)
    lo, cnt = cull_blocks(origin, direction, tile,
                          prep.block_min, prep.block_max, bobj, excl,
                          hourglass=hourglass)
    # convert the covering block range to the covering PAGE range
    bpp = pt // prep.block_size
    lo_p = lo // bpp
    cnt_p = jnp.where(cnt > 0, (lo + cnt - 1) // bpp - lo_p + 1, 0)
    n = lo.shape[0]
    z = jnp.zeros_like(lo)
    aux = jnp.stack([lo_p, cnt_p, z, z, z, z, z, z], axis=-1)
    return jnp.concatenate(
        [aux, jnp.zeros((n, pw - PLAN_AUX), jnp.int32)], axis=-1)


def tiled_hits(prep, origin, direction, tile: int, eps: float,
               maxv: int = 64, apex: bool = False):
    """Nearest hit over flat rays via the tiled kernel.  Returns (t, idx)."""
    Gt = prep.gram            # packed at prepare() time (host numpy)
    F, n, R = ray_tile_features(origin, direction, tile)
    plan = _cull(origin, direction, tile, prep, maxv, apex=apex)
    t, idx = tiled_nearest(F, plan, Gt, tile, prep.page_tris, eps)
    return t.reshape(-1)[:R], idx.reshape(-1)[:R]


# --- impl adapter (see tiled_t.py for the sublane-grouped twin): the shadow
# front-end below (miss repair, sample folding) is kernel-layout-agnostic and
# reaches the cull/any-hit backends only through these two functions -------

def cull(prep, origin, direction, tile: int, maxv: int, excl=None,
         apex: bool = False):
    return _cull(origin, direction, tile, prep, maxv, excl, apex=apex)


def cull_occl(prep, origin, direction, tile: int, maxv: int, excl=None,
              apex_rev: bool = False):
    """Occlusion-query plan: apex-aware hourglass visibility for dense
    scenes (shadow rays pass through the light; see _visibility_hourglass
    and tiled_t._hourglass_for for the density gate + measurements) and,
    when all rays share one light (``apex_rev``), the projective
    two-cone light-apex cull."""
    from . import tiled_t as _t
    return _cull(origin, direction, tile, prep, maxv, excl,
                 hourglass=_t._hourglass_for(prep) and not apex_rev,
                 apex_rev=apex_rev)


def anyhit(prep, origin, direction, self_obj2d, plan, tile: int, eps: float,
           no_max_t: bool):
    """self_obj2d [n, tile] f32 -> found [n, tile] bool."""
    F, n, R = ray_tile_features(origin, direction, tile)
    return tiled_anyhit(F, self_obj2d, plan, prep.gram, tile,
                        prep.page_tris, eps, no_max_t)


def hits(prep, origin, direction, tile: int, eps: float, maxv: int = 64,
         apex: bool = False):
    return tiled_hits(prep, origin, direction, tile, eps, maxv, apex=apex)


def effective_tile_px(cfg, num_tris: int) -> int:
    """Pixel tile edge for the tiled path (config.tile_px; 0 = adaptive).

    The projective apex cull (round 3, _visibility_px) flipped the
    round-2 tradeoff: plans are now so short (~2.7 windows/16px tile on
    the bench bunny) that the kernel is bound by PER-TILE fixed cost
    (grid step + while-loop iteration, ~2.2 us each), so BIGGER tiles
    amortize it and win despite looser union lists.  Measured 1080p
    bunny (69k tris) full frame: 16px 38.7 / 32px 28.6 / 48px 28.8 /
    64px 26.2 / 96px 33.6 ms (128px exceeds VMEM: quad scratch).
    complex@180 (177k tris): 16px 72.8 / 32px 56.5 / 64px 75.4 ms —
    denser scenes re-grow the union lists faster, so the gate steps
    down with triangle count.  Round-2 history (16px optimal pre-px):
    DESIGN.md."""
    if cfg.tile_px:
        return cfg.tile_px
    if num_tris <= 131072:
        return 64
    return 32


def _hit_tile(cfg, tile: int) -> int:
    """Effective nearest-pass ray-tile size (config.hit_tile; 0 = the full
    pixel tile).  Sub-tiles are contiguous chunks of the tile-major stream,
    so they stay spatially coherent (128 = a 16x8-pixel half-tile)."""
    ht = cfg.hit_tile
    if not ht or ht >= tile:
        return tile
    assert tile % ht == 0 and ht % 128 == 0, (tile, ht)
    return ht


def _shadow_tile(cfg, tile: int, prep) -> int:
    """Effective shadow-pass ray-tile size (config.shadow_tile; 0 = adaptive
    on scene density — dense scenes win from tighter shadow cull bounds,
    small scenes lose to the extra cull/grid overhead; measured numbers in
    config.py).

    Tiles past 1024 rays are allowed only on the one-pass "stack" tier:
    the tri/highest tiers' runtime operand splits triple the any-hit's
    live values and the register allocator SPILLS to scoped VMEM
    (measured: tri at 4096-ray tiles asks 146 MB of the 128 MB budget;
    stack runs 9.4 ms/frame).  Cap costs the capped tiers ~1.4 ms on the
    bench bunny — correctness over speed for the non-default tiers."""
    if cfg.shadow_tile:
        return cfg.shadow_tile
    tris = prep.block_min.shape[0] * prep.block_size
    stile = 256 if tris > 131072 and tile > 256 else tile
    from . import tiled_t as _t
    stacked = getattr(prep, "gram_s", None) is not None and \
        _t._mode() == "stack"
    # the spill cap is a Mosaic register-allocator concern — interpret
    # mode (CPU tests, where stack maps to highest) runs through XLA and
    # must pick the HARDWARE tile so the tested paths match production
    return stile if (stacked or _interpret()) else min(stile, 1024)


def tiled_shadow_fn(prep, tile: int, eps: float, maxv: int = 64,
                    no_max_t: bool = True, num_samples: int = 1,
                    impl=None):
    """Occlusion backend for the integrator's shadow contract.

    With ``num_samples`` S > 1 (soft shadows), the integrator sends S·R rays
    whose ORIGIN rows repeat per sample (only the light differs,
    render/integrator.py).  The folded path exploits that: points are tiled
    ONCE, all S samples of a point tile become extra M rows of the same
    kernel launch, and the tile's cull plan unions the S light directions —
    so culling and page DMA are paid once per point tile instead of once per
    (sample, tile).  Sample jitter is +3 units cumulative
    (simple_raytracer.cpp:362-383): the direction union stays tight.

    S == 1 contract: every light row is ONE shared position (the
    integrator broadcasts the sample) — the plan exploits it with the
    projective light-apex cull (cull_occl apex_rev).
    """
    import sys
    impl = impl or sys.modules[__name__]

    def shadow(point, light, self_obj, hit=None):
        S = num_samples
        if S > 1 and point.shape[0] % S == 0:
            return _shadow_folded(prep, impl, tile, eps, maxv,
                                  no_max_t, S, point, light, self_obj, hit)
        so = self_obj.astype(jnp.float32)
        if hit is not None:
            # tile-aware repair: a miss ray's pinned (0,0,0) origin would
            # blow the tile's cull bounds from the camera to the surface.
            # Replace miss origins (AND their self-object ids, so tile
            # purity below reflects real hits) with a hit FROM THE SAME
            # TILE (their occlusion results are discarded), and drop
            # hitless tiles entirely.
            R0 = point.shape[0]
            padn = (-R0) % tile
            if padn:
                point = jnp.concatenate(
                    [point, jnp.zeros((padn, 3), point.dtype)], 0)
                hit = jnp.concatenate(
                    [hit, jnp.zeros((padn,), hit.dtype)], 0)
                so = jnp.concatenate(
                    [so, jnp.broadcast_to(so[-1:], (padn,))], 0)
            nt = point.shape[0] // tile
            p3 = point.reshape(nt, tile, 3)
            h2 = hit.reshape(nt, tile)
            s2 = so.reshape(nt, tile)
            first = jnp.argmax(h2, axis=1)
            fill = jnp.take_along_axis(
                p3, first[:, None, None].repeat(3, axis=2), axis=1)
            p3 = jnp.where(h2[..., None], p3, fill)
            s2 = jnp.where(h2, s2,
                           jnp.take_along_axis(s2, first[:, None], axis=1))
            any_hit = h2.any(axis=1)
            point = p3.reshape(-1, 3)[:R0]
            so = s2.reshape(-1)[:R0]
        d = light - point
        R = point.shape[0]
        n = -(-R // tile)
        pad = n * tile - R
        if pad:
            so = jnp.concatenate(
                [so, jnp.broadcast_to(so[-1:], (pad,))], 0)
        s2 = so.reshape(n, tile)
        # self-object cull: tiles whose rays all leave one object drop that
        # object's pure blocks at plan time (see _visibility)
        pure = jnp.all(s2 == s2[:, :1], axis=1)
        excl = jnp.where(pure, s2[:, 0].astype(jnp.int32), -2)
        # hard shadows (S=1): every ray ends at the same light -> the
        # projective two-cone light-apex cull applies (see cull_occl).
        # SRT_PX_REV=0 disables (measurement knob).
        plan = getattr(impl, 'cull_occl', impl.cull)(
            prep, point, d, tile, maxv, excl,
            apex_rev=_os.environ.get("SRT_PX_REV", "1") not in ("0",))
        if hit is not None:
            plan = jnp.where(any_hit[:, None], plan, 0)   # skip hitless tiles
        found = impl.anyhit(prep, point, d, s2, plan, tile, eps, no_max_t)
        return found.reshape(-1)[:R]

    return shadow


def _shadow_folded(prep, impl, tile, eps, maxv, no_max_t, S,
                   point, light, self_obj, hit):
    """S-sample occlusion with per-point-tile plan/DMA sharing (see
    tiled_shadow_fn).  Rays arrive sample-major ([S*R]; origin rows repeat
    per sample); the kernel sees point tiles of ``ts`` points x S samples as
    one M = S*ts row block (capped so the quad buffer fits VMEM)."""
    R = point.shape[0] // S
    p0 = point[:R]
    self0 = self_obj[:R].astype(jnp.float32)
    lights = light.reshape(S, R, 3)
    ts = max(8, min(tile, 1024 // S))         # S*ts rows <= 1024

    padn = (-R) % ts
    if padn:
        p0 = jnp.concatenate([p0, jnp.zeros((padn, 3), p0.dtype)], 0)
        self0 = jnp.concatenate(
            [self0, jnp.broadcast_to(self0[-1:], (padn,))], 0)
        lights = jnp.concatenate(
            [lights, jnp.broadcast_to(lights[:, -1:], (S, padn, 3))], 1)
    nt = p0.shape[0] // ts
    p3 = p0.reshape(nt, ts, 3)

    any_hit = None
    if hit is not None:
        h0 = hit[:R]
        if padn:
            h0 = jnp.concatenate([h0, jnp.zeros((padn,), h0.dtype)], 0)
        h2 = h0.reshape(nt, ts)
        # same-tile origin (+ self-object id) repair + hitless-tile skip
        # (see the single-sample path above)
        first = jnp.argmax(h2, axis=1)
        fill = jnp.take_along_axis(
            p3, first[:, None, None].repeat(3, axis=2), axis=1)
        p3 = jnp.where(h2[..., None], p3, fill)
        s2r = self0.reshape(nt, ts)
        self0 = jnp.where(
            h2, s2r,
            jnp.take_along_axis(s2r, first[:, None], axis=1)).reshape(-1)
        any_hit = h2.any(axis=1)

    # [nt, S, ts, 3] rows: sample-major within each point tile
    o_g = jnp.broadcast_to(p3[:, None], (nt, S, ts, 3))
    d_g = lights.reshape(S, nt, ts, 3).transpose(1, 0, 2, 3) - o_g
    o_f = o_g.reshape(-1, 3)
    d_f = d_g.reshape(-1, 3)
    s2 = self0.reshape(nt, ts)
    pure = jnp.all(s2 == s2[:, :1], axis=1)
    excl = jnp.where(pure, s2[:, 0].astype(jnp.int32), -2)
    plan = getattr(impl, 'cull_occl', impl.cull)(
        prep, o_f, d_f, S * ts, maxv, excl)
    if any_hit is not None:
        plan = jnp.where(any_hit[:, None], plan, 0)
    self_g = jnp.broadcast_to(self0.reshape(nt, 1, ts), (nt, S, ts))
    found = impl.anyhit(prep, o_f, d_f, self_g.reshape(nt, S * ts), plan,
                        S * ts, eps, no_max_t)
    found = found.reshape(nt, S, ts).transpose(1, 0, 2).reshape(S, -1)
    return found[:, :R].reshape(-1)


def get_impl(name: str = None):
    """Kernel implementation registry: 'paged' (ray-major, this module) or
    'sublane' (transposed, kernels/tiled_t.py).  ``None`` reads the
    SRT_TILED_IMPL env knob (default 'sublane' — measured faster at equal
    semantics; see DESIGN.md)."""
    import sys
    name = name or _os.environ.get("SRT_TILED_IMPL", "sublane")
    if name == "paged":
        return sys.modules[__name__]
    if name == "sublane":
        from . import tiled_t
        return tiled_t
    raise ValueError(f"unknown tiled kernel impl {name!r}")


def effective_cull_maxv(cfg: RenderConfig, prep) -> int:
    """List-mode window cap, density-adaptive (KernelConfig.maxv_big).

    DENSE scenes already take the wide 1024-entry plan (_plan_width), but
    the shipped cull_maxv=248 still dropped their through-geometry tiles
    to RANGE mode — full covering-range walks with no front-to-back
    break (complex p90 tile: 2215 windows).  Filling the plan capacity
    keeps them in sorted list mode with the bound16 early exit: complex
    600x400 full frame 15.86 -> 13.42 ms (round-5 A/B,
    scripts/complex_ab.py)."""
    maxv = cfg.cull_maxv
    if maxv <= 0:
        return maxv
    from . import tiled_t as _t
    nu = prep.block_min.shape[0] // _t.WINDOW_BLOCKS
    pw = _plan_width(nu)
    if pw <= PLAN_W:                       # small scene: default plan
        return maxv
    big = int(_os.environ.get("SRT_MAXV_BIG", str(cfg.kernel.maxv_big)))
    return max(maxv, min(big, pw - PLAN_AUX))


def render_flat_tiled(prep, cfg: RenderConfig, origin, direction, light_pos,
                      cam_spec=None):
    """Tiled-mode renderer over flat rays -> (radiance [R,3], hit [R]).

    ``cam_spec`` (view_matrix|None, focal, W, H, tile_px): rays are the
    full tile-major primary stream of that camera — enables the sublane
    kernel's in-kernel iota feature build (tiled_t.make_cam)."""
    tpx = effective_tile_px(cfg, prep.scene.verts.shape[0])
    tile = tpx * tpx
    impl = get_impl(cfg.tiled_impl)
    htile = _hit_tile(cfg, tile)
    maxv = effective_cull_maxv(cfg, prep)
    # primary rays: one camera origin per frame -> the apex (projective
    # pixel-space) cull applies.  Callers with mixed-origin rays reach the
    # kernels through impl.hits directly (apex defaults False there).
    record = None
    from . import tiled_t as _t
    # In-kernel one-hot shade-attribute fetch (exact limb transport,
    # _t.hits_attrs): DEFAULT ON where eligible.  Round 3 measured it as a
    # net loss (29.0 vs 27.1 ms/frame) — but that A/B varied only the
    # LIGHT between frames, and XLA hoists light-invariant stages (the
    # nearest walk AND the [R, K] record gather) out of such loops
    # (scripts/bench_hoist.py).  The round-4 HONEST A/B (view varied per
    # frame, scripts/frame_ab.py) reverses the verdict decisively: bunny
    # 1080p shadowed full frame 58.7 ms (gather shade) vs 18.2 ms (attr
    # fetch) — ray-sized gathers never overlapped; the fetch deletes every
    # one of them (records AND the occlusion pass's tri_obj lookup).
    # SRT_ATTR_FETCH=0 restores the gather path.
    def _fetch_vmem_ok():
        # the fetch kernel takes BOTH the resident walk operand and the
        # attr operand as scoped-VMEM inputs; Mosaic's scoped limit is
        # 110 MB (tiled_t._VMEM_LIMIT).  Output footprint is handled by
        # per-chunk capping inside tiled_nearest_t (measured: the whole
        # [chunk, AR, tile] output tuple allocates in VMEM — complex at
        # tile 4096 hit the wall at 59 tiles/chunk before the cap), so
        # only scenes whose OPERANDS leave no room at all fall back.
        if _os.environ.get("SRT_FETCH_VMEM_GATE", "") == "0":
            return True                      # measurement escape hatch
        g = _t._hit_operand(prep)
        mb = (g.size * g.dtype.itemsize
              + prep.attr_t.size * prep.attr_t.dtype.itemsize) / 2 ** 20
        return mb + htile * 36 / 2 ** 20 <= 100
    fetch_ok = (getattr(prep, "has_attr", False) and impl is _t
                and not _t._prepass_on() and maxv > 0
                and _t._groups_for(htile) == 1
                and _t._resident(_t._hit_operand(prep))
                and _fetch_vmem_ok()
                and _os.environ.get(
                    "SRT_ATTR_FETCH",
                    "1" if cfg.kernel.attr_fetch else "0") not in ("0",))
    cspec = cam_spec if impl is _t else None
    # FUSED in-kernel Phong (round 4): for flat-untextured S=1 scenes the
    # kernel's epilogue computes the full Phong term itself, so the frame
    # has NO ray-sized XLA shading work left — only the elementwise shadow
    # dim + tonemap.  Requires the attr-fetch + iota preconditions.
    fused_ok = (fetch_ok and cspec is not None
                and cfg.light.num_samples == 1
                and (not cfg.shading.smooth_normals
                     or getattr(prep, "attr_smooth", False))
                and _t._use_iota(cspec, True, 1, maxv, htile)
                and _os.environ.get(
                    "SRT_FUSED_PHONG",
                    "1" if cfg.kernel.fused_phong else "0") not in ("0",))
    if fused_ok:
        from ..ops import shading as _sh
        want_sh = (cfg.light.enable_shadows
                   and prep.scene.obj_color.shape[0] > 1)
        # FUSED shadow (round 5): the nearest kernel emits per-SUBTILE
        # hit-point bounds, the shadow plan is O(tiles)
        # (analytic_shadow_bounds), and the any-hit kernel rebuilds its
        # rays in VMEM from the t row — between the two kernels no
        # ray-sized XLA op remains in the frame at all.  Dense scenes'
        # finer shadow tiles (config.shadow_tile) are served by subtile
        # bounds groups (sub = htile // stile); the legacy path remains
        # for non-dividing or non-row-aligned configurations.
        stile_f = _shadow_tile(cfg, tile, prep)
        sub_f = htile // stile_f if stile_f else 1
        # subtile mode (sub_f > 1, dense scenes) measured SLOWER than the
        # legacy path on the complex scene (16.55 vs 13.84 ms): the
        # per-subtile hit-point BOX bounds are looser than the legacy
        # per-ray projective reductions when a subtile spans a depth
        # discontinuity, and the fatter shadow lists cost more than the
        # 2.3 ms of O(R) cull glue they save.  Default: whole-tile only;
        # SRT_FUSED_SHADOW_SUB=1 opts the subtile mode back in.
        if sub_f > 1 and _os.environ.get(
                "SRT_FUSED_SHADOW_SUB", "") not in ("1",):
            sub_f = 0
        fshadow = (want_sh and stile_f > 0 and sub_f >= 1
                   and htile % stile_f == 0
                   and stile_f % tpx == 0
                   and sub_f * 16 <= stile_f
                   and maxv > 0
                   and prep.block_min.shape[0]
                   // _t.WINDOW_BLOCKS_AH <= 65536
                   and _os.environ.get(
                       "SRT_FUSED_SHADOW",
                       "1" if cfg.kernel.fused_shadow else "0")
                   not in ("0",))
        out = _t.hits_shaded(
            prep, origin, direction, htile, cfg.mt_eps, light_pos,
            jnp.asarray(cfg.light.color, jnp.float32), maxv,
            cspec, cfg.shading.double_sided_diffuse,
            cfg.shading.specular_nl_factor,
            want_bounds=sub_f if fshadow else 0)
        if fshadow:
            t, tri_idx, objv, rgb, bounds = out
        else:
            t, tri_idx, objv, rgb = out
        hitm = jnp.isfinite(t)
        if getattr(prep, "attr_tex", False):
            # XLA finish for textured scenes: the kernel emitted the
            # color-independent Phong factors + texel coords (hits_shaded
            # tex mode); only the texel gather + small-table material
            # selects are ray-sized here (simple_raytracer.cpp:348-361).
            comp = rgb                                     # [R, 6]
            sc = prep.scene
            lc = jnp.asarray(cfg.light.color, jnp.float32)
            tex_id = jnp.round(comp[:, 5]).astype(jnp.int32)
            ms = integrator.material_select(sc, jnp.maximum(objv, 0))
            tex_rgb = _sh.texture_fetch(sc.tex_data, sc.tex_offset,
                                        sc.tex_width, sc.tex_height,
                                        tex_id, comp[:, 2:4])
            color = jnp.where((tex_id >= 0)[:, None], tex_rgb,
                              ms["color"])
            rgb = (_sh.INV_PI * lc * color * comp[:, 0:1]
                   + lc * ms["specular"][:, None] * comp[:, 1:2])
        if want_sh:
            if fshadow:
                s = _t.anyhit_from_t(prep, t, objv, bounds, stile_f,
                                     cfg.mt_eps,
                                     cfg.light.shadow_no_max_t,
                                     light_pos, cspec, maxv,
                                     sub=sub_f)
            else:
                tsafe = jnp.where(hitm, t, 0.0)
                point = jnp.where(hitm[:, None],
                                  origin + tsafe[:, None] * direction, 0.0)
                stile = _shadow_tile(cfg, tile, prep)
                shadow_fn = tiled_shadow_fn(prep, stile, cfg.mt_eps,
                                            maxv,
                                            cfg.light.shadow_no_max_t, 1,
                                            impl=impl)
                s = shadow_fn(point,
                              jnp.broadcast_to(light_pos, point.shape),
                              objv, hit=hitm)
            rgb = jnp.where(s[:, None], rgb / cfg.light.shadow_dim, rgb)
        if cfg.shading.tonemap_enabled:
            rgb = _sh.tonemap(rgb, cfg.shading.reinhard_offset,
                              cfg.shading.gamma)
        return rgb, hitm
    if fetch_ok and not getattr(prep, "attr_tex", False) \
            and not getattr(prep, "attr_smooth", False):
        # (attr_tex/attr_smooth preps are only decodable by the fused
        # epilogue — with fused Phong off they take the gather path below)
        t, tri_idx, attrs = _t.hits_attrs(prep, origin, direction, htile,
                                          cfg.mt_eps, maxv,
                                          apex=True, cam_spec=cspec)
        record = integrator.records_from_attrs(prep.scene, attrs)
    else:
        kw = {"cam_spec": cspec} if impl is _t else {}
        t, tri_idx = impl.hits(prep, origin, direction, htile, cfg.mt_eps,
                               maxv, apex=True, **kw)
    stile = _shadow_tile(cfg, tile, prep)
    shadow_fn = tiled_shadow_fn(prep, stile, cfg.mt_eps, maxv,
                                cfg.light.shadow_no_max_t,
                                cfg.light.num_samples, impl=impl) \
        if cfg.light.enable_shadows else None
    radiance = integrator.shade(prep.scene, cfg, origin, direction, t,
                                tri_idx, light_pos, shadow_fn,
                                record=record)
    return radiance, jnp.isfinite(t)
