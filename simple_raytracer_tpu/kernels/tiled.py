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
* **Window-coalesced DMA.**  BVH preorder makes a tile's visible blocks
  cluster into short RUNS of consecutive block ids.  The cull pass greedily
  covers the visible set with fixed-width WINDOWS of ``WB`` consecutive
  blocks; the Gram factors live in a FLAT column-block layout
  (accel/prepared.py), so each window is ONE `pltpu.make_async_copy`
  descriptor — the round-1 per-block copies serialized the scalar core on
  descriptor issue (measured: 4x the descriptors => 5x the runtime,
  DESIGN.md).  Windows may cover interleaved invisible blocks: harmless by
  construction — culling is conservative, so an "invisible" block can never
  produce a valid hit for this tile's rays, and extra tested blocks only
  waste matmul columns.
  Tiles whose window set fits ``cull_maxv`` walk an EXACT compacted window
  list ordered front-to-back (the canonical scalar-prefetch block-sparse
  pattern — the table lives in SMEM); heavier tiles (rare: whole-object
  silhouette tiles) fall back to windows stepped over the covering
  contiguous range.  Manual HBM→SMEM id DMA was tried and faulted under
  Mosaic; scalar prefetch is the supported path.
* **Double-buffered DMA.**  Each tile walks its windows overlapping the next
  window's fetch with the current matmul.  SRT_TILED_SYNC=1 disables the
  overlap (debug).
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
# MXU precision for the MT contraction (HIGHEST=safest, HIGH=3-pass bf16).
_PRECISION = {"default": jax.lax.Precision.DEFAULT,
              "high": jax.lax.Precision.HIGH,
              "highest": jax.lax.Precision.HIGHEST}[
    _os.environ.get("SRT_MT_PRECISION", "highest").lower()]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Host/jnp-side packing
# ---------------------------------------------------------------------------

GRAM_PAD_BLOCKS = 32    # zero tail blocks in the flat Gram layout so a
                        # window starting at the last real block stays in
                        # bounds (zeros => det 0 => never a hit)


def pack_gram_blocks(verts_cart: jnp.ndarray, block: int) -> jnp.ndarray:
    """[T,3,3] (T a multiple of ``block``) -> flat Gram
    [F_DIM, (NB+GRAM_PAD_BLOCKS)*4*block]: block b owns the column range
    [b*4B, (b+1)*4B) with groups det | u_num | v_num | t_num, each ``block``
    wide.  (accel/prepared.py precomputes this on host; kept for ad-hoc
    use/tests.)"""
    G = isect.pack_mt_gram(verts_cart)                  # [T, 10, 4]
    T = G.shape[0]
    NB = T // block
    Gt = G.reshape(NB, block, 10, 4).transpose(2, 0, 3, 1)   # [10,NB,4,B]
    flat = jnp.zeros((F_DIM, (NB + GRAM_PAD_BLOCKS) * 4 * block), G.dtype)
    return flat.at[:10, :NB * 4 * block].set(Gt.reshape(10, NB * 4 * block))


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
                block_min: jnp.ndarray, block_max: jnp.ndarray):
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
    visible, _, n = _visibility(o, d, tile, block_min, block_max)
    NB = visible.shape[1]
    idx = jnp.arange(NB, dtype=jnp.int32)
    first = jnp.min(jnp.where(visible, idx, NB), axis=-1)     # [n]
    last = jnp.max(jnp.where(visible, idx, -1), axis=-1)
    cnt = jnp.maximum(last - first + 1, 0).astype(jnp.int32)
    lo = jnp.where(cnt > 0, first, 0).astype(jnp.int32)
    return lo, cnt


def _window_starts(visible: jnp.ndarray, WB: int) -> jnp.ndarray:
    """Greedy cover of each row's visible set with windows of WB consecutive
    blocks: block i starts a window iff it is visible and not already covered
    by the previous window.  Inherently sequential -> lax.scan over the block
    axis (NB steps of [n]-wide VPU work: negligible next to the visibility
    matrix itself).  Returns bool [n, NB]."""
    n, NB = visible.shape
    idxs = jnp.arange(NB, dtype=jnp.int32)

    def step(next_free, x):
        i, vis = x
        start = vis & (i >= next_free)
        return jnp.where(start, i + WB, next_free), start

    _, starts = jax.lax.scan(
        step, jnp.zeros((n,), jnp.int32), (idxs, visible.T))
    return starts.T


def cull_blocks_lists(o: jnp.ndarray, d: jnp.ndarray, tile: int,
                      block_min: jnp.ndarray, block_max: jnp.ndarray,
                      maxv: int, block: int):
    """Window-list culling with range fallback.

    Same conservative visibility as :func:`cull_blocks`, compressed into
    fixed-width WINDOWS of ``WB`` consecutive blocks (one DMA descriptor
    each — see module docstring).  Tiles whose window count fits ``maxv``
    get an EXACT compacted window list ordered front-to-back (start ids ride
    into SMEM via scalar prefetch); heavier tiles fall back to windows
    stepped over the covering contiguous range.

    Returns the fused plan table [n, PLAN_W] i32 with aux columns
    (lo, range_cnt, win_cnt, use_list, 0...) then packed window entries.
    """
    visible, tlo, n = _visibility(o, d, tile, block_min, block_max)
    NB = visible.shape[1]
    # plan entries pack the window-start block id into 16 bits
    assert NB <= 65536, (
        f"{NB} triangle blocks exceed the 16-bit plan-entry id space; "
        "use range culling (cull_maxv=0) or a larger block_size")
    WB = _wb(block)
    idx = jnp.arange(NB, dtype=jnp.int32)
    first = jnp.min(jnp.where(visible, idx, NB), axis=-1)
    last = jnp.max(jnp.where(visible, idx, -1), axis=-1)
    range_cnt = jnp.maximum(last - first + 1, 0).astype(jnp.int32)
    lo = jnp.where(range_cnt > 0, first, 0).astype(jnp.int32)

    starts = _window_starts(visible, WB)                          # [n, NB]
    # window entry bound: min conservative entry-t over the window's VISIBLE
    # member blocks (invisible members can never hit, so they don't bound)
    INF = jnp.float32(jnp.inf)
    tv = jnp.where(visible, tlo, INF)
    tvp = jnp.concatenate([tv, jnp.full((n, WB), INF, tv.dtype)], axis=1)
    wmin = tvp[:, :NB]
    for k in range(1, WB):
        wmin = jnp.minimum(wmin, tvp[:, k:k + NB])

    win_cnt = starts.sum(axis=-1).astype(jnp.int32)
    maxv = min(maxv, PLAN_MAXV)
    use_list = (win_cnt <= maxv).astype(jnp.int32)

    # order entries front-to-back: bucket each window by its entry bound
    # (relative to the tile's range), and pack the truncated 16-bit float
    # bound so the kernel can stop once every ray's best hit beats the next
    # entry's bound
    tmin = jnp.min(jnp.where(starts, wmin, INF), axis=-1)         # [n]
    tmax = jnp.max(jnp.where(starts, wmin, -INF), axis=-1)
    tmin = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
    qscale = jnp.maximum(tmax - tmin, 1e-20) / T_BUCKETS
    qb = jnp.clip(((wmin - tmin[:, None]) / qscale[:, None]).astype(jnp.int32),
                  0, T_BUCKETS - 1)
    # the packed bound is the BUCKET FLOOR, not the entry's own t: within a
    # bucket entries are in block-index order, so only the floor lower-bounds
    # every later entry (bucket-ascending => floors non-decreasing).  The
    # 16-bit truncation rounds down, keeping it conservative.
    floor_t = jnp.maximum(tmin[:, None] + qb.astype(jnp.float32)
                          * qscale[:, None], 0.0)
    bound16 = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(floor_t, jnp.int32), 16)

    # bucket-ordered compaction by scatter (argsort would be a per-row sort —
    # hundreds of ms on TPU at 8k tiles x 500 blocks)
    bucket_cnt = jnp.stack(
        [(starts & (qb == b)).sum(-1) for b in range(T_BUCKETS)], axis=-1)
    base = jnp.cumsum(bucket_cnt, axis=-1) - bucket_cnt           # [n, 8]
    slot = jnp.full((n, NB), PLAN_MAXV, jnp.int32)
    for b in range(T_BUCKETS):
        mb = starts & (qb == b)
        pos = jnp.cumsum(mb, axis=-1) - 1
        slot = jnp.where(mb, base[:, b:b + 1] + pos, slot)
    slot = jnp.where(slot < PLAN_MAXV, slot, PLAN_MAXV)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], slot.shape)
    packed = jnp.broadcast_to(idx[None, :], slot.shape) | (bound16 << 16)
    entries = jnp.zeros((n, PLAN_MAXV), jnp.int32).at[rows, slot].set(
        packed, mode="drop")
    z = jnp.zeros_like(lo)
    aux = jnp.stack(
        [lo, range_cnt, jnp.minimum(win_cnt, maxv), use_list,
         z, z, z, z], axis=-1)
    return jnp.concatenate([aux, entries], axis=-1)   # [n, PLAN_W]


def _visibility(o, d, tile, block_min, block_max):
    """Shared conservative (tile, block) visibility mask [n, NB]."""
    o, d, _ = pad_rays(o, d, tile)
    n = o.shape[0] // tile
    ot = o.reshape(n, tile, 3)
    dt = d.reshape(n, tile, 3)
    omin, omax = ot.min(1), ot.max(1)
    dmin, dmax = dt.min(1), dt.max(1)
    INF = jnp.float32(jnp.inf)
    lo_i = block_min[None, :, :] - omax[:, None, :]
    hi_i = block_max[None, :, :] - omin[:, None, :]
    dn = dmin[:, None, :]
    dx = dmax[:, None, :]
    cands = jnp.stack([_safe_div(lo_i, dn), _safe_div(lo_i, dx),
                       _safe_div(hi_i, dn), _safe_div(hi_i, dx)], axis=0)
    tmin_ax = jnp.min(cands, axis=0)
    tmax_ax = jnp.max(cands, axis=0)
    spans = ((dn <= 0.0) & (dx >= 0.0)) | ((lo_i <= 0.0) & (hi_i >= 0.0))
    tmin_ax = jnp.where(spans, 0.0, jnp.maximum(tmin_ax, 0.0))
    tmax_ax = jnp.where(spans, INF, tmax_ax)
    t_lo = jnp.max(tmin_ax, axis=-1)
    t_hi = jnp.min(tmax_ax, axis=-1)
    # t_lo == +inf means the entry time is unbounded (an axis whose direction
    # interval is {0} with a strictly-positive offset interval produces
    # all-inf slab candidates): the block is genuinely unreachable.  Without
    # this guard inf >= inf would mark it visible and poison the tile's
    # front-to-back quantization (qscale=inf -> floor_t=NaN -> bogus early
    # break in the kernel).
    visible = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < jnp.inf)
    return visible, jnp.maximum(t_lo, 0.0), n


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
    """One block's quad slice [TILE_R, 4B] -> t [TILE_R, B], misses=+inf.

    Single home for the Möller–Trumbore validity rules (det eps, u/v range,
    t>=0 — simple_raytracer.cpp:57-73) shared by the nearest-hit and
    occlusion kernels.
    """
    det = q[:, :B]
    inv = 1.0 / det
    u = q[:, B:2 * B] * inv
    v = q[:, 2 * B:3 * B] * inv
    t = q[:, 3 * B:] * inv
    valid = (jnp.abs(det) >= eps) & (u >= 0.0) & (u <= 1.0) & \
            (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0) & extra_valid
    return jnp.where(valid, t, jnp.inf)


PLAN_W = int(_os.environ.get("SRT_TILED_PLAN_W", "128"))
                    # plan-table width (multiple of 128: SMEM lane padding)
# cols 0-7: lo, range_cnt, win_cnt, use_list, 0, 0, 0, 0;
# cols 8..: packed WINDOW entries  start_block | (bound16 << 16),
# bound-ascending, where bound16 = top 16 bits of the f32 conservative
# entry-t (IEEE ordering: for non-negative floats, bit-pattern comparison ==
# value comparison, and truncation rounds the bound DOWN, keeping the break
# conservative).
PLAN_AUX = 8
PLAN_MAXV = PLAN_W - PLAN_AUX
T_BUCKETS = 8


def _tile_plan(plan_ref, i, WB):
    """Per-tile work plan from the fused scalar-prefetch table [n, PLAN_W]:
    window count, a k -> window-start mapping (exact list when it fit,
    WB-strided steps over the covering range else), and a conservative
    entry-t lower bound per position.  Fusing aux + packed entries into one
    128-wide row costs nothing (SMEM lane padding) and keeps exactly one
    prefetch operand."""
    lo = plan_ref[i, 0]
    use_list = plan_ref[i, 3] == 1
    cnt = jnp.where(use_list, plan_ref[i, 2],
                    (plan_ref[i, 1] + WB - 1) // WB)

    def entry(k):
        return plan_ref[i, PLAN_AUX + jnp.minimum(k, PLAN_MAXV - 1)]

    def start(k):
        # clamp the list index: in range mode k can exceed maxv and both
        # sides of the select are evaluated
        return jnp.where(use_list, entry(k) & 0xFFFF, lo + k * WB)

    def bound16(k):
        # truncated-f32 entry-t bound, comparable in INT space against the
        # high 16 bits of any non-negative f32 (IEEE ordering); valid only
        # in list mode where entries are bound-ascending
        return jax.lax.shift_right_logical(entry(k), 16)
    return cnt, start, use_list, bound16


# One super-step = one [TILE_R,16]@[16,SUPER_COLS] contraction over a window
# of WB consecutive blocks, fetched by ONE DMA descriptor from the flat Gram
# layout.  SUPER_COLS is fixed so finer blocks (tighter culling) keep the
# same MXU width and DMA size per step.
SUPER_COLS = int(_os.environ.get("SRT_TILED_SUPER_COLS", "4096"))


def _wb(block: int) -> int:
    """Blocks per window."""
    wb = max(SUPER_COLS // (4 * block), 1)
    assert wb <= GRAM_PAD_BLOCKS, (
        f"window of {wb} blocks overruns the {GRAM_PAD_BLOCKS}-block Gram "
        "tail pad; lower SRT_TILED_SUPER_COLS or raise GRAM_PAD_BLOCKS")
    return wb


def _super_dma(G_hbm, gbuf, sem_g, start, slot, j, B):
    """Start the ONE window fetch of super-step j into gbuf[slot].

    Unconditional (invalid steps clamp to a valid start; culling is
    conservative so extra real blocks cannot produce wrong hits and the
    zero tail pad has det 0): a @pl.when around the DMA serializes the
    scalar core."""
    WB = _wb(B)
    nbw = G_hbm.shape[1] // (4 * B) - WB      # last legal window start
    s = jnp.clip(start(j), 0, nbw)
    pltpu.make_async_copy(
        G_hbm.at[:, pl.ds(s * 4 * B, 4 * B * WB)],
        gbuf.at[slot],
        sem_g.at[slot]).start()


def _super_wait(G_hbm, gbuf, sem_g, start, slot, j, B):
    WB = _wb(B)
    nbw = G_hbm.shape[1] // (4 * B) - WB
    s = jnp.clip(start(j), 0, nbw)
    pltpu.make_async_copy(
        G_hbm.at[:, pl.ds(s * 4 * B, 4 * B * WB)],
        gbuf.at[slot],
        sem_g.at[slot]).wait()


def _nearest_kernel(block: int, eps: float, plan_ref, F_ref, G_hbm,
                    t_ref, idx_ref, gbuf, sem_g):
    i = pl.program_id(0)
    B = block
    WB = _wb(B)
    ns, start, use_list, bound16 = _tile_plan(plan_ref, i, WB)
    F = F_ref[0]                                         # [TILE_R, F_DIM]
    TILE_R = F.shape[0]

    if not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            _super_dma(G_hbm, gbuf, sem_g, start, 0, 0, B)

    def cond(state):
        j, done, best_t, best_i = state
        return (j < ns) & ~done

    def body(state):
        j, _, best_t, best_i = state
        slot = j % 2 if not _SYNC_DMA else 0

        if _SYNC_DMA:
            _super_dma(G_hbm, gbuf, sem_g, start, 0, j, B)
        else:
            @pl.when(j + 1 < ns)
            def _():
                _super_dma(G_hbm, gbuf, sem_g, start, (j + 1) % 2, j + 1, B)

        _super_wait(G_hbm, gbuf, sem_g, start, slot, j, B)
        quad = jnp.dot(F, gbuf[slot], preferred_element_type=jnp.float32,
                       precision=_PRECISION)             # [TILE_R, WB*4B]
        s = start(j)
        # per-slice epilogues are ELEMENTWISE only (cheap); the expensive
        # cross-lane reductions run ONCE over the whole window.  Blocks of a
        # window are consecutive, so the window is one contiguous triangle
        # range: global id = s*B + window lane.
        NW = WB * B
        ts = []
        for kk in range(WB):
            q = quad[:, kk * 4 * B:(kk + 1) * 4 * B]
            # every block in the window is testable: real blocks give exact
            # MT results whether or not they were individually visible, and
            # the zero tail pad has det 0 (never valid)
            ts.append(_mt_epilogue(q, B, eps, True))
        t = jnp.concatenate(ts, axis=1)                  # [TILE_R, WB*B]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, NW), 1)
        # per-ray vectors stay [TILE_R, 1] columns end-to-end: Mosaic
        # cannot reshape across the sublane/lane boundary
        bt = jnp.min(t, axis=1, keepdims=True)           # [TILE_R, 1]
        bj = jnp.min(jnp.where(t == bt, lane, NW), axis=1, keepdims=True)
        better = bt < best_t
        best_t = jnp.where(better, bt, best_t)
        best_i = jnp.where(better & (bj < NW), s * B + bj, best_i)
        # front-to-back break: entries ascend in conservative entry t, so
        # once every ray has a hit closer than the next entry's bound, no
        # remaining window can improve any ray in the tile.  Compared in int
        # space (IEEE: non-negative f32 order == bit order; Mosaic has no
        # scalar float bitcast).
        if _NO_BREAK:
            done = jnp.bool_(False)
        else:
            worst_bits = jnp.max(jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(best_t, jnp.int32), 16))
            done = use_list & (worst_bits < bound16(j + 1))
        return j + 1, done, best_t, best_i

    init = (jnp.int32(0), jnp.bool_(False),
            jnp.full((TILE_R, 1), jnp.inf, jnp.float32),
            jnp.full((TILE_R, 1), -1, jnp.int32))
    j_end, _, best_t, best_i = jax.lax.while_loop(cond, body, init)

    if not _SYNC_DMA:
        # drain the prefetched super-step left in flight by an early break
        @pl.when(j_end < ns)
        def _():
            _super_wait(G_hbm, gbuf, sem_g, start, j_end % 2, j_end, B)

    t_ref[0] = best_t
    idx_ref[0] = best_i


def _anyhit_kernel(block: int, eps: float, no_max_t: bool, plan_ref, F_ref,
                   self_ref, G_hbm, hit_ref, gbuf, sem_g):
    """Occlusion: ANY valid hit (t >= 0, no max-t — the reference quirk,
    simple_raytracer.cpp:321-342) on a triangle of a DIFFERENT object.
    Per-triangle object ids ride in Gram row 10 (prepare() packs them), so
    the same DMA stream feeds both the contraction and the self-exclusion."""
    i = pl.program_id(0)
    B = block
    WB = _wb(B)
    ns, start, use_list, _bound16 = _tile_plan(plan_ref, i, WB)
    F = F_ref[0]
    TILE_R = F.shape[0]
    self_obj = self_ref[0]                               # [TILE_R, 1] f32

    def start_super(slot, j):
        _super_dma(G_hbm, gbuf, sem_g, start, slot, j, B)

    def wait_super(slot, j):
        _super_wait(G_hbm, gbuf, sem_g, start, slot, j, B)

    if not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            start_super(0, 0)

    def cond(state):
        j, found, done = state
        # early exit once every ray in the tile is occluded — shadow tiles
        # saturate fast, and any further windows are wasted DMA + matmul
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
                       precision=_PRECISION)             # [TILE_R, WB*4B]
        # elementwise-only per slice; the cross-lane reduction runs ONCE per
        # window on the [TILE_R, B] accumulator
        occ_vec = jnp.zeros((TILE_R, B), jnp.float32)
        for kk in range(WB):
            q = quad[:, kk * 4 * B:(kk + 1) * 4 * B]
            objs = gbuf[slot][10:11, kk * 4 * B:kk * 4 * B + B]   # [1, B]
            occm = _mt_occlusion(q, B, eps, True, no_max_t) & \
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

# SMEM is ~1 MB; a plan row occupies PLAN_W*4 bytes, so cap tiles per
# pallas_call and lax.map over chunks for bigger frames.
MAX_TILES_PER_CALL = (896 * 1024) // (PLAN_W * 4)


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


def _chunk_tiles(fn, n, *arrays):
    """Run ``fn(chunk_arrays...)`` over <=MAX_TILES_PER_CALL tile chunks
    (leading axis n).  Pads with zeros (plan rows of zeros = cnt 0)."""
    C = MAX_TILES_PER_CALL
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


@functools.partial(jax.jit, static_argnames=("tile", "block", "eps"))
def tiled_nearest(F, plan, Gt, tile: int, block: int, eps: float):
    """F [n,tile,F_DIM], plan [n,PLAN_W] i32, Gt [NB,F_DIM,4B]
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
                pltpu.VMEM((2, F_DIM, 4 * block * _wb(block)), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_nearest_kernel, block, eps),
            grid_spec=grid_spec,
            out_shape=[
                _out_struct((nl, tile, 1), jnp.float32, Fc),
                _out_struct((nl, tile, 1), jnp.int32, Fc),
            ],
            interpret=_interpret(),
        )(planc, Fc, Gt)

    t, idx = _chunk_tiles(call, n, F, plan)
    return t.reshape(n, tile), idx.reshape(n, tile)


@functools.partial(jax.jit,
                   static_argnames=("tile", "block", "eps", "no_max_t"))
def tiled_anyhit(F, self_obj, plan, Gt,
                 tile: int, block: int, eps: float, no_max_t: bool = True):
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
                pltpu.VMEM((2, F_DIM, 4 * block * _wb(block)), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        (found,) = pl.pallas_call(
            functools.partial(_anyhit_kernel, block, eps, no_max_t),
            grid_spec=grid_spec,
            out_shape=[_out_struct((nl, tile, 1), jnp.int32, Fc)],
            interpret=_interpret(),
        )(planc, Fc, selfc, Gt)
        return found

    found = _chunk_tiles(call, n, F, self_obj.reshape(n, tile, 1), plan)
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

    block_min: jnp.ndarray    # [NB, 3]
    block_max: jnp.ndarray    # [NB, 3]
    gram: jnp.ndarray         # [16, (NB+GRAM_PAD_BLOCKS)*4*block]
    num_blocks: int = 0
    block_size: int = 128

    def tree_flatten(self):
        return ((self.block_min, self.block_max, self.gram),
                (self.num_blocks, self.block_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_arrays(cls, block_min, block_max, gram):
        nb = block_min.shape[0]
        bs = gram.shape[1] // (4 * (nb + GRAM_PAD_BLOCKS))
        return cls(block_min, block_max, gram, num_blocks=int(nb),
                   block_size=int(bs))


def _cull(origin, direction, tile, prep, maxv):
    """Unified cull -> plan table [n, PLAN_W] for the kernels.  maxv > 0:
    exact lists with range fallback; maxv == 0: pure ranges.  Scenes beyond
    the 16-bit block-id space of list entries (> 65536 blocks ≈ 8.4M
    triangles at block 128) force range mode."""
    if prep.num_blocks > 65536:
        maxv = 0
    if maxv > 0:
        return cull_blocks_lists(origin, direction, tile,
                                 prep.block_min, prep.block_max, maxv,
                                 prep.block_size)
    lo, cnt = cull_blocks(origin, direction, tile,
                          prep.block_min, prep.block_max)
    n = lo.shape[0]
    z = jnp.zeros_like(lo)
    aux = jnp.stack([lo, cnt, z, z, z, z, z, z], axis=-1)
    return jnp.concatenate(
        [aux, jnp.zeros((n, PLAN_MAXV), jnp.int32)], axis=-1)


def tiled_hits(prep, origin, direction, tile: int, eps: float,
               maxv: int = 64):
    """Nearest hit over flat rays via the tiled kernel.  Returns (t, idx)."""
    block = prep.block_size
    Gt = prep.gram            # packed at prepare() time (host numpy)
    F, n, R = ray_tile_features(origin, direction, tile)
    plan = _cull(origin, direction, tile, prep, maxv)
    t, idx = tiled_nearest(F, plan, Gt, tile, block, eps)
    return t.reshape(-1)[:R], idx.reshape(-1)[:R]


def tiled_shadow_fn(prep, tile: int, eps: float, maxv: int = 64,
                    no_max_t: bool = True):
    block = prep.block_size
    Gt = prep.gram

    def shadow(point, light, self_obj, hit=None):
        if hit is not None:
            # tile-aware repair: a miss ray's pinned (0,0,0) origin would
            # blow the tile's cull bounds from the camera to the surface.
            # Replace miss origins with a hit point FROM THE SAME TILE
            # (their occlusion results are discarded), and drop hitless
            # tiles entirely.
            R0 = point.shape[0]
            padn = (-R0) % tile
            if padn:
                point = jnp.concatenate(
                    [point, jnp.zeros((padn, 3), point.dtype)], 0)
                hit = jnp.concatenate(
                    [hit, jnp.zeros((padn,), hit.dtype)], 0)
            nt = point.shape[0] // tile
            p3 = point.reshape(nt, tile, 3)
            h2 = hit.reshape(nt, tile)
            first = jnp.argmax(h2, axis=1)
            fill = jnp.take_along_axis(
                p3, first[:, None, None].repeat(3, axis=2), axis=1)
            p3 = jnp.where(h2[..., None], p3, fill)
            any_hit = h2.any(axis=1)
            point = p3.reshape(-1, 3)[:R0]
        d = light - point
        F, n, R = ray_tile_features(point, d, tile)
        plan = _cull(point, d, tile, prep, maxv)
        if hit is not None:
            plan = jnp.where(any_hit[:, None], plan, 0)   # skip hitless tiles
        so = self_obj.astype(jnp.float32)
        pad = n * tile - R
        if pad:
            so = jnp.concatenate(
                [so, jnp.broadcast_to(so[-1:], (pad,))], 0)
        found = tiled_anyhit(F, so.reshape(n, tile), plan, Gt,
                             tile, block, eps, no_max_t)
        return found.reshape(-1)[:R]

    return shadow


def render_flat_tiled(prep, cfg: RenderConfig, origin, direction, light_pos):
    """Tiled-mode renderer over flat rays -> (radiance [R,3], hit [R])."""
    tile = cfg.tile_px * cfg.tile_px
    t, tri_idx = tiled_hits(prep, origin, direction, tile, cfg.mt_eps,
                            cfg.cull_maxv)
    shadow_fn = tiled_shadow_fn(prep, tile, cfg.mt_eps, cfg.cull_maxv,
                                cfg.light.shadow_no_max_t) \
        if cfg.light.enable_shadows else None
    radiance = integrator.shade(prep.scene, cfg, origin, direction, t,
                                tri_idx, light_pos, shadow_fn)
    return radiance, jnp.isfinite(t)
