"""Sublane-grouped (transposed) tiled Pallas renderer.

Same algorithm as kernels/tiled.py (MXU Möller–Trumbore over culled triangle
windows, front-to-back lists, early termination) with the two matmul axes
SWAPPED: triangles-scalars ride the SUBLANE axis and rays ride the LANE axis.

Why: the ray-major kernel's epilogue slices are [TILE_R, page_tris] — the
VPU's 128-lane width forces page_tris >= 128, so the fetch/test unit cannot
drop below 128 triangles without lane-padding waste.  Sublane granularity is
8, not 128: with quads shaped [4*block, TILE_R] the epilogue slices are
[block, TILE_R] (block=32 -> 4 sublane tiles, zero padding), so the
fetch/test unit is ONE 32-triangle cull block.  Measured on the bench scene
that cuts tested pairs 2.5x (1990 -> 807 tris/ray at 16x16 tiles) and HBM
traffic with it (scripts/cull_stats.py).

Layout (accel/prepared.py:pack_blocks_np): gram_t [16, (NB+pad)*4*BS] —
feature-major: rows are the 16 ray features, lanes are block-major
det|u|v|t groups of BS triangles.  A WINDOW of WB consecutive blocks is a
128-aligned lane slice = ONE (strided) DMA descriptor; the cull pass IS
the paged path's tiled.cull_blocks_lists with page_tris = WB*BS
(block-granularity visibility OR-reduced to aligned windows, front-to-back
bucket-ordered), so both impls share one cull cost.
Per super-step the kernel fetches KW windows (KW descriptors) and runs ONE
transposed [16, KW*WB*4*BS]^T @ [16, TILE_R] contraction
(quad [rows, TILE_R] — triangles on SUBLANES, which is the whole point:
epilogue slices are [BS, TILE_R], zero lane padding at 32-tri granularity,
and the single big-M matmul avoids per-block MXU issue overhead).

Reference behavior matched: nearest hit (simple_raytracer.cpp:296-317) and
any-hit occlusion with the self-object skip (:321-342); misses t=+inf/idx=-1.
Falls back to interpret mode off-TPU so the same code is CPU-testable.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import KernelConfig, RenderConfig

# Shipped kernel-tuning defaults (cited hardware measurements live on the
# dataclass, config.py).  SRT_* env vars override per-process, read ONCE
# at import; tests/test_gates.py pins the correspondence.
_KCFG = KernelConfig()
from ..ops import intersect as isect
from ..render import integrator
from ..utils import pad_rays
from . import tiled as _ray_major

F_DIM = _ray_major.F_DIM
PLAN_W = _ray_major.PLAN_W
PLAN_AUX = _ray_major.PLAN_AUX
PLAN_MAXV = _ray_major.PLAN_MAXV
T_BUCKETS = _ray_major.T_BUCKETS
_SYNC_DMA = _ray_major._SYNC_DMA
_NO_BREAK = _ray_major._NO_BREAK
_ABLATE = _ray_major._ABLATE
_interpret = _ray_major._interpret

# Windows per super-step (KW DMA descriptors, one contraction).  ROWS of the
# Gram operand per step = SUPER_ROWS = KW * WB * 4 * block_size.
SUPER_ROWS = int(_os.environ.get("SRT_TILED_SUPER_ROWS",
                                 str(_KCFG.super_rows)))
# Any-hit super-step rows for VMEM-RESIDENT scenes.  The any-hit walk is
# matmul-ISSUE bound, not FLOP bound (complex@180 round-2 ablation:
# loop+slices 12.6 ms, +matmuls 64.1, +predicate 66.0), so round 2 tuned
# the FATTEST contraction (8192: complex occlusion 66.0 @2048-split ->
# 56.2).  The round-3 projective shadow plans flipped it back: lists are
# short enough that step padding dominates — 2048 wins on BOTH scenes
# (bunny frame 24.7 vs 24.9 @4096; complex frame 52.1 vs 55.2 @8192).
SUPER_ROWS_AH = int(_os.environ.get("SRT_TILED_SUPER_ROWS_AH",
                                    str(_KCFG.super_rows_ah)))
# Nearest-query super-step rows for VMEM-RESIDENT scenes: the per-window
# split stays (bunny hits: split 62.2 vs concat 64.2 at 4096).  Round-2
# tuning picked 4096 (fewer loop iterations at interval-cull list
# lengths); with the round-3 projective plans (~2.7 windows/16px tile,
# ~10/64px) 2048 wins at BOTH tile gates: 64px nearest 19.8 @2048 vs
# 21.4 @4096 / 26.4 @8192; 16px 34.1 vs 34.7 (scripts/stack_sweep.py).
SUPER_ROWS_RES = int(_os.environ.get("SRT_TILED_SUPER_ROWS_RES",
                                     str(_KCFG.super_rows_res)))
# Window width in cull blocks (the aligned fetch/cull unit).  1 = per-block
# fetches (tightest culling: ~807 tris/ray on the bench scene vs ~1990 at
# 128-tri pages, scripts/cull_stats.py — but the most descriptors).  DMA
# descriptor issue (~1us each) dominates the measured kernel time, so the
# two query types tune separately: NEAREST keeps WB=2 (front-to-back early
# break rewards tighter lists: 153 vs 175 ms at WB=4 on the bench scene);
# ANY-HIT has no ordering gain and takes WB=4 (36 vs 65 ms at WB=2).
WINDOW_BLOCKS = int(_os.environ.get("SRT_TILED_WB",
                                    str(_KCFG.window_blocks)))
WINDOW_BLOCKS_AH = int(_os.environ.get("SRT_TILED_WB_AH",
                                       str(_KCFG.window_blocks_ah)))

# --- bf16 prepass -----------------------------------------------------------
# The HIGHEST-precision contraction is ~6 bf16 MXU passes and dominates the
# nearest kernel (ablation: ~122 of 130 ms on the bench frame; DEFAULT runs
# the whole kernel in 49 ms).  The prepass runs the SAME plan once at DEFAULT
# (1-pass bf16) with SOUND interval arithmetic: every MT numerator x computed
# by the bf16 MXU satisfies |x_bf - x| <= m * sum_k |G_k||F_k| with
# m ~ 2^-7.9 (operand f32->bf16 rounding; f32 accumulation).  The kernel
# bounds sum_k |G_k||F_k| <= sum_k |G_k| * alpha_k (Hölder, alpha = per-tile
# per-feature max |F|) with ONE [16,ROWS]^T @ [16,1] matvec per super-step,
# classifies each triangle as confident-valid (tightens a per-ray UPPER bound
# on the nearest t) or maybe-valid (flags its window when its t LOWER bound
# could still win), and emits per-plan-position window flags.  The HIGHEST
# pass then reruns only flagged windows (typically just the winners + ties),
# reproducing the single-pass HIGHEST result BIT-EXACTLY: the true winner is
# always flagged (its t_lo <= t_true <= best_hi), each quad element is an
# independent K=16 dot so its bits don't depend on which windows share the
# matmul, and tie order is preserved.
PREPASS_M = float(_os.environ.get("SRT_TILED_PREPASS_M", str(2.0 ** -6)))
# (flag-vector width now follows the plan width — see tiled_prepass_t)


# Resident mode: per-window matmuls instead of one concatenated super-step
# contraction.  The KW-slice concat materializes a [16, ROWS] copy per
# super-step; issuing KW smaller contractions straight off the resident
# lane slices measured bunny-1080p hits 74.3 -> 67.1 ms/frame (WB=2).
# (WB=1 with 8 splits stays worse, 84.4 — MXU issue overhead + coarser
# rows-per-break; WB=2/KW=4 is the optimum.)  SRT_TILED_SPLIT_MM=0 restores
# the single big contraction.
_SPLIT_MM = _os.environ.get("SRT_TILED_SPLIT_MM", "1") not in ("0", "")
# Per-window count guard in the split-MM paths: wrap each unrolled window k
# in lax.cond(jk < cnt) so the last super-step's padded slots (clamped
# duplicate windows, ~2-6 of every 16 issued window matmuls at projective
# plan sizes) skip both the MXU issue and the VPU epilogue.  Measured
# NEGATIVE on hardware (bunny 1080p nearest: 22.10 ms guarded vs 19.31
# unguarded) — the per-window scf.if overhead exceeds the saved duplicate
# work, consistent with the ~2.2us fixed cost per control-flow step
# (DESIGN.md round-3 retune).  Default OFF; SRT_TILED_SPLIT_GUARD=1 opts in.
_SPLIT_GUARD = _os.environ.get("SRT_TILED_SPLIT_GUARD", "0") not in ("0", "")
# Per-WINDOW front-to-back break period (0 = off, the step-level break
# only): every N windows the split-mm walk refreshes a break flag and
# cond-guards the remaining windows' matmul+epilogue.  Measurement knob —
# trades per-window reduction cost for skipped dead windows after the
# confirming one.  Env: SRT_WIN_BREAK=N.
_WIN_BREAK = int(_os.environ.get("SRT_WIN_BREAK", "0"))
# Any-hit keeps the CONCATENATED contraction in resident mode (see
# SUPER_ROWS_AH: issue-bound walk, fatter matmuls win, no break to protect).
_SPLIT_MM_AH = _os.environ.get("SRT_TILED_SPLIT_MM_AH", "0") not in ("0", "")
# Apex-aware (hourglass) shadow culling: shadow rays all pass through the
# light, so p(t) = (1-t)o + t(o+d) pinches — the two-branch linear test
# keeps 7x fewer windows per shadow tile than the independent-interval
# test at equal soundness (tiled._visibility_hourglass,
# scripts/shadow_cull_stats.py: interval 193.7 windows/tile, hourglass
# 27.1, per-ray oracle 19.6; 0 needed windows missed).  Density-gated:
# see _hourglass_for; SRT_HOURGLASS=1/0 forces it.


def _prepass_on() -> bool:
    # Default OFF: the exact two-pass pipeline measured 161 ms vs the tri
    # tier's 92 on the bench frame (the classification epilogue is
    # VPU-bound and the refine pass pays full-width super-steps).  It is
    # the opt-in for bit-exact-vs-oracle rendering at HIGHEST quality.
    return _os.environ.get("SRT_TILED_PREPASS", "0") not in ("0", "")


def _kw(block: int, wb: int, prec: str = "highest", rows: int = None) -> int:
    """Windows per super-step.  The tri tier halves the step (its hi/lo
    operand splits and three partial products put the 2048-row step 52KB
    over the 16MB scoped-VMEM limit).  ``rows`` overrides the SUPER_ROWS
    base (resident any-hit uses SUPER_ROWS_AH)."""
    rows = rows or SUPER_ROWS
    rows = rows // 2 if prec == "tri" else rows
    return max(rows // (4 * block * wb), 1)


def _features_rows(o: jnp.ndarray, d: jnp.ndarray, tile: int):
    """Flat rays [R,3] -> ([n, 10, tile] f32 feature rows, n, R), computed
    DIRECTLY in feature-major layout.

    Same values as isect.ray_features (d, o x d, o, 1 — identical mul/sub
    order, bit-exact), but each feature row is built as a contiguous
    [n, tile] plane and stacked on the SUBLANE axis — the previous
    ray-major path materialized [n, tile, rows] and paid a minor-dim
    relayout transpose on the full stacked array, which the hardware probe
    put at ~11 ms of the 19 ms nearest stage (bunny 1080p, 64px tiles:
    kernel-only 8.0 ms vs features+kernel 19.3 — scripts/stack_sweep.py
    SRT_SWEEP_HOIST A/B)."""
    o, d, R = pad_rays(o, d, tile)
    n = o.shape[0] // tile
    ot = o.reshape(n, tile, 3)
    dt = d.reshape(n, tile, 3)
    ox, oy, oz = (ot[:, :, k] for k in range(3))
    dx, dy, dz = (dt[:, :, k] for k in range(3))
    cx = oy * dz - oz * dy                     # jnp.cross component order
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx
    one = jnp.ones_like(dx)
    F = jnp.stack([dx, dy, dz, cx, cy, cz, ox, oy, oz, one], axis=1)
    return F, n, R


def ray_tile_features_t(o: jnp.ndarray, d: jnp.ndarray, tile: int):
    """Flat rays [R,3] -> (Ft [n_tiles, F_DIM, tile], n_tiles, R)."""
    F, n, R = _features_rows(o, d, tile)
    F = jnp.concatenate(
        [F, jnp.zeros((n, F_DIM - 10, F.shape[2]), F.dtype)], axis=1)
    return F, n, R


def _tile_plan_t(plan_ref, i, wb, groups: int = 1):
    """Per-tile plan: window count, k -> window-start-BLOCK mapping, list
    flag, and the conservative 16-bit entry-t bound per position.  Plan
    entries carry aligned WINDOW ids (block id // wb) straight from
    tiled.cull_blocks_lists with page_tris = wb*block_size.

    With ``groups`` > 1 the plan tail carries packed per-entry sub-group
    visibility masks (tiled.cull_blocks_lists(groups=...): 8 entries x 4
    bits per i32) and a 5th accessor ``gmask(k)`` is returned; range-mode
    tiles have no masks (all groups visible)."""
    lo = plan_ref[i, 0]
    use_list = plan_ref[i, 3] == 1
    cnt = jnp.where(use_list, plan_ref[i, 2], plan_ref[i, 1])

    W = plan_ref.shape[-1] - PLAN_AUX
    mv = (W * 8) // 9 if groups > 1 else W

    def entry(k):
        return plan_ref[i, PLAN_AUX + jnp.minimum(k, mv - 1)]

    def start(k):
        return jnp.where(use_list, entry(k) & 0xFFFF, lo + k) * wb

    def bound16(k):
        return jax.lax.shift_right_logical(entry(k), 16)

    if groups <= 1:
        return cnt, start, use_list, bound16

    def gmask(k):
        kc = jnp.minimum(k, mv - 1)
        w = plan_ref[i, PLAN_AUX + mv + kc // 8]
        m = jax.lax.shift_right_logical(w, 4 * (kc % 8)) & 0xF
        return jnp.where(use_list, m, 0xF)
    return cnt, start, use_list, bound16, gmask


def _nb_total(G_hbm, BS):
    return G_hbm.shape[1] // (4 * BS)


def _win_dma(G_hbm, gbuf, sem_g, start, slot, j, BS, WB, KW):
    """Start the KW window fetches of super-step j (each a 128-aligned lane
    slice of WB blocks = ONE strided descriptor).  Unconditional — invalid
    steps clamp to a valid window (conservative culling: extra real
    triangles cannot win; the zero tail pad has det 0)."""
    RPB = 4 * BS
    nbw = _nb_total(G_hbm, BS) - WB
    for k in range(KW):
        s = jnp.clip(start(j * KW + k), 0, nbw)
        pltpu.make_async_copy(
            G_hbm.at[:, pl.ds(s * RPB, WB * RPB)],
            gbuf.at[slot, :, pl.ds(k * WB * RPB, WB * RPB)],
            sem_g.at[slot, k]).start()


def _win_wait(G_hbm, gbuf, sem_g, start, slot, j, BS, WB, KW):
    RPB = 4 * BS
    nbw = _nb_total(G_hbm, BS) - WB
    for k in range(KW):
        s = jnp.clip(start(j * KW + k), 0, nbw)
        pltpu.make_async_copy(
            G_hbm.at[:, pl.ds(s * RPB, WB * RPB)],
            gbuf.at[slot, :, pl.ds(k * WB * RPB, WB * RPB)],
            sem_g.at[slot, k]).wait()


# Sublane-kernel matmul tier (SRT_MT_PRECISION):
#
# "stack" (the default) contracts a PREPACKED K-stacked bf16 operand
# (accel/prepared.py:pack_blocks_stacked_np): every partial product of a
# split-operand f32 emulation rides its own 10-row band of the contraction
# axis, so the whole emulation is ONE MXU pass — pass cost is flat in K up
# to 128 (scripts/kdepth_probe.py: K=16 160us, K=48 130us, K=96 130us per
# [65536,256] contraction).  prepare() picks 6 products (error ~2^-26 *
# sum|G||F| — f32 grade) or 3 (~2^-17, "tri" grade) per scene so residency
# is preserved; prep.stack_parts records the choice.
#
# "tri" is the round-2 hand-rolled 3-pass bf16 contraction (split x=hi+lo
# at runtime, three matmuls) — kept for BlockSet callers with no stacked
# operand (dist/ring.py shards) and as a measurement baseline.  "highest"
# runs the f32 operand at Precision.HIGHEST (~6 passes, bit-exact vs the
# jnp oracle).  Plain DEFAULT is unusable here: the Gram product mass
# dwarfs det, and 2^-8 mass-relative error measured t-match 0.75/idx 0.92.
# In interpret mode (CPU tests) stack/tri map to HIGHEST: the CPU f32
# matmul is exact, so split emulation would only ADD error and break the
# bit-equality tests vs the paged kernel.
_MODE = _os.environ.get("SRT_MT_PRECISION", _KCFG.mt_precision).lower()


def _mode() -> str:
    return "highest" if (_MODE in ("tri", "stack") and _interpret()) \
        else _MODE


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split3(x):
    """f32 -> (h, m, l) bf16 with x ~= h + m + l (jnp twin of
    accel/prepared.py:split3_np).

    The optimization_barrier after each down-cast is LOAD-BEARING: the TPU
    toolchain runs with --xla_allow_excess_precision=true, which lets XLA
    elide the f32->bf16->f32 round trip, folding the residual x - f32(h) to
    ZERO (measured: m was identically 0 under jit on TPU, silently degrading
    the stacked tier to DEFAULT-grade; Mosaic inside Pallas does not do
    this, which is why the round-2 in-kernel tri split never hit it)."""
    h = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    r = x - h.astype(jnp.float32)
    m = jax.lax.optimization_barrier(r.astype(jnp.bfloat16))
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def ray_tile_features_stacked(o, d, tile: int, parts: int):
    """Flat rays [R,3] -> (Fs [n_tiles, ROWS, tile] bf16, n_tiles, R): the
    F-side band stack matching gram_s's product pattern
    (accel/prepared.py:STACK_PATTERNS) — band i carries the bf16 part
    pattern[i][1] of the 10 ray features, rows zero-padded to a 16-multiple
    exactly like the G side, so ONE dot over the stacked rows sums every
    emulated partial product."""
    from ..accel.prepared import STACK_PATTERNS
    F, n, R = _features_rows(o, d, tile)                 # [n, 10, tile] f32
    h, m, l = _split3(F)
    part = {"h": h, "m": m, "l": l}
    Fs = jnp.concatenate([part[fp] for (_gp, fp) in STACK_PATTERNS[parts]],
                         axis=1)                         # [n, 10*parts, tile]
    rows = -(-(10 * parts) // 16) * 16
    pad = rows - 10 * parts
    if pad:
        Fs = jnp.concatenate(
            [Fs, jnp.zeros((n, pad, Fs.shape[2]), Fs.dtype)], axis=1)
    return Fs, n, R


def ray_tile_od(o: jnp.ndarray, d: jnp.ndarray, tile: int):
    """Flat rays [R,3] -> ([n, 8, tile] f32 ray rows, n, R): rows
    [ox, oy, oz, dx, dy, dz, 1, 0] for the IN-KERNEL feature build
    (:func:`_build_feats`).

    Why this exists: materializing the stacked feature operand in XLA is
    store-bound, not flop-bound — the band concats write single sublanes
    into a (16, 128)-tiled bf16 layout, so the ~270 MB frame operand costs
    ~11 ms (vs 8 ms for the whole walk kernel; scripts/stack_sweep.py
    SRT_SWEEP_HOIST A/B + scripts/feat_probe.py, where the isolated
    "stacked" probe is cheap only because summing a concat lets XLA elide
    the materialization).  The 8-row o/d operand is 16x smaller, writes
    full 8-sublane f32 tiles, and the kernel rebuilds features + the bf16
    band stack per tile in VMEM (~30 VPU ops on [*, tile] rows).  Row 6 is
    the constant-1 feature row; row 7 pads the sublane tile."""
    o, d, R = pad_rays(o, d, tile)
    n = o.shape[0] // tile
    ot = o.reshape(n, tile, 3)
    dt = d.reshape(n, tile, 3)
    one = jnp.ones((n, tile), o.dtype)
    OD = jnp.stack([ot[:, :, 0], ot[:, :, 1], ot[:, :, 2],
                    dt[:, :, 0], dt[:, :, 1], dt[:, :, 2],
                    one, jnp.zeros((n, tile), o.dtype)], axis=1)
    return OD, n, R


def _split3_k(x):
    """In-kernel f32 -> (h, m, l) bf16 split (same math as _split3).
    Mosaic does not fold the f32->bf16->f32 residual (the round-2/3
    excess-precision trap is an XLA-outside-Pallas behavior), so the
    down-casts need no barriers on hardware; interpret mode (CPU tests)
    runs the kernel through XLA and keeps the barriers."""
    if _interpret():
        return _split3(x)
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _stack_bands(F10, prec: str, parts: int, TILE_R: int):
    """Feature rows [10, T] -> the walk operand (shared tail of the
    in-kernel feature builders): the K-stacked bf16 band stack for
    prec="stack", the 16-row f32 block otherwise."""
    if prec != "stack":
        return jnp.concatenate(
            [F10, jnp.zeros((F_DIM - 10, TILE_R), F10.dtype)], axis=0)
    from ..accel.prepared import STACK_PATTERNS
    h, m, l = _split3_k(F10)
    part = {"h": h, "m": m, "l": l}
    Fs = jnp.concatenate([part[fp] for (_gp, fp) in STACK_PATTERNS[parts]],
                         axis=0)
    rows = -(-(10 * parts) // 16) * 16
    pad = rows - 10 * parts
    if pad:
        Fs = jnp.concatenate(
            [Fs, jnp.zeros((pad, TILE_R), Fs.dtype)], axis=0)
    return Fs


def _build_feats(OD, prec: str, parts: int, TILE_R: int):
    """Kernel preamble: OD rows [8, T] (see :func:`ray_tile_od`) -> the walk
    operand — the K-stacked bf16 band stack for prec="stack" (bit-matching
    ray_tile_features_stacked up to mul/sub fusion) or the 16-row f32
    feature block otherwise (matching ray_tile_features_t)."""
    ox, oy, oz = OD[0:1], OD[1:2], OD[2:3]
    dx, dy, dz = OD[3:4], OD[4:5], OD[5:6]
    one = OD[6:7]
    cx = oy * dz - oz * dy
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx
    F10 = jnp.concatenate([dx, dy, dz, cx, cy, cz, ox, oy, oz, one], axis=0)
    return _stack_bands(F10, prec, parts, TILE_R)


# --- iota ray features -------------------------------------------------------
# For PRIMARY rays the per-step [8, T] OD block is redundant: the whole ray
# stream is an affine function of the pixel grid.  Tile-major generation
# (ops/camera.py:primary_rays_tiled) maps lane l of tile (program_id) to
# pixel (px0 + l % tpx, py0 + l // tpx), and
#     d = (i, j, focal) @ V[:3, :3]^T,   o = V[:3, 3]   (or identity view)
# so every feature row is  fx * A + fy * B + C  with per-frame constant
# rows A/B/C.  The kernel rebuilds F10 from a lane iota + a [16, T]
# constant-row operand (make_cam below) and the per-tile integer pixel
# origin carried in plan aux slots 4/5 — deleting the per-step ray DMA,
# which the round-4 probes put at ~40% of an empty walk's cost
# (scripts/fixed_probe2.py: blocked-OD io 6.54 -> no-input 4.68 ms/frame).
# Bit-exactness: with view=None the rebuilt d rows are exactly
# (i, j, focal) (mul by 1/add of 0 are exact) and o rows are exactly 0, so
# features match ray_tile_od -> _build_feats bit-for-bit; with a view
# matrix the dot-product rounding differs from XLA's [R,3]@[3,3] matmul in
# the last ulp — within the stack emulation's error budget (~2^-26
# mass-relative), and the golden/turntable checksums gate it on hardware.
CAM_ROWS = 16


def make_cam(view_matrix, focal: float, width: int, height: int,
             tile_px: int, n_tiles: int, tiles_x: int, tile_r: int,
             shade=None, light_pos=None, frame=None):
    """Build the iota-feature operands: (cam [ROWS, tile_r] f32 constant
    rows, tile_xy [n_tiles, 2] i32 pixel origins).

    cam rows: 0-2 = A (dx,dy,dz coefficient of fx), 3-5 = B (of fy),
    6-8 = C (constant term), 9-11 = origin o, 12 = ones, 13-15 = light
    position (fused shading only; zeros otherwise).  With ``shade`` =
    (light_pos [3], light_color [3], obj_color [O,3], obj_ambient [O],
    obj_specular [O], obj_shininess [O]) — the fused-Phong operand — 8
    more rows follow per object: premultiplied diffuse color
    (1/pi * color * light_color, 3), premultiplied specular
    (spec * light_color, 3), ambient strength (1), shininess (1); see
    the fused epilogue in _nearest_kernel_t.
    tile_xy row i = (px0 - W//2, py0 - H//2) for tile i in the row-major
    tile-grid order of primary_rays_tiled."""
    if view_matrix is None:
        A = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        B = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        C = jnp.asarray([0.0, 0.0, float(focal)], jnp.float32)
        o = jnp.zeros((3,), jnp.float32)
    else:
        V = jnp.asarray(view_matrix, jnp.float32)
        A = V[:3, 0]
        B = V[:3, 1]
        C = V[:3, 2] * jnp.float32(focal)
        o = V[:3, 3]
    parts = [A, B, C, o, jnp.ones((1,), jnp.float32)]
    if shade is None:
        # rows 13-15: the light when a caller needs it in-kernel without
        # the material rows (the from-t shadow walk), zeros otherwise
        parts.append(jnp.zeros((3,), jnp.float32) if light_pos is None
                     else jnp.asarray(light_pos, jnp.float32))
    else:
        light_pos, light_color, oc, oa, osp, osh = shade
        inv_pi = jnp.float32(1.0 / jnp.pi)
        lc = jnp.asarray(light_color, jnp.float32)
        parts.append(jnp.asarray(light_pos, jnp.float32))
        O = oc.shape[0]
        for k in range(O):
            parts.append(inv_pi * oc[k] * lc)           # pc [3]
            parts.append(osp[k] * lc)                   # sc [3]
            parts.append(oa[k][None])                   # amb [1]
            parts.append(osh[k][None])                  # shin [1]
        if frame is not None:
            # 9 rows at CAM_ROWS + 8*O: the SHARED projective frame
            # (s, v, w) for the fused-shadow EXACT per-group bounds —
            # the epilogue projects each lane's shadow direction in this
            # frame and group-reduces exact (ru, rv, dw) extremes
            # (legacy-tight plans at O(tiles) cost)
            fs, fv, fw = frame
            parts.extend([jnp.asarray(fs, jnp.float32),
                          jnp.asarray(fv, jnp.float32),
                          jnp.asarray(fw, jnp.float32)])
    rows = jnp.concatenate(parts)
    nrows = -(-rows.shape[0] // 8) * 8
    if nrows > rows.shape[0]:
        rows = jnp.concatenate(
            [rows, jnp.zeros((nrows - rows.shape[0],), jnp.float32)])
    cam = jnp.broadcast_to(rows[:, None], (rows.shape[0], tile_r))
    ti = jnp.arange(n_tiles, dtype=jnp.int32)
    px0 = (ti % tiles_x) * tile_px - (width // 2)
    py0 = (ti // tiles_x) * tile_px - (height // 2)
    return cam, jnp.stack([px0, py0], axis=-1)


def analytic_tile_bounds(cam_spec, n: int):
    """O(tiles) per-tile cull bounds for affine primary-ray bundles.

    The cull's per-tile ray reductions are O(R): o/d min/max for the
    interval test, and the projective (ru, rv, dw) extremes for the px
    test.  For tile-major primary rays both are EXACT at the tile's 4
    pixel-rect corners — d is affine in (px, py), and the central
    projection maps the rect to a quad whose vertices are the corner
    images (valid whenever dw > 0 across the rect, which the affine dw's
    corner minimum certifies).  Returns the dict consumed by
    tiled.cull_blocks_lists(ab=...): interval bounds (omin/omax/
    dmin/dmax [n,3]) + the px-frame data (s, v, w, apex, ru/rv bounds,
    tile_bad, dw_hi) mirroring _visibility_px's conservative handling."""
    vmx, focal, wd, hd, tpx = cam_spec
    tiles_x = -(-wd // tpx)
    ti = jnp.arange(n, dtype=jnp.int32)
    px0 = ((ti % tiles_x) * tpx - (wd // 2)).astype(jnp.float32)
    py0 = ((ti // tiles_x) * tpx - (hd // 2)).astype(jnp.float32)
    e = jnp.float32(tpx - 1)
    fx = jnp.stack([px0, px0 + e, px0, px0 + e], axis=1)        # [n, 4]
    fy = jnp.stack([py0, py0, py0 + e, py0 + e], axis=1)
    if vmx is None:
        dc = jnp.stack([fx, fy, jnp.full_like(fx, jnp.float32(focal))],
                       axis=-1)                                 # [n, 4, 3]
        o = jnp.zeros((3,), jnp.float32)
    else:
        V = jnp.asarray(vmx, jnp.float32)
        dc = (fx[..., None] * V[:3, 0] + fy[..., None] * V[:3, 1]
              + jnp.float32(focal) * V[:3, 2])
        o = V[:3, 3]
    dmin, dmax = dc.min(axis=1), dc.max(axis=1)
    ob = jnp.broadcast_to(o, (n, 3))
    # px projection frame: same construction as tiled._px_frame, seeded by
    # the corner-mean direction (any frame is valid; the test only compares
    # projections of the same rays and blocks in one frame)
    s, v, w = _ray_major._px_frame(dc.reshape(-1, 3))
    BIG = jnp.float32(3.0e38)
    eps = jnp.float32(1e-12)
    dw = dc @ w                                                 # [n, 4]
    bad = dw <= eps
    tile_bad = bad.any(axis=1)
    dws = jnp.maximum(dw, eps)
    ru = (dc @ s) / dws
    rv = (dc @ v) / dws
    return {
        "omin": ob, "omax": ob, "dmin": dmin, "dmax": dmax,
        "s": s, "v": v, "w": w, "apex": o,
        "ru_lo": jnp.where(bad, -BIG, ru).min(axis=1),
        "ru_hi": jnp.where(bad, BIG, ru).max(axis=1),
        "rv_lo": jnp.where(bad, -BIG, rv).min(axis=1),
        "rv_hi": jnp.where(bad, BIG, rv).max(axis=1),
        "tile_bad": tile_bad,
        "dw_hi": jnp.where(bad, 0.0, dw).max(axis=1),
    }


def shadow_frame(prep, light):
    """The SHARED projective frame for the fused-shadow exact bounds:
    any frame is valid (tiled._px_frame contract — the cull only compares
    projections of rays and blocks in ONE frame); seed it with the
    light -> scene-center direction so d.w is sign-definite for almost
    every hit group.  Must be computed ONCE and fed to BOTH the nearest
    kernel (make_cam frame rows) and the plan build
    (analytic_shadow_bounds_exact)."""
    ctr = 0.5 * (jnp.min(prep.block_min, axis=0)
                 + jnp.max(prep.block_max, axis=0))
    return _ray_major._px_frame((ctr - jnp.asarray(light, jnp.float32)
                                 )[None, :])


def analytic_shadow_bounds_exact(bounds, light, frame):
    """O(tiles) cull keys from the kernel's EXACT per-group reductions
    (bounds [n, 15]: box 6, any-hit, obj lo/hi, ru lo/hi, rv lo/hi,
    dw lo/hi — see _nearest_kernel_t want_bounds).  The projective keys
    are the true per-ray extremes (legacy-tight); groups whose dw is not
    sign-definite (or hitless) fall back to an unbounded rect."""
    BIG = jnp.float32(3.0e38)
    eps = jnp.float32(1e-12)
    light = jnp.asarray(light, jnp.float32)
    s, v, w = frame
    ah = bounds[:, 6] > 0.0
    ahc = ah[:, None]
    pmin = jnp.where(ahc, bounds[:, 0:3], 0.0)
    pmax = jnp.where(ahc, bounds[:, 3:6], 0.0)
    ok = ah & ((bounds[:, 13] > eps) | (bounds[:, 14] < -eps))
    okc = ok[:, None]
    ruv = jnp.where(okc, bounds[:, 9:13],
                    jnp.stack([-BIG, BIG, -BIG, BIG])[None])
    return {
        "rev": True,
        "omin": pmin, "omax": pmax,
        "dmin": light - pmax, "dmax": light - pmin,
        "s": s, "v": v, "w": w, "apex": light,
        "ru_lo": ruv[:, 0], "ru_hi": ruv[:, 1],
        "rv_lo": ruv[:, 2], "rv_hi": ruv[:, 3],
    }


# (The round-5 first-cut corner-math bounds builder — hit-point-box
# corners projected per tile — was superseded by the EXACT per-group
# reductions above (analytic_shadow_bounds_exact + the kernel's
# want_bounds keys): box corners measured 16.55 vs 13.84 ms on the
# complex subtile mode because a box spanning a depth discontinuity
# projects to a huge rect.  See git history for the derivation.)

def _build_feats_iota(cam, px0, py0, tpx: int, prec: str, parts: int,
                      TILE_R: int, want_od: bool = False):
    """Kernel preamble for the iota path: per-frame constant rows ``cam``
    [ROWS, T] + the tile's integer pixel origin -> the walk operand (same
    tail as _build_feats).  ``want_od``: also return the raw
    (dx, dy, dz, ox, oy, oz) [1, T] rows for the fused-Phong epilogue."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_R), 1)
    fx = (px0 + lane % tpx).astype(jnp.float32)
    fy = (py0 + lane // tpx).astype(jnp.float32)
    dx = fx * cam[0:1] + fy * cam[3:4] + cam[6:7]
    dy = fx * cam[1:2] + fy * cam[4:5] + cam[7:8]
    dz = fx * cam[2:3] + fy * cam[5:6] + cam[8:9]
    ox, oy, oz = cam[9:10], cam[10:11], cam[11:12]
    cx = oy * dz - oz * dy
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx
    one = cam[12:13]
    F10 = jnp.concatenate([dx, dy, dz, cx, cy, cz, ox, oy, oz, one], axis=0)
    Fs = _stack_bands(F10, prec, parts, TILE_R)
    if want_od:
        return Fs, (dx, dy, dz, ox, oy, oz)
    return Fs


def _build_feats_from_t(cam, tob, px0, py0, tpx: int, prec: str, parts: int,
                        TILE_R: int):
    """Kernel preamble for the FROM-T shadow walk: rebuild this tile's
    shadow rays entirely in VMEM from the nearest pass's t row + the iota
    cam rows — the occlusion query's rays are DATA (origins on surfaces),
    but they are a pure function of (pixel, t, light), so no ray-sized
    operand needs to exist in XLA at all.

      d   = iota-rebuilt primary direction (same math as _build_feats_iota)
      p   = o + t*d                  (t pinned to 0 on miss lanes)
      o'  = p,  d' = light - p       (unnormalized: simple_raytracer.cpp
                                      :325-326; no-max-t handled by the
                                      occlusion predicate)

    ``tob`` [2, T]: row 0 = t (+inf miss), row 1 = winner object id (f32).
    Returns (walk operand, self_obj row [1,T], hit-mask row [1,T])."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_R), 1)
    fx = (px0 + lane % tpx).astype(jnp.float32)
    fy = (py0 + lane // tpx).astype(jnp.float32)
    dx = fx * cam[0:1] + fy * cam[3:4] + cam[6:7]
    dy = fx * cam[1:2] + fy * cam[4:5] + cam[7:8]
    dz = fx * cam[2:3] + fy * cam[5:6] + cam[8:9]
    t = tob[0:1]
    hm = jnp.isfinite(t)
    ts = jnp.where(hm, t, 0.0)
    px = cam[9:10] + ts * dx
    py = cam[10:11] + ts * dy
    pz = cam[11:12] + ts * dz
    sx = cam[13:14] - px
    sy = cam[14:15] - py
    sz = cam[15:16] - pz
    cx = py * sz - pz * sy
    cy = pz * sx - px * sz
    cz = px * sy - py * sx
    one = cam[12:13]
    F10 = jnp.concatenate([sx, sy, sz, cx, cy, cz, px, py, pz, one], axis=0)
    return _stack_bands(F10, prec, parts, TILE_R), tob[1:2], hm


def _fused_phong(cam, od_rows, bt, bidv, acc, n_obj: int,
                 double_sided: bool, specular_nl: bool,
                 attr_mode: int = 0):
    """In-kernel Phong epilogue on [1, T] rows (fused shading for
    flat common-apex scenes; ops/shading.py:phong is the
    oracle, simple_raytracer.cpp:144-200 the reference).

    Inputs: cam constant rows (light at 13-15, per-object material rows
    from 16 — see make_cam), the ray rows from the iota preamble, the
    walk's best (t, id), and the attribute-fetch accumulator ``acc``
    [AR, T] (limb l of attribute a at row l*ATTR_N + a).  Returns
    ([4, T]: pre-tonemap unshadowed RGB + the winner's object id (the
    occlusion pass's self-skip input), the hit-point rows (px, py, pz) —
    the fused-shadow bounds reduction consumes them).  Misses (id -1)
    produce garbage rows that the caller masks — t is pinned to 0 first
    so no inf*0 NaN can leak into a debug_nans run.

    ``attr_mode`` 1 (textured scenes, accel/prepared.py:ATTR_ROWS_TEX
    layout): the base color is a texture the kernel cannot gather, so
    instead of RGB the epilogue emits the color-independent Phong factors
    + the affine-map texel coords evaluated at the hit point:
    [6, T] = (dw = |n.l| + ambient, sw = specular weight, texu, texv,
    obj id, tex id); the XLA finish combines them with the texel gather
    (render_flat_tiled).

    ``attr_mode`` 2 (smooth normals, ATTR_ROWS_SMOOTH layout): rows 0-11
    decode to (cn, obj) and rows 12-38 to the vertex-normal affine map
    An; the normal is normalize(An @ p + cn) — the Ericson interpolation
    of smooth_normal refactored into constants — and the output is the
    plain [4, T] RGB + obj."""
    from ..accel.prepared import ATTR_N
    dx, dy, dz, ox, oy, oz = od_rows
    # exact limb decode (ordered magnitudes; see pack_attr_stacked_np)
    v = [acc[a:a + 1] + acc[ATTR_N + a:ATTR_N + a + 1]
         + acc[2 * ATTR_N + a:2 * ATTR_N + a + 1] for a in range(ATTR_N)]
    nx, ny, nz, objf = v
    t = jnp.where(jnp.isfinite(bt), bt, 0.0)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    if attr_mode == 2:
        # smooth normals: (nx, ny, nz) decoded above are the affine map's
        # CONSTANT term; add An @ p (rows 12-38) and normalize
        an = [acc[12 + a:13 + a] + acc[21 + a:22 + a] + acc[30 + a:31 + a]
              for a in range(9)]
        nx = nx + an[0] * px + an[1] * py + an[2] * pz
        ny = ny + an[3] * px + an[4] * py + an[5] * pz
        nz = nz + an[6] * px + an[7] * py + an[8] * pz
        ni = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                       1e-30))
        nx, ny, nz = nx * ni, ny * ni, nz * ni
    lx = cam[13:14] - px
    ly = cam[14:15] - py
    lz = cam[15:16] - pz
    li = jax.lax.rsqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-30))
    lx, ly, lz = lx * li, ly * li, lz * li
    nl = nx * lx + ny * ly + nz * lz
    nla = jnp.abs(nl) if double_sided else jnp.maximum(nl, 0.0)
    di = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
    vx, vy, vz = -dx * di, -dy * di, -dz * di
    # glm::reflect(-l, n) = -l - 2*(n . -l)*n = -l + 2*nl*n
    rx = -lx + 2.0 * nl * nx
    ry = -ly + 2.0 * nl * ny
    rz = -lz + 2.0 * nl * nz
    rv = jnp.maximum(rx * vx + ry * vy + rz * vz, 0.0)
    # per-object material rows (premultiplied, make_cam): unrolled select
    # (tex mode resolves colors in XLA — only ambient/shininess needed)
    pc = [jnp.zeros_like(nl)] * 3
    sc = [jnp.zeros_like(nl)] * 3
    amb = jnp.zeros_like(nl)
    shin = jnp.zeros_like(nl)
    for k in range(n_obj):
        r0 = CAM_ROWS + 8 * k
        m = objf == jnp.float32(k)
        if attr_mode != 1:
            pc = [jnp.where(m, cam[r0 + c:r0 + c + 1], pc[c])
                  for c in range(3)]
            sc = [jnp.where(m, cam[r0 + 3 + c:r0 + 4 + c], sc[c])
                  for c in range(3)]
        amb = jnp.where(m, cam[r0 + 6:r0 + 7], amb)
        shin = jnp.where(m, cam[r0 + 7:r0 + 8], shin)
    # rv ** shin via exp/log (rv >= 0; 0 ** s = 0 for s > 0).  The
    # shin == 0 branch matches jnp.power / C++ pow: 0 ** 0 = 1 (the
    # integrator and the reference give full specular on back-facing-
    # reflection pixels of a shininess-0 material; exp(0 * log(eps)) = 1
    # covers the rv == 0 corner exactly).  The floor must be a NORMAL f32:
    # the TPU flushes denormals, so max(rv, 1e-38) stayed 0 and
    # 0 * log(0) = NaN poisoned exactly the shin==0, rv==0 pixels.
    pw = jnp.where((rv > 0.0) | (shin == 0.0),
                   jnp.exp(shin * jnp.log(jnp.maximum(rv, 1e-30))), 0.0)
    nl_f = nla if specular_nl else jnp.float32(1.0)
    spec_w = nl_f * pw
    if attr_mode == 1:
        # 3-limb UV affine decode + evaluation at the hit point
        # (pack_attr_tex_stacked_np rows 12-36)
        uv = [acc[12 + a:13 + a] + acc[20 + a:21 + a] + acc[28 + a:29 + a]
              for a in range(8)]
        au0, au1, au2, cu, av0, av1, av2, cv = uv
        texu = au0 * px + au1 * py + au2 * pz + cu
        texv = av0 * px + av1 * py + av2 * pz + cv
        texf = acc[36:37]
        dw = nla + amb
        return (jnp.concatenate([dw, spec_w, texu, texv, objf, texf],
                                axis=0), (px, py, pz))
    rgb = [pc[c] * (nla + amb) + sc[c] * spec_w for c in range(3)]
    return jnp.concatenate(rgb + [objf], axis=0), (px, py, pz)


def _step_quad(Gs, Ft, prec: str):
    """Contract a step's fetched lanes Gs [ROWS_K, ROWS] against the tile's
    ray features in one matmul: [K, ROWS]^T @ [K, TILE_R] -> quad
    [ROWS, TILE_R] (triangles on sublanes — transposed-lhs dot_general,
    native on Mosaic).  For "stack" both operands are prepacked bf16 band
    stacks and the single DEFAULT-precision dot IS the emulated-precision
    contraction (see _MODE)."""
    def dot(a, b, p=None):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p)
    if prec == "stack":
        return dot(Gs, Ft)
    if prec == "tri":
        Gh, Gl = _split_bf16(Gs)
        Fh, Fl = _split_bf16(Ft)
        return dot(Gh, Fh) + dot(Gh, Fl) + dot(Gl, Fh)
    return dot(Gs, Ft,
               {"default": jax.lax.Precision.DEFAULT}.get(
                   prec, jax.lax.Precision.HIGHEST))


# --- VMEM-resident geometry ------------------------------------------------
# The window DMA is DESCRIPTOR-ISSUE bound, not bandwidth bound: the bench
# frame issues ~53k descriptors (~26 windows x 2025 tiles) costing ~24 ms
# against ~2 ms of actual HBM traffic.  When the whole gram_t fits VMEM
# (bunny: 17.9 MB f32; Mosaic accepts >16 MB via
# CompilerParams.vmem_limit_bytes — measured working at 100 MB), the kernel
# takes it as a plain VMEM operand and "fetches" windows with register
# copies off dynamic 128-aligned lane slices: no descriptors, no
# semaphores, no double buffering.  Larger scenes fall back to the DMA
# path automatically.
RES_LIMIT_MB = int(_os.environ.get("SRT_TILED_RESIDENT_MB",
                                   str(_KCFG.resident_mb)))
_VMEM_LIMIT = 110 * 1024 * 1024


def _resident(Gt) -> bool:
    if _os.environ.get("SRT_TILED_RESIDENT", "") == "0":
        return False
    return Gt.size * Gt.dtype.itemsize <= RES_LIMIT_MB * 2 ** 20


def _res_gather(G_res, start, j, BS, WB, KW):
    """One super-step's lanes from the RESIDENT gram ref: KW dynamic
    128-aligned lane slices concatenated in registers -> [F_DIM, ROWS].
    (The index is written s * RPB with RPB a 128-multiple so Mosaic can
    statically prove lane alignment.)"""
    RPB = 4 * BS
    nbw = _nb_total(G_res, BS) - WB
    parts = []
    for k in range(KW):
        s = jnp.clip(start(j * KW + k), 0, nbw)
        parts.append(G_res[:, pl.ds(s * RPB, WB * RPB)])
    return parts[0] if KW == 1 else jnp.concatenate(parts, axis=1)


def _mt_epilogue_t(quad, base, BS, eps):
    """One block's row slice of the step quad -> t [BS, TILE_R] with
    misses=+inf.  Identical math to tiled._mt_epilogue, transposed."""
    det = quad[base:base + BS]
    inv = 1.0 / det
    u = quad[base + BS:base + 2 * BS] * inv
    v = quad[base + 2 * BS:base + 3 * BS] * inv
    t = quad[base + 3 * BS:base + 4 * BS] * inv
    m = jnp.minimum(jnp.minimum(u, v), jnp.minimum(1.0 - (u + v), t))
    valid = (jnp.abs(det) >= eps) & (m >= 0.0)
    return jnp.where(valid, t, jnp.inf)


def _nearest_kernel_t(BS: int, WB: int, eps: float, prec: str,
                      resident: bool, KW: int, fetch: bool, od_parts: int,
                      iota_tpx: int, fused, plan_ref, Ft_ref, G, *rest):
    if fetch:
        At, t_ref, idx_ref, attr_ref, *scratch = rest
    else:
        At = attr_ref = None
        t_ref, idx_ref, *scratch = rest
    i = pl.program_id(0)
    cnt, start, use_list, bound16 = _tile_plan_t(plan_ref, i, WB)
    ns = (cnt + KW - 1) // KW
    od_rows = None
    if iota_tpx:
        cam = Ft_ref[...]                 # [CAM_ROWS+, TILE_R] constant rows
        TILE_R = cam.shape[1]
        Ft = _build_feats_iota(cam, plan_ref[i, 4], plan_ref[i, 5],
                               iota_tpx, prec, od_parts, TILE_R,
                               want_od=fused is not None)
        if fused is not None:
            Ft, od_rows = Ft
    else:
        Ft = Ft_ref[0]                    # [F_DIM, TILE_R] (or OD rows)
        TILE_R = Ft.shape[1]
        if od_parts:
            Ft = _build_feats(Ft, prec, od_parts, TILE_R)
    gbuf, sem_g = scratch if scratch else (None, None)

    if not resident and not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            _win_dma(G, gbuf, sem_g, start, 0, 0, BS, WB, KW)

    def cond(state):
        j, done, best_t, best_i = state
        return (j < ns) & ~done

    def body(state):
        j, _, best_t, best_i = state
        if resident and _SPLIT_MM:
            # per-window matmuls straight off resident slices: no KW-slice
            # concat (the concat materializes a [16, ROWS] copy per step),
            # at the cost of KW MXU issues per step
            row = jax.lax.broadcasted_iota(jnp.int32, (BS, TILE_R), 0)
            nbw = _nb_total(G, BS) - WB
            RPB = 4 * BS
            wdone = jnp.bool_(False)
            for k in range(KW):
                jk = j * KW + k
                s = jnp.clip(start(jk), 0, nbw)
                if _ABLATE == "dma":    # measurement: loop + slices only
                    best_t = jnp.minimum(
                        best_t,
                        G[:BS, pl.ds(s * RPB, TILE_R)].astype(jnp.float32)
                        + 1e30)
                    continue

                def _win(args, s=s):
                    bt, bi = args
                    quad_k = _step_quad(G[:, pl.ds(s * RPB, WB * RPB)],
                                        Ft, prec)
                    if _ABLATE == "matmul":  # measurement: no epilogue
                        return jnp.minimum(bt, quad_k[:BS] + 1e30), bi
                    for b in range(WB):
                        t = _mt_epilogue_t(quad_k, b * 4 * BS, BS, eps)
                        idv = (s + b) * BS + row
                        imp = t < bt
                        bt = jnp.where(imp, t, bt)
                        bi = jnp.where(imp, idv, bi)
                    return bt, bi

                if _WIN_BREAK and not _NO_BREAK:
                    # per-WINDOW front-to-back break (env SRT_WIN_BREAK):
                    # guard each window's matmul+epilogue on the running
                    # break state, refreshed every _WIN_BREAK windows —
                    # the step-level break leaves up to KW-1 windows of
                    # dead work after the confirming window
                    best_t, best_i = jax.lax.cond(
                        (jk < cnt) & ~wdone, _win, lambda a: a,
                        (best_t, best_i))
                    if (k + 1) % _WIN_BREAK == 0 and k + 1 < KW:
                        pr = jnp.min(best_t, axis=0, keepdims=True)
                        wb_bits = jnp.max(jax.lax.shift_right_logical(
                            jax.lax.bitcast_convert_type(pr, jnp.int32),
                            16))
                        wdone = wdone | (use_list
                                         & (wb_bits < bound16(jk + 1)))
                elif _SPLIT_GUARD:
                    best_t, best_i = jax.lax.cond(
                        jk < cnt, _win, lambda a: a, (best_t, best_i))
                else:
                    best_t, best_i = _win((best_t, best_i))
            if _NO_BREAK:
                return j + 1, jnp.bool_(False), best_t, best_i
            per_ray = jnp.min(best_t, axis=0, keepdims=True)
            worst_bits = jnp.max(jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(per_ray, jnp.int32), 16))
            done = use_list & (worst_bits < bound16((j + 1) * KW))
            return j + 1, done, best_t, best_i
        if resident:
            Gs = _res_gather(G, start, j, BS, WB, KW)
        else:
            slot = j % 2 if not _SYNC_DMA else 0
            if _SYNC_DMA:
                _win_dma(G, gbuf, sem_g, start, 0, j, BS, WB, KW)
            else:
                @pl.when(j + 1 < ns)
                def _():
                    _win_dma(G, gbuf, sem_g, start, (j + 1) % 2, j + 1,
                             BS, WB, KW)
            _win_wait(G, gbuf, sem_g, start, slot, j, BS, WB, KW)
            Gs = gbuf[slot]
        if _ABLATE == "dma":            # measurement only: skip all compute
            best_t = jnp.minimum(best_t, Gs[:1, :TILE_R] + 1e30)
            return j + 1, jnp.bool_(False), best_t, best_i
        quad = _step_quad(Gs, Ft, prec)                  # [ROWS, TILE_R]
        if _ABLATE == "matmul":         # measurement only: skip epilogue
            best_t = jnp.minimum(best_t, quad[:BS] + 1e30)
            return j + 1, jnp.bool_(False), best_t, best_i
        # fully elementwise per block: [BS, TILE_R] accumulators, the
        # argmin lane/sublane reductions deferred to after the loop.
        # Clamped duplicate windows fold idempotently.
        row = jax.lax.broadcasted_iota(jnp.int32, (BS, TILE_R), 0)
        nbw = _nb_total(G, BS) - WB
        for k in range(KW):
            s = jnp.clip(start(j * KW + k), 0, nbw)
            for b in range(WB):
                t = _mt_epilogue_t(quad, (k * WB + b) * 4 * BS, BS, eps)
                idv = (s + b) * BS + row
                imp = t < best_t
                best_t = jnp.where(imp, t, best_t)
                best_i = jnp.where(imp, idv, best_i)
        if _NO_BREAK:
            done = jnp.bool_(False)
        else:
            # front-to-back break (see tiled._nearest_kernel): per-ray best
            # is a cheap cross-SUBLANE min; the one cross-lane reduction per
            # step is the max, compared in int space.
            per_ray = jnp.min(best_t, axis=0, keepdims=True)   # [1, TILE_R]
            worst_bits = jnp.max(jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(per_ray, jnp.int32), 16))
            done = use_list & (worst_bits < bound16((j + 1) * KW))
        return j + 1, done, best_t, best_i

    init = (jnp.int32(0), jnp.bool_(False),
            jnp.full((BS, TILE_R), jnp.inf, jnp.float32),
            jnp.full((BS, TILE_R), -1, jnp.int32))
    j_end, _, tv, iv = jax.lax.while_loop(cond, body, init)

    if not resident and not _SYNC_DMA:
        @pl.when(j_end < ns)
        def _():
            _win_wait(G, gbuf, sem_g, start, j_end % 2, j_end, BS, WB, KW)

    bt = jnp.min(tv, axis=0, keepdims=True)              # [1, TILE_R]
    bid = jnp.min(jnp.where(tv == bt, iv, jnp.int32(0x7FFFFFFF)),
                  axis=0, keepdims=True)
    t_ref[0] = bt
    bidv = jnp.where(jnp.isfinite(bt), bid, -1)
    idx_ref[0] = bidv

    if fetch:
        # post-walk shade-attribute fetch: re-walk the (short, projective)
        # window list once, one-hot the winner against the resident attr
        # operand on the MXU.  EXACT transport: exactly one nonzero bf16*1
        # product per ray per limb row, f32-accumulated, and the packed
        # limbs sum back to the f32 attribute exactly (accel/prepared.py:
        # pack_attr_stacked_np).  Replaces the ~10 ms/frame [R, K] XLA
        # record gather for flat-untextured scenes.
        AR = At.shape[0]
        RPB = 4 * BS
        WL = WB * RPB
        nbw = _nb_total(G, BS) - WB
        lane = jax.lax.broadcasted_iota(jnp.int32, (WL, TILE_R), 0)
        det_lane = (lane % RPB) // BS == 0
        rowl = lane % BS
        blkl = lane // RPB
        # winner-id range of this tile: BVH-preordered ids are spatially
        # coherent, so the tile's winners cluster in a FEW of the walked
        # windows — windows disjoint from [wid_lo, wid_hi] contribute an
        # all-zero one-hot and are skipped wholesale (their [WL, T]
        # compare + bf16 matmul was most of the fetch cost)
        hitl = bidv >= 0
        wid_lo = jnp.min(jnp.where(hitl, bidv, jnp.int32(0x7FFFFFFF)))
        wid_hi = jnp.max(jnp.where(hitl, bidv, jnp.int32(-1)))

        def fcond(st):
            j, acc = st
            # the re-walk stops at the MAIN walk's break step, not the
            # full list: the front-to-back break certifies no window at
            # step >= j_end can beat any lane's best_t, so the winner is
            # always inside the first j_end steps (round 5; the full-list
            # re-walk cost the bunny ~1.4 ms/frame of dead fetch matmuls)
            return j < j_end

        def fbody(st):
            j, acc = st
            for k in range(KW):
                jk = j * KW + k
                s = jnp.clip(start(jk), 0, nbw)

                def _fetch(a, s=s):
                    tri0 = (s + blkl) * BS + rowl
                    oh = (det_lane & (tri0 == bidv)).astype(jnp.bfloat16)
                    As = At[:, pl.ds(s * RPB, WL)]       # [AR, WL]
                    return a + jax.lax.dot_general(
                        As, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                # jk < cnt guard: padded steps clamp to a REPEATED window —
                # idempotent for the min-walk, but the fetch ACCUMULATES
                pred = ((jk < cnt) & ((s + WB) * BS > wid_lo)
                        & (s * BS <= wid_hi))
                acc = jax.lax.cond(pred, _fetch, lambda a: a, acc)
            return j + 1, acc

        _, attrs = jax.lax.while_loop(
            fcond, fbody, (jnp.int32(0),
                           jnp.zeros((AR, TILE_R), jnp.float32)))
        if fused is not None:
            n_obj, dbl, snl, want_bounds, attr_mode = fused
            out, prow = _fused_phong(cam, od_rows, bt, bidv, attrs,
                                     n_obj, dbl, snl, attr_mode)
            if want_bounds:
                # per-SUBTILE hit-point bounds row (the fused-shadow
                # path's O(tiles) cull input — see analytic_shadow_bounds
                # / anyhit_from_t): for each of the G = tile // stile
                # contiguous lane groups (a group = stile rays = whole
                # pixel rows of the tile), lanes g*16+k carry k in 0-5 =
                # hit-point box, 6 = any-hit, 7-8 = winner-object min/max
                # (purity -> plan-time self-object exclusion).  Masked
                # cross-lane reductions over HIT lanes of the group; a
                # few dozen VPU ops per tile replace every ray-sized XLA
                # reduction the legacy shadow cull paid (measured 2.3
                # ms/frame of O(R) cull glue on the complex scene).
                px_r, py_r, pz_r = prow
                hm = jnp.isfinite(bt)
                INF = jnp.float32(jnp.inf)
                objf = out[4:5] if attr_mode == 1 else out[3:4]
                T_R = out.shape[1]
                G = want_bounds if isinstance(want_bounds, int) else 1
                G = max(G, 1)
                stile_b = T_R // G
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, T_R), 1)
                # EXACT per-lane projective shadow keys in the shared
                # frame (cam rows CAM_ROWS + 8*n_obj, make_cam(frame=)):
                # d = light - p, dw = d.w, (ru, rv) = (d.s, d.v)/dw.
                # Box-corner bounds were measured too loose across depth
                # discontinuities (complex subtile mode 16.55 vs 13.84
                # legacy); group-reducing the true extremes restores
                # legacy-tight plans at O(tiles) cost.
                r0f = CAM_ROWS + 8 * n_obj
                dux = cam[13:14] - px_r
                duy = cam[14:15] - py_r
                duz = cam[15:16] - pz_r
                dwl = (dux * cam[r0f + 6:r0f + 7]
                       + duy * cam[r0f + 7:r0f + 8]
                       + duz * cam[r0f + 8:r0f + 9])
                dsl = (dux * cam[r0f + 0:r0f + 1]
                       + duy * cam[r0f + 1:r0f + 2]
                       + duz * cam[r0f + 2:r0f + 3])
                dvl = (dux * cam[r0f + 3:r0f + 4]
                       + duy * cam[r0f + 4:r0f + 5]
                       + duz * cam[r0f + 5:r0f + 6])
                dws = jnp.where(jnp.abs(dwl) > 1e-12, dwl,
                                jnp.float32(1e-12))
                rul = dsl / dws
                rvl = dvl / dws
                brow = jnp.zeros((1, T_R), jnp.float32)
                for g in range(G):
                    gm = hm & (lane // stile_b == g)

                    def mmin(x, gm=gm):
                        return jnp.min(jnp.where(gm, x, INF))

                    def mmax(x, gm=gm):
                        return jnp.max(jnp.where(gm, x, -INF))
                    vals = [mmin(px_r), mmin(py_r), mmin(pz_r),
                            mmax(px_r), mmax(py_r), mmax(pz_r),
                            jnp.max(jnp.where(gm, 1.0, 0.0)),
                            mmin(objf), mmax(objf),
                            mmin(rul), mmax(rul), mmin(rvl), mmax(rvl),
                            mmin(dwl), mmax(dwl)]
                    for k, vv in enumerate(vals):
                        brow = jnp.where(lane == g * 16 + k, vv, brow)
                out = jnp.concatenate([out, brow], axis=0)
            attr_ref[0] = out
        else:
            attr_ref[0] = attrs


def _nearest_kernel_g(BS: int, WB: int, eps: float, prec: str,
                      resident: bool, KW: int, groups: int, plan_ref,
                      Ft_ref, G, t_ref, idx_ref, t_acc, i_acc, *scratch):
    """Sub-group variant of _nearest_kernel_t: the tile's TILE_R rays are
    split into ``groups`` contiguous lane groups (tile/G each).  Every plan
    entry carries a G-bit sub-group visibility mask
    (tiled.cull_blocks_lists(groups=...)); a super-step runs its matmul
    ONLY for groups with a set bit among the step's KW windows, and the
    front-to-back early break is tracked PER GROUP — so one deep silhouette
    region no longer drags the other 3/4 of the tile through its list.
    Window DMA, plan and grid structure are shared with the ungrouped
    kernel (same descriptor count).  Accumulators live in VMEM scratch
    (loop carries cannot be updated under pl.when)."""
    i = pl.program_id(0)
    cnt, start, use_list, bound16, gmask = _tile_plan_t(plan_ref, i, WB,
                                                        groups)
    ns = (cnt + KW - 1) // KW
    Ft = Ft_ref[0]                                       # [F_DIM, TILE_R]
    TILE_R = Ft.shape[1]
    GR = TILE_R // groups
    FULL = (1 << groups) - 1
    gbuf, sem_g = scratch if scratch else (None, None)

    t_acc[...] = jnp.full((BS, TILE_R), jnp.inf, jnp.float32)
    i_acc[...] = jnp.full((BS, TILE_R), -1, jnp.int32)

    if not resident and not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            _win_dma(G, gbuf, sem_g, start, 0, 0, BS, WB, KW)

    def cond(state):
        j, done = state
        return (j < ns) & (done != FULL)

    def body(state):
        j, done = state
        # OR of the step's KW window masks, per group (scalar)
        m_step = gmask(j * KW)
        for k in range(1, KW):
            m_step = m_step | jnp.where(j * KW + k < cnt,
                                        gmask(j * KW + k), 0)
        need = m_step & ~done & FULL
        if resident:
            Gs = _res_gather(G, start, j, BS, WB, KW)
        else:
            slot = j % 2 if not _SYNC_DMA else 0
            if _SYNC_DMA:
                _win_dma(G, gbuf, sem_g, start, 0, j, BS, WB, KW)
            else:
                @pl.when(j + 1 < ns)
                def _():
                    _win_dma(G, gbuf, sem_g, start, (j + 1) % 2, j + 1,
                             BS, WB, KW)
            _win_wait(G, gbuf, sem_g, start, slot, j, BS, WB, KW)
            Gs = gbuf[slot]
        row = jax.lax.broadcasted_iota(jnp.int32, (BS, GR), 0)
        nbw = _nb_total(G, BS) - WB
        for g in range(groups):
            @pl.when((need & (1 << g)) != 0)
            def _(g=g):
                quad = _step_quad(Gs, Ft[:, g * GR:(g + 1) * GR], prec)
                bt = t_acc[:, g * GR:(g + 1) * GR]
                bi = i_acc[:, g * GR:(g + 1) * GR]
                for k in range(KW):
                    s = jnp.clip(start(j * KW + k), 0, nbw)
                    for b in range(WB):
                        t = _mt_epilogue_t(quad, (k * WB + b) * 4 * BS,
                                           BS, eps)
                        idv = (s + b) * BS + row
                        imp = t < bt
                        bt = jnp.where(imp, t, bt)
                        bi = jnp.where(imp, idv, bi)
                t_acc[:, g * GR:(g + 1) * GR] = bt
                i_acc[:, g * GR:(g + 1) * GR] = bi
        if _NO_BREAK:
            return j + 1, done
        nb16 = bound16((j + 1) * KW)
        for g in range(groups):
            per_ray = jnp.min(t_acc[:, g * GR:(g + 1) * GR], axis=0,
                              keepdims=True)
            worst_bits = jnp.max(jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(per_ray, jnp.int32), 16))
            nd = use_list & (worst_bits < nb16)
            done = done | jnp.where(nd, 1 << g, 0)
        return j + 1, done

    init = (jnp.int32(0), jnp.int32(0))
    j_end, _ = jax.lax.while_loop(cond, body, init)

    if not resident and not _SYNC_DMA:
        @pl.when(j_end < ns)
        def _():
            _win_wait(G, gbuf, sem_g, start, j_end % 2, j_end, BS, WB, KW)

    tv = t_acc[...]
    iv = i_acc[...]
    bt = jnp.min(tv, axis=0, keepdims=True)              # [1, TILE_R]
    bid = jnp.min(jnp.where(tv == bt, iv, jnp.int32(0x7FFFFFFF)),
                  axis=0, keepdims=True)
    t_ref[0] = bt
    idx_ref[0] = jnp.where(jnp.isfinite(bt), bid, -1)


def _prepass_kernel_t(BS: int, WB: int, eps: float, resident: bool,
                      plan_ref, Ft_ref, G_in, flags_ref, *scratch):
    """bf16 classification pass (see PREPASS_M): walks the SAME plan as the
    nearest kernel with a DEFAULT-precision contraction and writes a 0/1
    flag per plan position — 1 iff that window could contain the nearest
    hit of ANY ray of the tile under sound bf16 error bounds."""
    i = pl.program_id(0)
    KW = _kw(BS, WB)
    cnt, start, use_list, bound16 = _tile_plan_t(plan_ref, i, WB)
    ns = (cnt + KW - 1) // KW
    Ft = Ft_ref[0]                                       # [F_DIM, TILE_R]
    TILE_R = Ft.shape[1]
    # Hölder majorant of the per-(triangle-scalar, ray) product mass:
    # sum_k |G_kx||F_kr| <= sum_k |G_kx| * alpha_k  for every ray r of the
    # tile.  alpha is ONE cheap cross-lane max per tile; the sum lands on
    # SUBLANES via the matvec in the body (so it broadcasts against quad).
    alpha = jnp.max(jnp.abs(Ft), axis=1, keepdims=True)  # [F_DIM, 1]
    FW = flags_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, FW), 1)
    gbuf, sem_g = scratch if scratch else (None, None)

    if not resident and not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            _win_dma(G_in, gbuf, sem_g, start, 0, 0, BS, WB, KW)

    def cond(state):
        j, done, best_hi, flags = state
        return (j < ns) & ~done

    def body(state):
        j, _, best_hi, flags = state
        if resident:
            G = _res_gather(G_in, start, j, BS, WB, KW)
        else:
            slot = j % 2 if not _SYNC_DMA else 0
            if _SYNC_DMA:
                _win_dma(G_in, gbuf, sem_g, start, 0, j, BS, WB, KW)
            else:
                @pl.when(j + 1 < ns)
                def _():
                    _win_dma(G_in, gbuf, sem_g, start, (j + 1) % 2, j + 1,
                             BS, WB, KW)
            _win_wait(G_in, gbuf, sem_g, start, slot, j, BS, WB, KW)
            G = gbuf[slot]
        quad = jax.lax.dot_general(
            G, Ft, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)         # [ROWS, TILE_R]
        err = PREPASS_M * jax.lax.dot_general(
            jnp.abs(G), alpha, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)         # [ROWS, 1]
        # flag candidates against the per-STEP bound (stale by one step —
        # larger, so conservative) to keep the VPU epilogue lean: one
        # cross-sublane reduce per step instead of per block
        bh_ray = jnp.min(best_hi, axis=0, keepdims=True)  # [1, TILE_R]
        for k in range(KW):
            wflag = jnp.zeros((1, TILE_R), jnp.float32)
            for b in range(WB):
                base = (k * WB + b) * 4 * BS
                det = quad[base:base + BS]
                eD = err[base:base + BS]
                eU = err[base + BS:base + 2 * BS]
                eV = err[base + 2 * BS:base + 3 * BS]
                eT = err[base + 3 * BS:base + 4 * BS]
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                adet = det * sgn
                un = quad[base + BS:base + 2 * BS] * sgn
                vn = quad[base + 2 * BS:base + 3 * BS] * sgn
                tn = quad[base + 3 * BS:base + 4 * BS] * sgn
                uL, uH = un - eU, un + eU
                vL, vH = vn - eV, vn + eV
                tL, tH = tn - eT, tn + eT
                aL, aH = adet - eD, adet + eD
                # confident-valid: every MT test holds for ANY true value in
                # the error interval -> its t UPPER bound caps the nearest t
                conf_m = jnp.minimum(
                    jnp.minimum(uL, vL),
                    jnp.minimum(aL - (uH + vH),
                                jnp.minimum(tL, aL - eps)))
                conf = conf_m >= 0.0
                t_hi = tH / jnp.maximum(aL, 1e-30)
                best_hi = jnp.where(conf & (t_hi < best_hi), t_hi, best_hi)
                # maybe-valid: SOME value in the interval passes every test
                # (sign-uncertain dets are unconditionally maybe); candidate
                # iff its t LOWER bound beats the step bound (mult form —
                # no second division)
                mb_m = jnp.minimum(
                    jnp.minimum(uH, vH),
                    jnp.minimum(aH - (uL + vL),
                                jnp.minimum(tH, aH - eps)))
                sc = adet > eD
                cand = ((mb_m >= 0.0) &
                        (jnp.maximum(tL, 0.0) <= bh_ray * aH)) | \
                    (~sc & (aH >= eps))
                wflag = jnp.maximum(wflag, jnp.max(
                    jnp.where(cand, 1.0, 0.0), axis=0, keepdims=True))
            fs = jnp.max(wflag)                          # scalar, per window
            flags = jnp.maximum(flags, jnp.where(lane == j * KW + k, fs, 0.0))
        if _NO_BREAK:
            done = jnp.bool_(False)
        else:
            # sound front-to-back break: best_hi >= true nearest t, so any
            # window whose conservative entry bound beats EVERY ray's best_hi
            # can contain neither the winner nor a tie
            per_ray = jnp.min(best_hi, axis=0, keepdims=True)
            worst_bits = jnp.max(jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(per_ray, jnp.int32), 16))
            done = use_list & (worst_bits < bound16((j + 1) * KW))
        return j + 1, done, best_hi, flags

    init = (jnp.int32(0), jnp.bool_(False),
            jnp.full((BS, TILE_R), jnp.inf, jnp.float32),
            jnp.zeros((1, FW), jnp.float32))
    j_end, _, _, flags = jax.lax.while_loop(cond, body, init)

    if not resident and not _SYNC_DMA:
        @pl.when(j_end < ns)
        def _():
            _win_wait(G_in, gbuf, sem_g, start, j_end % 2, j_end, BS, WB, KW)

    flags_ref[0] = flags


def _anyhit_kernel_t(BS: int, WB: int, eps: float, no_max_t: bool, prec: str,
                     resident: bool, KW: int, od_parts: int, from_t_tpx: int,
                     plan_ref, bobj_ref, Ft_ref, self_ref, G_in, hit_ref,
                     *scratch):
    """Occlusion: ANY valid hit on a DIFFERENT object (reference quirks:
    no max-t, self-object skip — simple_raytracer.cpp:321-342).  Division-
    free MT predicate on the numerators; the self-object test is ONE
    scalar compare per block (``bobj_ref`` SMEM, blocks are single-object
    by construction — accel/prepared.py per-object page padding).  ``KW``
    comes from the wrapper (resident scenes use the fatter SUPER_ROWS_AH
    step — the walk is matmul-issue bound and has no break to protect).

    ``from_t_tpx`` != 0 (the fused-shadow path): Ft_ref carries the iota
    cam rows and self_ref the [2, T] (t, winner-object) block; the shadow
    rays are rebuilt in VMEM (_build_feats_from_t) and MISS lanes start
    found=1 so they never block the all-occluded early exit (their result
    is masked by the caller; the legacy path achieved the same by
    repairing miss origins to a same-tile hit point)."""
    i = pl.program_id(0)
    cnt, start, use_list, _b16 = _tile_plan_t(plan_ref, i, WB)
    ns = (cnt + KW - 1) // KW
    found_init = None
    if from_t_tpx:
        cam = Ft_ref[...]
        TILE_R = cam.shape[1]
        Ft, self_obj, hm = _build_feats_from_t(
            cam, self_ref[0], plan_ref[i, 4], plan_ref[i, 5], from_t_tpx,
            prec, od_parts, TILE_R)
        found_init = jnp.where(hm, 0.0, 1.0)
    else:
        Ft = Ft_ref[0]
        TILE_R = Ft.shape[1]
        if od_parts:
            Ft = _build_feats(Ft, prec, od_parts, TILE_R)
        self_obj = self_ref[0]                           # [1, TILE_R] f32
    gbuf, sem_g = scratch if scratch else (None, None)

    if not resident and not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            _win_dma(G_in, gbuf, sem_g, start, 0, 0, BS, WB, KW)

    def cond(state):
        j, found, done = state
        return (j < ns) & ~done

    def _occ_block(quad, base, s, b):
        det = quad[base:base + BS]
        u_num = quad[base + BS:base + 2 * BS]
        v_num = quad[base + 2 * BS:base + 3 * BS]
        t_num = quad[base + 3 * BS:base + 4 * BS]
        adet = jnp.abs(det)
        occ = (adet >= eps) & \
            (u_num * det >= 0.0) & (jnp.abs(u_num) <= adet) & \
            (v_num * det >= 0.0) & \
            (jnp.abs(u_num + v_num) <= adet) & \
            (t_num * det >= 0.0)
        if not no_max_t:
            occ = occ & (jnp.abs(t_num) <= adet)
        # scalar per-block self-object skip (blocks are pure)
        obj_s = bobj_ref[s + b].astype(jnp.float32)
        return occ & (obj_s != self_obj)

    def body(state):
        j, found, _ = state
        nbw = _nb_total(G_in, BS) - WB
        occ_vec = jnp.zeros((BS, TILE_R), jnp.float32)
        if resident and _SPLIT_MM_AH:
            # per-window contraction off resident slices (no KW concat —
            # see _nearest_kernel_t)
            RPB = 4 * BS
            for k in range(KW):
                jk = j * KW + k
                s = jnp.clip(start(jk), 0, nbw)
                if _ABLATE == "dma":    # measurement only: loop+slice cost
                    Gw = G_in[:, pl.ds(s * RPB, WB * RPB)]
                    occ_vec = jnp.maximum(
                        occ_vec, jnp.where(Gw[:1, :TILE_R] > 1e30, 1.0, 0.0))
                    continue

                def _win(ov, s=s):
                    quad_k = _step_quad(G_in[:, pl.ds(s * RPB, WB * RPB)],
                                        Ft, prec)
                    if _ABLATE == "matmul":  # measurement: skip predicate
                        return jnp.maximum(
                            ov, jnp.where(quad_k[:BS] > 1e30, 1.0, 0.0))
                    for b in range(WB):
                        occ = _occ_block(quad_k, b * 4 * BS, s, b)
                        ov = jnp.maximum(ov, jnp.where(occ, 1.0, 0.0))
                    return ov

                if _SPLIT_GUARD:
                    occ_vec = jax.lax.cond(
                        jk < cnt, _win, lambda v: v, occ_vec)
                else:
                    occ_vec = _win(occ_vec)
        else:
            if resident:
                Gs = _res_gather(G_in, start, j, BS, WB, KW)
            else:
                slot = j % 2 if not _SYNC_DMA else 0
                if _SYNC_DMA:
                    _win_dma(G_in, gbuf, sem_g, start, 0, j, BS, WB, KW)
                else:
                    @pl.when(j + 1 < ns)
                    def _():
                        _win_dma(G_in, gbuf, sem_g, start, (j + 1) % 2,
                                 j + 1, BS, WB, KW)
                _win_wait(G_in, gbuf, sem_g, start, slot, j, BS, WB, KW)
                Gs = gbuf[slot]
            quad = _step_quad(Gs, Ft, prec)              # [ROWS, TILE_R]
            for k in range(KW):
                s = jnp.clip(start(j * KW + k), 0, nbw)  # same clamp as DMA
                for b in range(WB):
                    occ = _occ_block(quad, (k * WB + b) * 4 * BS, s, b)
                    occ_vec = jnp.maximum(occ_vec,
                                          jnp.where(occ, 1.0, 0.0))
        occ1 = jnp.max(occ_vec, axis=0, keepdims=True)   # [1, TILE_R]
        found = jnp.maximum(found, occ1)
        return j + 1, found, jnp.min(found) > 0.0

    init = (jnp.int32(0),
            jnp.zeros((1, TILE_R), jnp.float32) if found_init is None
            else found_init,
            jnp.bool_(False))
    j_end, found, _ = jax.lax.while_loop(cond, body, init)

    if not resident and not _SYNC_DMA:
        @pl.when(j_end < ns)
        def _():
            _win_wait(G_in, gbuf, sem_g, start, j_end % 2, j_end, BS, WB, KW)

    hit_ref[0] = (found > 0.0).astype(jnp.int32)


def _anyhit_kernel_g(BS: int, WB: int, eps: float, no_max_t: bool, prec: str,
                     resident: bool, KW: int, groups: int, plan_ref,
                     bobj_ref, Ft_ref, self_ref, G_in, hit_ref, f_acc,
                     *scratch):
    """Sub-group variant of _anyhit_kernel_t (see _nearest_kernel_g): each
    256-ray sub-group skips masked-out windows and exits as soon as ITS
    rays are all occluded — one lit ray no longer drags the whole tile
    through the canopy.  DMA and plan stay at tile granularity."""
    i = pl.program_id(0)
    cnt, start, use_list, _b16, gmask = _tile_plan_t(plan_ref, i, WB, groups)
    ns = (cnt + KW - 1) // KW
    Ft = Ft_ref[0]
    TILE_R = Ft.shape[1]
    GR = TILE_R // groups
    FULL = (1 << groups) - 1
    self_obj = self_ref[0]                               # [1, TILE_R] f32
    gbuf, sem_g = scratch if scratch else (None, None)

    f_acc[...] = jnp.zeros((1, TILE_R), jnp.float32)

    if not resident and not _SYNC_DMA:
        @pl.when(ns > 0)
        def _():
            _win_dma(G_in, gbuf, sem_g, start, 0, 0, BS, WB, KW)

    def cond(state):
        j, done = state
        return (j < ns) & (done != FULL)

    def body(state):
        j, done = state
        m_step = gmask(j * KW)
        for k in range(1, KW):
            m_step = m_step | jnp.where(j * KW + k < cnt,
                                        gmask(j * KW + k), 0)
        need = m_step & ~done & FULL
        if resident:
            Gs = _res_gather(G_in, start, j, BS, WB, KW)
        else:
            slot = j % 2 if not _SYNC_DMA else 0
            if _SYNC_DMA:
                _win_dma(G_in, gbuf, sem_g, start, 0, j, BS, WB, KW)
            else:
                @pl.when(j + 1 < ns)
                def _():
                    _win_dma(G_in, gbuf, sem_g, start, (j + 1) % 2, j + 1,
                             BS, WB, KW)
            _win_wait(G_in, gbuf, sem_g, start, slot, j, BS, WB, KW)
            Gs = gbuf[slot]
        nbw = _nb_total(G_in, BS) - WB
        for g in range(groups):
            @pl.when((need & (1 << g)) != 0)
            def _(g=g):
                sl = slice(g * GR, (g + 1) * GR)
                quad = _step_quad(Gs, Ft[:, sl], prec)
                so_g = self_obj[:, sl]
                occ_vec = jnp.zeros((BS, GR), jnp.float32)
                for k in range(KW):
                    s = jnp.clip(start(j * KW + k), 0, nbw)
                    for b in range(WB):
                        base = (k * WB + b) * 4 * BS
                        det = quad[base:base + BS]
                        u_num = quad[base + BS:base + 2 * BS]
                        v_num = quad[base + 2 * BS:base + 3 * BS]
                        t_num = quad[base + 3 * BS:base + 4 * BS]
                        adet = jnp.abs(det)
                        occ = (adet >= eps) & \
                            (u_num * det >= 0.0) & (jnp.abs(u_num) <= adet) & \
                            (v_num * det >= 0.0) & \
                            (jnp.abs(u_num + v_num) <= adet) & \
                            (t_num * det >= 0.0)
                        if not no_max_t:
                            occ = occ & (jnp.abs(t_num) <= adet)
                        obj_s = bobj_ref[s + b].astype(jnp.float32)
                        occ = occ & (obj_s != so_g)
                        occ_vec = jnp.maximum(occ_vec,
                                              jnp.where(occ, 1.0, 0.0))
                occ1 = jnp.max(occ_vec, axis=0, keepdims=True)   # [1, GR]
                f_acc[:, sl] = jnp.maximum(f_acc[:, sl], occ1)
        for g in range(groups):
            allocc = jnp.min(f_acc[:, g * GR:(g + 1) * GR]) > 0.0
            done = done | jnp.where(allocc, 1 << g, 0)
        return j + 1, done

    init = (jnp.int32(0), jnp.int32(0))
    j_end, _ = jax.lax.while_loop(cond, body, init)

    if not resident and not _SYNC_DMA:
        @pl.when(j_end < ns)
        def _():
            _win_wait(G_in, gbuf, sem_g, start, j_end % 2, j_end, BS, WB, KW)

    hit_ref[0] = (f_acc[...] > 0.0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# pallas_call wrappers (same chunking/SMEM limits as the ray-major path)
# ---------------------------------------------------------------------------

_out_struct = _ray_major._out_struct
_chunk_tiles = _ray_major._chunk_tiles


@functools.partial(jax.jit, static_argnames=("tile", "block", "wb", "eps",
                                             "prec", "res", "groups",
                                             "od_parts", "iota_tpx",
                                             "fused"))
def tiled_nearest_t(Ft, plan, Gt, tile: int, block: int, wb: int, eps: float,
                    prec: str = None, res: bool = None, groups: int = 1,
                    At=None, od_parts: int = 0, cam=None, iota_tpx: int = 0,
                    fused=None):
    """Ft [n,F_DIM,tile], plan [n,PLAN_W] i32, Gt [16,(NB+pad)*4*block]
    -> (t [n,tile], idx [n,tile]).  ``od_parts`` != 0: Ft instead carries
    the 8 o/d ray rows (ray_tile_od) and the kernel builds the walk
    operand in VMEM (_build_feats: the od_parts-band bf16 stack for
    prec="stack", the 16-row f32 block otherwise) — skipping the
    store-bound XLA materialization of the stacked features.
    ``cam``/``iota_tpx`` != 0 (primary rays): there is NO per-tile ray
    operand at all — pass Ft=None; the kernel rebuilds features from a
    lane iota + the [CAM_ROWS, tile] constant-row operand ``cam``
    (make_cam) and the per-tile pixel origins in plan aux slots 4/5,
    deleting the per-step ray DMA (od_parts then just carries the band
    count).  ``prec``: tri|highest|default (None ->
    the SRT_MT_PRECISION default).  ``res``: VMEM-resident geometry (None
    -> auto by size; pass explicitly from already-jitted callers — the env
    var is not part of this function's jit cache key).  ``groups`` > 1
    needs a plan built with the same groups (sub-group masks).  ``At``
    (resident-only, groups == 1): shade-attribute operand — the kernel
    additionally one-hot-fetches the winner's packed attribute limbs and
    the return becomes (t, idx, attrs [n, AR, tile] f32)."""
    prec = prec or _mode()
    n = plan.shape[0]
    res = _resident(Gt) if res is None else res
    KW = _kw(block, wb, prec, rows=SUPER_ROWS_RES if res else None)
    fetch = At is not None
    assert not fetch or (res and groups == 1), (fetch, res, groups)
    assert not od_parts or groups == 1, (od_parts, groups)
    assert not iota_tpx or (cam is not None and groups == 1)
    assert fused is None or (fetch and iota_tpx), (fused, fetch, iota_tpx)
    ar_out = (((6 if fused[4] == 1 else 4) + (1 if fused[3] else 0))
              if fused is not None else (At.shape[0] if fetch else 0))
    KF = None if iota_tpx else Ft.shape[1]   # contraction rows (16 f32 /
    #                             stacked bf16 / 8 o/d rows when od_parts)

    def call(*chunk):
        if iota_tpx:
            (planc,) = chunk
            Fc = None
            nl = planc.shape[0]
        else:
            Fc, planc = chunk
            nl = Fc.shape[0]
        vref = planc if Fc is None else Fc
        scratch = [] if res else [
            pltpu.VMEM((2, Gt.shape[0], KW * wb * 4 * block), Gt.dtype),
            pltpu.SemaphoreType.DMA((2, KW)),
        ]
        if groups > 1:
            kern = functools.partial(_nearest_kernel_g, block, wb, eps,
                                     prec, res, KW, groups)
            scratch = [pltpu.VMEM((block, tile), jnp.float32),
                       pltpu.VMEM((block, tile), jnp.int32)] + scratch
        else:
            kern = functools.partial(_nearest_kernel_t, block, wb, eps,
                                     prec, res, KW, fetch, od_parts,
                                     iota_tpx, fused)
        tile_spec = pl.BlockSpec((1, 1, tile), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        if iota_tpx:
            in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]   # cam rows
        else:
            in_specs = [pl.BlockSpec((1, KF, tile), lambda i, *_: (i, 0, 0),
                                     memory_space=pltpu.VMEM)]
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.VMEM if res else pltpu.HBM))
        out_specs = [tile_spec, tile_spec]
        out_shape = [
            _out_struct((nl, 1, tile), jnp.float32, vref),
            _out_struct((nl, 1, tile), jnp.int32, vref),
        ]
        operands = [planc, cam if iota_tpx else Fc, Gt]
        if fetch:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            out_specs.append(
                pl.BlockSpec((1, ar_out, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                _out_struct((nl, ar_out, tile), jnp.float32, vref))
            operands.append(At)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT) if res else None,
            interpret=_interpret(),
        )(*operands)

    mt = None
    if fetch and res:
        # the fetch kernel's outputs sit in scoped VMEM next to the
        # resident operands (measured: the whole [chunk, AR, tile] output
        # tuple allocates in VMEM — complex at tile 4096 hit Mosaic's
        # 110 MB wall at 59 tiles/chunk).  Cap the chunk so
        # operands + outputs + margin stay under budget.
        op_mb = (Gt.size * Gt.dtype.itemsize
                 + At.size * At.dtype.itemsize) / 2 ** 20
        per_tile_mb = (max(ar_out, 2) + 2) * tile * 4 / 2 ** 20
        mt = int(max(1.0, (100.0 - op_mb) / max(per_tile_mb, 1e-6)))
    if iota_tpx:
        outs = _chunk_tiles(call, n, plan, plan_w=plan.shape[1],
                            max_tiles=mt)
    else:
        outs = _chunk_tiles(call, n, Ft, plan, plan_w=plan.shape[1],
                            max_tiles=mt)
    if fetch:
        t, idx, attrs = outs
        return (t.reshape(n, tile), idx.reshape(n, tile),
                attrs.reshape(n, ar_out, tile))
    t, idx = outs
    return t.reshape(n, tile), idx.reshape(n, tile)


@functools.partial(jax.jit, static_argnames=("tile", "block", "wb", "eps",
                                             "res"))
def tiled_prepass_t(Ft, plan, Gt, tile: int, block: int, wb: int, eps: float,
                    res: bool = None):
    """bf16 classification pass -> window flags [n, FLAGS_W] f32 (0/1 per
    plan position; see _prepass_kernel_t)."""
    n = Ft.shape[0]
    KW = _kw(block, wb)
    res = _resident(Gt) if res is None else res
    FW = plan.shape[1]          # flag lanes >= plan positions, 128-multiple

    def call(Fc, planc):
        nl = Fc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl,),
            in_specs=[
                pl.BlockSpec((1, F_DIM, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM if res else pltpu.HBM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, FW), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[] if res else [
                pltpu.VMEM((2, F_DIM, KW * wb * 4 * block), jnp.float32),
                pltpu.SemaphoreType.DMA((2, KW)),
            ],
        )
        (flags,) = pl.pallas_call(
            functools.partial(_prepass_kernel_t, block, wb, eps, res),
            grid_spec=grid_spec,
            out_shape=[_out_struct((nl, 1, FW), jnp.float32, Fc)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT) if res else None,
            interpret=_interpret(),
        )(planc, Fc, Gt)
        return flags

    flags = _chunk_tiles(call, n, Ft, plan, plan_w=FW)
    return flags.reshape(n, FW)


def _refine_plan(plan, flags):
    """Compact a plan to its prepass-flagged windows (front-to-back order
    and packed entry bounds preserved).  Range-mode tiles get synthesized
    list entries (bound 0); ranges too long for the flag vector keep their
    original plan (the HIGHEST pass walks them in full)."""
    n = plan.shape[0]
    mv = plan.shape[1] - PLAN_AUX
    lo, rng, lcnt = plan[:, 0], plan[:, 1], plan[:, 2]
    use_list = plan[:, 3] == 1
    cnt = jnp.where(use_list, lcnt, rng)
    pos = jnp.arange(mv, dtype=jnp.int32)[None]
    live = (flags[:, :mv] > 0.0) & (pos < cnt[:, None])
    ent = jnp.where(use_list[:, None], plan[:, PLAN_AUX:], lo[:, None] + pos)
    # cumsum-scatter compaction (argsort would be a per-row sort; see
    # tiled.cull_blocks_lists)
    slot = jnp.where(live, jnp.cumsum(live, axis=1, dtype=jnp.int32) - 1,
                     mv)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                            slot.shape)
    ent2 = jnp.zeros((n, mv), jnp.int32).at[rows, slot].set(
        ent, mode="drop")
    cnt2 = live.sum(-1).astype(jnp.int32)
    z = jnp.zeros_like(lo)
    aux2 = jnp.stack([lo, rng, cnt2, jnp.ones_like(lo), z, z, z, z], axis=-1)
    plan2 = jnp.concatenate([aux2, ent2], axis=-1)
    keep = (~use_list) & (cnt > mv)
    return jnp.where(keep[:, None], plan, plan2)


@functools.partial(jax.jit, static_argnames=("tile", "block", "wb", "eps",
                                             "no_max_t", "prec", "res",
                                             "groups", "od_parts"))
def tiled_anyhit_t(Ft, self_obj, plan, Gt, bobj, tile: int, block: int,
                   wb: int, eps: float, no_max_t: bool = True,
                   prec: str = None, res: bool = None, groups: int = 1,
                   od_parts: int = 0):
    """Occlusion query.  self_obj [n, 1, tile] f32, bobj [NB+pad] i32
    per-block object ids.  -> found [n, tile].  ``groups`` > 1 needs a
    plan built with the same groups (sub-group masks).  ``od_parts`` != 0:
    Ft carries the 8 o/d ray rows and the kernel builds the walk operand
    in VMEM (see tiled_nearest_t)."""
    prec = prec or _mode()
    n = Ft.shape[0]
    res = _resident(Gt) if res is None else res
    KW = _kw(block, wb, prec, rows=SUPER_ROWS_AH if res else None)
    KF = Ft.shape[1]            # contraction rows (16 f32 / stacked bf16)
    assert not od_parts or groups == 1, (od_parts, groups)

    def call(Fc, selfc, planc):
        nl = Fc.shape[0]
        scratch = [] if res else [
            pltpu.VMEM((2, Gt.shape[0], KW * wb * 4 * block), Gt.dtype),
            pltpu.SemaphoreType.DMA((2, KW)),
        ]
        if groups > 1:
            kern = functools.partial(_anyhit_kernel_g, block, wb, eps,
                                     no_max_t, prec, res, KW, groups)
            scratch = [pltpu.VMEM((1, tile), jnp.float32)] + scratch
        else:
            kern = functools.partial(_anyhit_kernel_t, block, wb, eps,
                                     no_max_t, prec, res, KW, od_parts, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nl,),
            in_specs=[
                pl.BlockSpec((1, KF, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM if res else pltpu.HBM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        )
        (found,) = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[_out_struct((nl, 1, tile), jnp.int32, Fc)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT) if res else None,
            interpret=_interpret(),
        )(planc, bobj, Fc, selfc, Gt)
        return found

    found = _chunk_tiles(call, n, Ft, self_obj, plan,
                         plan_w=plan.shape[1])
    return found.reshape(n, tile) != 0


@functools.partial(jax.jit, static_argnames=("tile", "block", "wb", "eps",
                                             "no_max_t", "prec", "res",
                                             "od_parts", "tpx"))
def tiled_anyhit_from_t(tob, plan, Gt, bobj, cam, tile: int, block: int,
                        wb: int, eps: float, no_max_t: bool, prec: str,
                        res: bool, od_parts: int, tpx: int):
    """FROM-T occlusion query (the fused-shadow path).

    tob [n, 2, tile] f32 (t row + winner-object row from hits_shaded),
    cam [ROWS, tile] iota rows with the LIGHT at 13-15
    (make_cam(light_pos=...)), plan with pixel origins in aux 4/5.  The
    kernel rebuilds every shadow ray in VMEM (_build_feats_from_t) — the
    only ray-sized operands are the two [tile]-lane input rows.
    -> found [n, tile] bool."""
    n = tob.shape[0]
    KW = _kw(block, wb, prec, rows=SUPER_ROWS_AH if res else None)

    def call(tobc, planc):
        nl = tobc.shape[0]
        scratch = [] if res else [
            pltpu.VMEM((2, Gt.shape[0], KW * wb * 4 * block), Gt.dtype),
            pltpu.SemaphoreType.DMA((2, KW)),
        ]
        kern = functools.partial(_anyhit_kernel_t, block, wb, eps,
                                 no_max_t, prec, res, KW, od_parts, tpx)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nl,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),       # cam rows
                pl.BlockSpec((1, 2, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),       # t/obj rows
                pl.BlockSpec(memory_space=pltpu.VMEM if res else pltpu.HBM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        )
        (found,) = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[_out_struct((nl, 1, tile), jnp.int32, tobc)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT) if res else None,
            interpret=_interpret(),
        )(planc, bobj, cam, tobc, Gt)
        return found

    found = _chunk_tiles(call, n, tob, plan, plan_w=plan.shape[1])
    return found.reshape(n, tile) != 0


def anyhit_from_t(prep, t, obj, bounds, tile: int, eps: float,
                  no_max_t: bool, light_pos, cam_spec, maxv: int,
                  sub: int = 1):
    """Fused-path hard-shadow query: NO ray-sized XLA work.

    The nearest kernel emitted per-tile hit-point bounds (hits_shaded
    want_bounds); the shadow plan is built O(tiles) from them
    (analytic_shadow_bounds -> interval + projective light-apex tests),
    and the any-hit kernel rebuilds the shadow rays in VMEM from the t
    row + iota cam rows.  Semantics are the reference's
    (simple_raytracer.cpp:321-342): origin = hit point, direction =
    light - point (unnormalized), no max-t, self-object skip.  Returns
    found [R] bool (miss lanes read 1 — callers mask by the hit mask).

    ``sub`` > 1: the primary tile was split into ``sub`` contiguous
    SUBTILES of ``tile`` rays each (dense scenes tune shadow walks to
    finer tiles — config.shadow_tile); ``bounds`` has one row per
    subtile and the rebuilt pixel origins advance tile_px//... rows per
    subtile.  ``tile`` is the SHADOW (subtile) size."""
    vmx, focal, wd, hd, tpx = cam_spec
    n = bounds.shape[0]                 # subtile count = n_tiles * sub
    R = t.shape[0]
    assert R == n * tile, (R, n, tile)
    assert tile % tpx == 0, (tile, tpx)
    ah = bounds[:, 6] > 0.0
    obj_lo, obj_hi = bounds[:, 7], bounds[:, 8]
    # plan-time self-object exclusion for PURE tiles (every hit lane left
    # one object), exactly like the legacy path's excl
    pure = ah & (obj_lo == obj_hi)
    excl = jnp.where(pure, jnp.round(obj_lo).astype(jnp.int32),
                     jnp.int32(-2))
    ab = analytic_shadow_bounds_exact(bounds, light_pos,
                                      shadow_frame(prep, light_pos))
    plan = cull(prep, None, None, tile, maxv, excl,
                wb=WINDOW_BLOCKS_AH, apex_rev=True, ab=ab)
    plan = jnp.where(ah[:, None], plan, 0)      # skip hitless tiles
    tiles_x = -(-wd // tpx)
    cam, _txy = make_cam(vmx, focal, wd, hd, tpx, 1, tiles_x, tile,
                         light_pos=light_pos)
    # per-SUBTILE pixel origins: subtile j = tile ti // sub, group g
    sj = jnp.arange(n, dtype=jnp.int32)
    ti = sj // sub
    g = sj % sub
    px0 = (ti % tiles_x) * tpx - (wd // 2)
    py0 = (ti // tiles_x) * tpx + g * (tile // tpx) - (hd // 2)
    plan = plan.at[:, 4].set(px0).at[:, 5].set(py0)
    G, prec, _Ft, _n, _R, odp = _operands(prep, _mode(), t, None, tile,
                                          max_parts=3, want_ft=False)
    res = _resident(G)
    npad = (G.shape[1] // (4 * prep.block_size)
            - prep.block_obj.shape[0])
    bobj = jnp.concatenate(
        [prep.block_obj, jnp.full((npad,), -1, jnp.int32)])
    tob = jnp.stack([t.reshape(n, tile),
                     obj.astype(jnp.float32).reshape(n, tile)], axis=1)
    found = tiled_anyhit_from_t(tob, plan, G, bobj, cam, tile,
                                prep.block_size, WINDOW_BLOCKS_AH, eps,
                                no_max_t, prec=prec, res=res, od_parts=odp,
                                tpx=tpx)
    return found.reshape(-1)[:R]


# ---------------------------------------------------------------------------
# Impl adapter: the integrator-facing API (kernels/tiled.py front-end
# machinery — shadow repair, sample folding — is impl-agnostic and calls
# these through the ``impl`` parameter)
# ---------------------------------------------------------------------------

def _groups_for(tile: int, env: str = "SRT_TILED_GROUPS",
                default_on: bool = False) -> int:
    """Sub-group count for a ray-tile: 256-ray groups, max 4 (the per-entry
    mask is 4 bits).  The env var overrides (1 disables).

    Default OFF for BOTH query types — a measured negative result (kept as
    an env-gated escape hatch for future hardware): despite a ~50%
    per-(entry, sub-group) mask skip rate, splitting the super-step matmul
    4 ways costs more than the skipped work saves (bunny hits 87.1 vs
    87.4; complex@180 hits 49.8 vs 47.5, occl@stile-1024 129.2 grouped vs
    121.8).  On VMEM-RESIDENT scenes there are no DMA descriptors to
    share, so plain finer TILES dominate grouping (complex occl: 87.8 at
    stile=256 vs 129.2 grouped@1024) — see config.shadow_tile/tile_px."""
    g = _os.environ.get(env, "")
    if g:
        return max(1, min(4, int(g)))
    if default_on and tile % 256 == 0 and tile >= 512:
        return min(4, tile // 256)
    return 1


def _groups_for_ah(tile: int) -> int:
    return _groups_for(tile, env="SRT_TILED_GROUPS_AH", default_on=False)


def cull(prep, origin, direction, tile: int, maxv: int, excl=None, wb=None,
         groups: int = 1, hourglass: bool = False, apex: bool = False,
         apex_rev: bool = False, ab=None):
    """Plan builder for the sublane kernels.

    Fetch unit = aligned WINDOW of ``wb`` (default WINDOW_BLOCKS)
    consecutive cull blocks; conservative visibility stays at block
    granularity and OR-reduces to windows — this is exactly
    tiled.cull_blocks_lists with page_tris = wb*block_size, so the sublane
    path shares the paged path's cull cost (no per-tile greedy cover).
    Scenes beyond the 16-bit window-id space force range mode.  With
    ``groups`` > 1 the plan tail carries per-entry sub-group masks (see
    tiled.cull_blocks_lists)."""
    wb = wb or WINDOW_BLOCKS
    bobj = getattr(prep, "block_obj", None) if excl is not None else None
    NB = prep.block_min.shape[0]
    assert NB % wb == 0, (NB, wb)
    pw = _ray_major._plan_width(NB // wb)
    if maxv > 0:
        # honor the requested list capacity: cull_blocks_lists clamps
        # maxv to the plan width, and the ANY-HIT cull (wb=4 halves the
        # unit count) was dodging _plan_width's density widening — its
        # dense tiles silently fell back to range walks with no
        # early-out despite effective_cull_maxv asking for 1000
        need = PLAN_AUX + maxv + (maxv // 8 + 8 if groups > 1 else 0)
        pw = max(pw, -(-need // 128) * 128)
    if maxv > 0 and NB // wb <= 65536:
        return _ray_major.cull_blocks_lists(
            origin, direction, tile, prep.block_min, prep.block_max,
            maxv, prep.block_size, wb * prep.block_size, bobj, excl,
            plan_w=pw, groups=groups, hourglass=hourglass, apex=apex,
            apex_rev=apex_rev, ab=ab)
    lo, cnt = _ray_major.cull_blocks(origin, direction, tile,
                                     prep.block_min, prep.block_max,
                                     bobj, excl, hourglass=hourglass)
    # convert the covering block range to aligned window units
    ulo = lo // wb
    ucnt = jnp.where(cnt > 0, -(-(lo + cnt) // wb) - ulo, 0).astype(jnp.int32)
    n = lo.shape[0]
    z = jnp.zeros_like(lo)
    aux = jnp.stack([ulo, ucnt, z, z, z, z, z, z], axis=-1)
    tail = pw - PLAN_AUX
    if groups > 1:      # keep the grouped plan width (all range mode:
        tail += tail // 8   # masks never read -> zeros)
    return jnp.concatenate(
        [aux, jnp.zeros((n, tail), jnp.int32)], axis=-1)


def _hit_operand(prep):
    """The G operand the nearest walk will use at the current precision
    mode (for residency checks by callers)."""
    gs = getattr(prep, "gram_s", None)
    return gs if (_mode() == "stack" and gs is not None) else prep.gram_t


# In-kernel feature build (ray_tile_od + _build_feats) for the stack tier:
# measured as the fix for the store-bound XLA feature materialization (see
# ray_tile_od).  SRT_OD_FEAT=0 restores the XLA-side stacked features.
_OD_FEAT = _os.environ.get(
    "SRT_OD_FEAT", "1" if _KCFG.od_feat else "0") not in ("0", "")
# Iota feature build for primary rays (no per-tile ray operand at all; see
# make_cam/_build_feats_iota).  SRT_IOTA_FEAT=0 restores the OD path.
_IOTA_FEAT = _os.environ.get(
    "SRT_IOTA_FEAT", "1" if _KCFG.iota_feat else "0") not in ("0", "")


def _nr(origin, tile):
    """(n_tiles, R) without materializing the padded ray arrays."""
    R = origin.shape[0]
    return -(-R // tile), R


def _operands(prep, prec, origin, direction, tile, max_parts=None,
              want_ft=True):
    """(G operand, effective precision, Ft, n, R, od_parts) for the
    requested tier: "stack" needs the prepacked gram_s — BlockSet shard
    bundles (dist/ring.py) have none and demote to the runtime-split "tri"
    path on the f32 gram_t.  ``want_ft=False`` (iota-feature callers):
    skip the ray-operand build entirely and return Ft=None.

    For the stack tier with the in-kernel feature build enabled (the
    default), Ft is the [n, 8, tile] o/d row operand and ``od_parts``
    carries the band count for the kernel preamble; otherwise Ft is the
    prebuilt feature operand and od_parts is 0.

    ``max_parts=3`` caps the emulation at tri grade by SLICING the stacked
    operand: STACK_PATTERNS[6][:3] == STACK_PATTERNS[3], so rows [:32] of a
    6-part gram_s paired with a 3-part F stack (whose pad rows 30-31 zero
    out the band-3 G rows underneath) IS the 3-part contraction — half the
    bytes per window, still one MXU pass.  The any-hit uses this: its
    boolean predicate never needed f32 grade (the round-2 default shadow
    tier was tri), and its cost is byte-bound, not flop-bound."""
    gs = getattr(prep, "gram_s", None)
    if prec == "stack" and gs is not None:
        parts = int(prep.stack_parts)
        if max_parts is not None and parts > max_parts:
            parts = max_parts
            rows = -(-(10 * parts) // 16) * 16
            gs = gs[:rows]
        if not want_ft:
            n, R = _nr(origin, tile)
            return gs, "stack", None, n, R, parts
        if _OD_FEAT:
            OD, n, R = ray_tile_od(origin, direction, tile)
            return gs, "stack", OD, n, R, parts
        Ft, n, R = ray_tile_features_stacked(origin, direction, tile, parts)
        return gs, "stack", Ft, n, R, 0
    if prec == "stack":
        prec = "tri"
    if not want_ft:
        n, R = _nr(origin, tile)
        return prep.gram_t, prec, None, n, R, 0
    Ft, n, R = ray_tile_features_t(origin, direction, tile)
    return prep.gram_t, prec, Ft, n, R, 0


def _use_iota(cam_spec, apex, groups, maxv, tile):
    if not (_IOTA_FEAT and cam_spec is not None and apex and groups == 1
            and maxv > 0):
        return False
    tpx = cam_spec[4]
    return tpx * tpx == tile


def _iota_plan_cam(plan, cam_spec, n, tile):
    """(plan with pixel origins in aux 4/5, cam rows) for the iota path."""
    vmx, focal, wd, hd, tpx = cam_spec
    tiles_x = -(-wd // tpx)
    cam, txy = make_cam(vmx, focal, wd, hd, tpx, n, tiles_x, tile)
    plan = plan.at[:, 4].set(txy[:, 0]).at[:, 5].set(txy[:, 1])
    return plan, cam


def hits(prep, origin, direction, tile: int, eps: float, maxv: int = 248,
         apex: bool = False, cam_spec=None):
    """Nearest hit over flat rays.  Returns (t [R], idx [R]).

    Default: single walk at the "stack" one-pass K-stacked tier (see
    _MODE).  ``apex``: rays share one origin — enables the projective
    pixel-space cull (tiled._visibility_px).  ``cam_spec`` (primary rays
    in tile-major order only): (view_matrix|None, focal, W, H, tile_px) —
    enables the in-kernel iota feature build (make_cam; no per-tile ray
    operand at all).  With the prepass enabled
    (SRT_TILED_PREPASS=1) this is instead the two-pass ORACLE-EXACT
    pipeline: DEFAULT-precision classification walks the full plan, then a
    HIGHEST-precision kernel reruns only the flagged windows —
    bit-identical to the single-pass HIGHEST walk."""
    if _prepass_on() and maxv > 0:
        Ft, n, R = ray_tile_features_t(origin, direction, tile)
        res = _resident(prep.gram_t)
        plan = cull(prep, origin, direction, tile, maxv, apex=apex)
        flags = tiled_prepass_t(Ft, plan, prep.gram_t, tile,
                                prep.block_size, WINDOW_BLOCKS, eps,
                                res=res)
        plan = _refine_plan(plan, flags)
        t, idx = tiled_nearest_t(Ft, plan, prep.gram_t, tile,
                                 prep.block_size, WINDOW_BLOCKS, eps,
                                 prec="highest", res=res)
    else:
        groups = _groups_for(tile) if maxv > 0 else 1
        iota = _use_iota(cam_spec, apex, groups, maxv, tile)
        G, prec, Ft, n, R, odp = _operands(prep, _mode(), origin,
                                           direction, tile,
                                           want_ft=not iota)
        if odp and groups > 1:   # grouped kernel has no od preamble
            Ft, n, R = ray_tile_features_stacked(origin, direction, tile,
                                                 odp)
            odp = 0
        res = _resident(G)
        ab = analytic_tile_bounds(cam_spec, n) if iota else None
        plan = cull(prep, origin, direction, tile, maxv, groups=groups,
                    apex=apex, ab=ab)
        cam = None
        tpx = 0
        if iota:
            plan, cam = _iota_plan_cam(plan, cam_spec, n, tile)
            tpx = cam_spec[4]
        t, idx = tiled_nearest_t(Ft, plan, G, tile,
                                 prep.block_size, WINDOW_BLOCKS, eps,
                                 prec=prec, res=res, groups=groups,
                                 od_parts=odp, cam=cam, iota_tpx=tpx)
    return t.reshape(-1)[:R], idx.reshape(-1)[:R]


def hits_attrs(prep, origin, direction, tile: int, eps: float,
               maxv: int = 248, apex: bool = False, cam_spec=None):
    """Nearest hit + in-kernel shade-attribute fetch over flat rays.

    Returns (t [R], idx [R], attrs [R, AR] f32) where attrs carries the
    winner's packed attribute limbs (accel/prepared.py:ATTR_N per limb,
    integrator.records_from_attrs decodes).  Requires prep.has_attr and a
    VMEM-resident operand; callers fall back to hits() + the XLA record
    gather otherwise."""
    iota = _use_iota(cam_spec, apex, 1, maxv, tile)
    G, prec, Ft, n, R, odp = _operands(prep, _mode(), origin, direction,
                                       tile, want_ft=not iota)
    res = _resident(G)
    assert prep.has_attr and res, (prep.has_attr, res)
    ab = analytic_tile_bounds(cam_spec, n) if iota else None
    plan = cull(prep, origin, direction, tile, maxv, apex=apex, ab=ab)
    cam = None
    tpx = 0
    if iota:
        plan, cam = _iota_plan_cam(plan, cam_spec, n, tile)
        tpx = cam_spec[4]
    t, idx, attrs = tiled_nearest_t(Ft, plan, G, tile, prep.block_size,
                                    WINDOW_BLOCKS, eps, prec=prec, res=res,
                                    At=prep.attr_t, od_parts=odp,
                                    cam=cam, iota_tpx=tpx)
    attrs = attrs.transpose(0, 2, 1).reshape(-1, attrs.shape[1])
    return t.reshape(-1)[:R], idx.reshape(-1)[:R], attrs[:R]


def hits_shaded(prep, origin, direction, tile: int, eps: float, light_pos,
                light_color, maxv: int = 248, cam_spec=None,
                double_sided: bool = True, specular_nl: bool = True,
                want_bounds: bool = False):
    """Nearest hit + FUSED in-kernel Phong over flat primary rays.

    The kernel's epilogue computes the reference's full Phong term
    (simple_raytracer.cpp:144-200; quirks incl. abs(n.l) and the extra
    n.l specular factor as static switches) from the fetched winner
    attributes and the iota-rebuilt ray rows, so NO ray-sized XLA work
    remains before the occlusion query: returns (t [R], idx [R],
    obj [R] i32, rgb [R, 3] pre-tonemap unshadowed radiance).  The caller
    applies the shadow dim + tonemap (both elementwise).  Requires
    prep.has_attr, a resident operand, and a cam_spec (primary rays).
    Misses hold garbage rgb — mask with isfinite(t).

    Textured scenes (prep.attr_tex): the base color is a texel the kernel
    cannot gather, so the epilogue instead emits the color-independent
    Phong factors + affine-map texel coords (_fused_phong tex_mode) and
    the return becomes (t, idx, obj, comp [R, 6]) with comp columns
    (dw, sw, texu, texv, obj, tex) — render_flat_tiled's XLA finish
    gathers the texel and combines (simple_raytracer.cpp:348-361)."""
    iota = _use_iota(cam_spec, True, 1, maxv, tile)
    assert iota and prep.has_attr, (iota, prep.has_attr)
    tex = bool(getattr(prep, "attr_tex", False))
    amode = 1 if tex else (
        2 if getattr(prep, "attr_smooth", False) else 0)
    # SRT_NEAREST_PARTS: cap the nearest walk's emulation grade (3 = tri,
    # ~2^-17; measurement knob — the complex scene already ships 3-part
    # nearest by the residency size heuristic and holds its goldens)
    np_env = _os.environ.get("SRT_NEAREST_PARTS", "")
    G, prec, _Ft, n, R, odp = _operands(prep, _mode(), origin, direction,
                                        tile, want_ft=False,
                                        max_parts=int(np_env) if np_env
                                        else None)
    res = _resident(G)
    assert res, "fused shading needs the VMEM-resident operand"
    sc = prep.scene
    plan = cull(prep, origin, direction, tile, maxv, apex=True,
                ab=analytic_tile_bounds(cam_spec, n))
    vmx, focal, wd, hd, tpx = cam_spec
    tiles_x = -(-wd // tpx)
    shade = (light_pos, light_color, sc.obj_color, sc.obj_ambient,
             sc.obj_specular, sc.obj_shininess)
    frame = shadow_frame(prep, light_pos) if want_bounds else None
    cam, txy = make_cam(vmx, focal, wd, hd, tpx, n, tiles_x, tile,
                        shade=shade, frame=frame)
    plan = plan.at[:, 4].set(txy[:, 0]).at[:, 5].set(txy[:, 1])
    n_obj = int(sc.obj_color.shape[0])
    t, idx, out = tiled_nearest_t(
        None, plan, G, tile, prep.block_size, WINDOW_BLOCKS, eps,
        prec=prec, res=res, At=prep.attr_t, od_parts=odp, cam=cam,
        iota_tpx=tpx, fused=(n_obj, bool(double_sided), bool(specular_nl),
                             int(want_bounds), amode))
    nr = 6 if tex else 4
    bounds = None
    if want_bounds:
        G = int(want_bounds)
        braw = out[:, nr]                                # [n, T] bounds row
        bounds = jnp.stack([braw[:, g * 16:g * 16 + 15]
                            for g in range(G)], 1).reshape(-1, 15)
    out = out[:, :nr].transpose(0, 2, 1).reshape(-1, nr)
    if tex:
        comp = out[:R]
        obj = jnp.round(comp[:, 4]).astype(jnp.int32)
        tail = (obj, comp)
    else:
        tail = (jnp.round(out[:R, 3]).astype(jnp.int32), out[:R, :3])
    if want_bounds:
        return (t.reshape(-1)[:R], idx.reshape(-1)[:R]) + tail + (bounds,)
    return (t.reshape(-1)[:R], idx.reshape(-1)[:R]) + tail


def _hourglass_for(prep) -> bool:
    """Apex-aware shadow culling pays when shadow lists are LONG (dense
    scenes): complex@180 occlusion 57.2 -> 14.1 ms; the bunny (short
    lists, 8100 point tiles) loses ~2.7 ms to the 2x cull arithmetic.
    Same density threshold as config.shadow_tile.  SRT_HOURGLASS=1/0
    forces it on/off."""
    env = _os.environ.get("SRT_HOURGLASS", "")
    if env:
        return env not in ("0",)
    return prep.block_min.shape[0] * prep.block_size > 131072


def cull_occl(prep, origin, direction, tile: int, maxv: int, excl=None,
              apex_rev: bool = False):
    """Occlusion-query plan: wider windows (WINDOW_BLOCKS_AH) — any-hit has
    no front-to-back break, so fewer DMA descriptors beat tighter lists.
    Grouped (sub-group masks) whenever the tile splits into 256-ray
    groups; anyhit() derives the same group count from the tile size.
    Dense scenes use the apex-aware hourglass visibility (shadow rays
    pass through the light; tiled._visibility_hourglass);
    ``apex_rev`` (every ray ends at ONE shared light — the hard-shadow
    path's contract) adds the projective two-cone light-apex cull."""
    # apex_rev (projective light-apex test) subsumes the hourglass: both
    # exploit the shared light, px_rev exactly — complex@180 full frame
    # 51.4 (px_rev only) vs 52.0 ms (both); the hourglass still serves the
    # FOLDED soft-shadow path, whose per-sample apexes differ.
    return cull(prep, origin, direction, tile, maxv, excl,
                wb=WINDOW_BLOCKS_AH, groups=_groups_for_ah(tile),
                hourglass=_hourglass_for(prep) and not apex_rev,
                apex_rev=apex_rev)


def anyhit(prep, origin, direction, self_obj2d, plan, tile: int, eps: float,
           no_max_t: bool):
    """self_obj2d [n, tile] f32 -> found [n, tile] bool.  ``plan`` must come
    from cull_occl (WINDOW_BLOCKS_AH windows)."""
    groups = _groups_for_ah(tile)
    G, prec, Ft, n, R, odp = _operands(prep, _mode(), origin, direction,
                                       tile, max_parts=3)
    if odp and groups > 1:       # grouped kernel has no od preamble
        Ft, n, R = ray_tile_features_stacked(origin, direction, tile, odp)
        odp = 0
    # per-block ids padded to the gram block count (pad blocks: -1 never
    # matches a real self id; their triangles are degenerate anyway)
    npad = (G.shape[1] // (4 * prep.block_size)
            - prep.block_obj.shape[0])
    bobj = jnp.concatenate(
        [prep.block_obj, jnp.full((npad,), -1, jnp.int32)])
    return tiled_anyhit_t(Ft, self_obj2d.reshape(n, 1, tile), plan,
                          G, bobj, tile, prep.block_size,
                          WINDOW_BLOCKS_AH, eps, no_max_t, prec=prec,
                          res=_resident(G), groups=groups, od_parts=odp)
