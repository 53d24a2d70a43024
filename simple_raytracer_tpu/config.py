"""Configuration system for the TPU raytracer.

The reference (leonlang/simple_raytracer) has no config system: every knob is a
hardcoded constant or a comment-toggled code block (see SURVEY.md §5).  This module
exposes each of those constants as a field, citing where the value lives in the
reference (`simple_raytracer.cpp` / `Object.cpp`), so renders can reproduce the
reference's behaviour exactly while remaining fully parameterisable.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera at the view-space origin.

    Reference: primary ray dir = (i, j, focal) for i in [-W/2, W/2),
    j in [-H/2, H/2); directions NOT normalized (simple_raytracer.cpp:505-525).
    """

    width: int = 600            # simple_raytracer.cpp:773
    height: int = 400           # simple_raytracer.cpp:773
    focal: float = 400.0        # simple_raytracer.cpp:506
    normalize_dirs: bool = False  # reference never normalizes primary dirs


@dataclasses.dataclass(frozen=True)
class LightConfig:
    """Point light + soft-shadow sampling parameters."""

    position: Tuple[float, float, float] = (500.0, -300.0, -200.0)  # :776
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)             # :433
    # Number of jittered light samples; reference main() uses 1 (:445) but the
    # code comments call out "36 Shadows are a good value" (:444); the published
    # experiments used 8/16/32 (images/soft_shadows/).
    num_samples: int = 1
    # Cumulative per-sample jitter: +3.0 added to x, y, z in rotation (:372-382).
    jitter_step: float = 3.0
    # Shadowed samples are dimmed by /5, NOT zeroed (:369).
    shadow_dim: float = 5.0
    # Reference shadow rays have no max-t: occluders BEYOND the light still
    # cast shadow (simple_raytracer.cpp:321-342).  True reproduces that quirk.
    shadow_no_max_t: bool = True
    enable_shadows: bool = True   # :385-386 comment toggle


@dataclasses.dataclass(frozen=True)
class ShadingConfig:
    """Phong illumination + tone-mapping parameters (simple_raytracer.cpp:144-200,
    :389-398)."""

    # Diffuse uses abs(n.l): double-sided shading (:174-178).
    double_sided_diffuse: bool = True
    # The reference multiplies the specular term by an extra max(n.l, 0) factor
    # (after the abs fold) (:196).
    specular_nl_factor: bool = True
    # 1/pi scaling on diffuse and ambient (:153, :184).
    # Flat geometric normals are the active path; smooth vertex-normal
    # interpolation exists but is commented out (:162-164).
    smooth_normals: bool = False
    # Reinhard variant: c / (c + reinhard_offset); 0.5 active, 0.1/1.0/4.0
    # commented (:390-393).
    reinhard_offset: float = 0.5
    gamma: float = 1.1            # :396-398 (2.2 commented out)
    tonemap_enabled: bool = True
    # The reference quantizes shaded color with int(c*255) (truncation) (:447-449).
    quantize_truncate: bool = True


@dataclasses.dataclass(frozen=True)
class BVHConfig:
    """BVH build parameters (Object.cpp:225-284)."""

    leaf_size: int = 8            # triangleSizeStop, Object.cpp:261
    # 'median' reproduces the reference's sort-by-pointOne median split
    # (Object.cpp:240-255).  'sah' is the TPU-native improvement.
    split: str = "median"
    # CULL granularity for the TPU tile-culling renderer: leaf triangles are
    # reordered contiguously and grouped into fixed-size blocks with AABBs.
    # Finer blocks cull tighter (measured: 32-tri blocks see ~1/3 the visible
    # triangles of 128-tri blocks per tile on the bunny).
    block_size: int = 32
    # FETCH granularity: consecutive blocks are grouped into pages of
    # page_tris triangles; a page is one contiguous DMA descriptor and one
    # epilogue slice in the Pallas kernel.  Must be a block_size multiple.
    page_tris: int = 128


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Measured-winning Pallas kernel tuning (the TPU-native analog of the
    reference's compile-time constants; every value is a hardware
    measurement recorded in DESIGN.md rounds 2-4).

    These are the SHIPPED defaults: a fresh process with no environment
    reproduces the BENCH numbers from this dataclass alone.  Each field
    can still be overridden per-process by its SRT_* env var (listed per
    field) — env wins over config, for measurement sweeps; the kernel
    modules read the env exactly once at import.  tests/test_gates.py pins
    the correspondence.
    """

    # MT contraction tier: "stack" = one-pass K-stacked bf16 emulation
    # (f32-grade, DESIGN.md round 3: nearest 56.9 -> 34.8 ms vs "tri");
    # "tri" = 3-pass runtime split; "highest" = bit-exact ~6-pass.
    # Env: SRT_MT_PRECISION.
    mt_precision: str = "stack"
    # Super-step rows (streaming / VMEM-resident / resident any-hit).
    # 2048 won every round-3 retune point (512: 52.4, 2048: 34.1,
    # 4096: 34.7 ms nearest @16px).  Round 5: the RESIDENT nearest walk
    # retunes to 1024 under the fused pipeline — the bunny's mean ~26
    # visible windows/tile fit ONE 2048-row super-step, which left the
    # front-to-back break no step boundary to act on; at 1024 (KW=16)
    # the second step is skipped when the first confirms the winner
    # (kernel-only 7.67 -> 6.94, fused full frame 10.88 -> 10.28;
    # complex unchanged 13.7, 4096 regresses to 8.58 kernel-only).
    # Env: SRT_TILED_SUPER_ROWS[_RES|_AH].
    super_rows: int = 2048
    super_rows_res: int = 1024
    super_rows_ah: int = 2048
    # Aligned fetch-window width in cull blocks: nearest keeps WB=2
    # (front-to-back break rewards tight lists), any-hit WB=4 (no break,
    # fewer descriptors).  Env: SRT_TILED_WB / SRT_TILED_WB_AH.
    window_blocks: int = 2
    window_blocks_ah: int = 4
    # In-kernel ray-feature builds: od_feat (OD rows -> features in VMEM;
    # round-3 fix for the store-bound XLA stacked-feature materialization)
    # and iota_feat (primary rays rebuilt from a lane iota — no per-tile
    # ray operand at all; round 4).  Env: SRT_OD_FEAT / SRT_IOTA_FEAT.
    od_feat: bool = True
    iota_feat: bool = True
    # In-kernel winner-attribute fetch (exact bf16-limb transport) instead
    # of the [R, K] XLA record gather, for flat-untextured scenes.  The
    # round-4 HONEST A/B: full frame 58.7 (gather) vs 18.2 ms (fetch).
    # Env: SRT_ATTR_FETCH.
    attr_fetch: bool = True
    # VMEM-resident geometry threshold (gram operand bytes).
    # Env: SRT_TILED_RESIDENT_MB / SRT_TILED_RESIDENT=0.
    resident_mb: int = 64
    # Fused in-kernel Phong for flat-untextured S=1 scenes: the nearest
    # kernel's epilogue computes the reference's full Phong term
    # (simple_raytracer.cpp:144-200) from the fetched winner attributes
    # and the iota ray rows, leaving only the elementwise shadow dim +
    # tonemap outside.  Round-4 hardware A/B (view-varied frames, bunny
    # 1080p shadowed): 17.75 -> 16.06 ms/frame.  Env: SRT_FUSED_PHONG.
    fused_phong: bool = True
    # Fused shadow pipeline for flat-untextured S=1 scenes on the fused-
    # Phong path: the nearest kernel additionally emits per-tile hit-point
    # bounds, the shadow plan is built O(tiles) from them
    # (analytic_shadow_bounds), and the any-hit kernel rebuilds its rays
    # in VMEM from the t row (no [R,3] point arrays, no O(R) cull
    # reductions, no ray-operand DMA — round-5 fusion step 1).
    # Env: SRT_FUSED_SHADOW.
    fused_shadow: bool = True
    # Projective cull composition for apex tiles: "and" = px test refines
    # the interval test (default; "only" is plan-equivalent and ~6 ms
    # cheaper isolated but degraded the round-3 full-frame schedule
    # 39 -> 145 ms — see DESIGN.md round-3 negatives).  Env: SRT_PX_MODE.
    px_mode: str = "and"
    # List-mode window cap for DENSE scenes (where _plan_width already
    # widens the plan to 1024 entries): the shipped cull_maxv=248 left the
    # p90 through-geometry tile of the complex scene walking 2215 windows
    # in RANGE mode — which has no front-to-back break.  Filling the plan
    # capacity keeps those tiles in sorted list mode with the bound16
    # early exit: round-5 hardware A/B (view-varied, 64-frame) complex
    # 600x400 full frame 15.86 -> 13.42 ms (plan width 4096 + maxv 2900
    # read 13.74 — wider plans cost more than the remaining range tiles
    # save).  Applied by kernels.tiled.effective_cull_maxv when the scene
    # is past the _plan_width density threshold.  Env: SRT_MAXV_BIG.
    maxv_big: int = 1000


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Top-level render configuration."""

    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    light: LightConfig = dataclasses.field(default_factory=LightConfig)
    shading: ShadingConfig = dataclasses.field(default_factory=ShadingConfig)
    bvh: BVHConfig = dataclasses.field(default_factory=BVHConfig)
    kernel: KernelConfig = dataclasses.field(default_factory=KernelConfig)

    # 'bruteforce' — all ray×triangle pairs (jnp oracle, differentiable)
    # 'bvh'        — stackless flattened-BVH traversal in jnp (lax.while_loop)
    # 'tiled'      — TPU perf path: per-tile block culling + Pallas MXU kernel
    mode: str = "bruteforce"

    # Pixel tile edge for the tiled/Pallas path (tile = tile_px * tile_px
    # rays).  0 = ADAPTIVE on scene density (kernels.tiled.
    # effective_tile_px): small scenes take 32 — DMA descriptor issue
    # (~1us each) dominates and a 32x32 tile amortizes each geometry-window
    # fetch over 4x the rays (bunny 1080p: full frame 131 -> 118 ms vs
    # 16px); dense scenes (> 128k tris) take 16 — their per-tile lists are
    # long, and tighter bounds beat fetch amortization (complex scene @180:
    # 132.5 -> 97.9 ms/frame).  Small renders still work (tile padding
    # clamps).
    tile_px: int = 0

    # Nearest-pass ray-tile size (RAY count, not pixels) for the tiled path.
    # Like shadow_tile, a value smaller than tile_px^2 re-chunks the
    # 2D-tile-major primary-ray stream into CONTIGUOUS sub-tiles for the
    # cull + nearest kernel only (128 = a 16x8-pixel half of a 16px tile):
    # tighter per-tile bounds -> shorter block lists and a finer early-break
    # granularity, vs more grid steps and more cull rows.  0 = the full
    # pixel tile (tile_px^2).  Must divide tile_px^2 and be a multiple of
    # 128 (the VPU lane width).
    hit_tile: int = 0

    # Shadow-pass ray-tile size (RAY count, not pixels) for the tiled path.
    # Shadow queries originate on surfaces, so their per-tile direction
    # spread is wider than primaries'; a finer tile gives much tighter cull
    # bounds (shorter block lists) at the cost of more grid steps.  Shadow
    # tiles are CONTIGUOUS chunks of the primary tile (no re-permutation):
    # 256 = an 8x32-pixel strip of a 32px tile.  0 = ADAPTIVE: dense scenes
    # (> 128k triangles) use 256, small scenes keep the primary tile.
    # Measured on TPU: complex scene (178k tris, angle 180) occlusion
    # 121 -> 88 ms/frame at 256 (128 and 512 both worse; whole turntable
    # 163 -> 135 ms/frame, bit-identical checksum); bunny flagship (69k
    # tris) REGRESSES 118 -> 135 ms at 256 — its occlusion is already
    # cheap and the finer tiles just 4x the shadow-cull cost.
    shadow_tile: int = 0

    # Tiled-path kernel implementation: None -> SRT_TILED_IMPL env (default
    # 'sublane').  'paged' = ray-major 128-tri Gram pages (kernels/tiled.py);
    # 'sublane' = transposed layout, 32-tri fetch granularity
    # (kernels/tiled_t.py).
    tiled_impl: str = None

    # Tiled-path cull-list capacity: tiles with <= cull_maxv visible Gram
    # pages get an exact compacted front-to-back list (scalar-prefetch SMEM
    # table); heavier tiles fall back to the covering contiguous range (no
    # early break).  0 = ranges only.  Sized to PLAN_MAXV: overflow tiles are
    # rare but expensive (1.4% of 1080p bunny tiles caused 29% of page-visits
    # at capacity 64).
    cull_maxv: int = 248

    # Rays processed per lax.map chunk in the bvh/bruteforce paths (bounds the
    # per-ray gather scratch, which would otherwise scale O(R * max_leaf * 9)
    # and OOM at 1080p).  0 = single chunk.
    ray_chunk: int = 131072

    # Background for pixels with no hit OR hits shading to exactly (0,0,0):
    # light blue 173,216,230 (simple_raytracer.cpp:476-487).
    background: Tuple[int, int, int] = (173, 216, 230)

    # Möller–Trumbore determinant epsilon (simple_raytracer.cpp:57).
    mt_eps: float = 1e-12

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class AnimationConfig:
    """Turntable animation driver (simple_raytracer.cpp:530-551)."""

    start_deg: float = 0.0
    stop_deg: float = 360.0
    step_deg: float = 10.0         # 36 frames
    orbit_radius: float = 50.0     # :546
    camera_y: float = -50.0        # :551
    pitch_deg: float = 30.0        # :551
    yaw_offset_deg: float = 90.0   # :551 (angle + 90)


def default_config() -> RenderConfig:
    return RenderConfig()
