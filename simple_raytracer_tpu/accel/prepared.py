"""PreparedScene: Scene + flattened BVH + triangle blocks, ready for device.

``prepare`` is a HOST step (numpy BVH build; cannot run under jit).  The
result is a pytree, so it passes straight into jitted render functions; the
static geometry metadata (node count, block count, max leaf size) lives in
aux_data so tracing specializes on it.
"""

from __future__ import annotations

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..scene.scene import Scene
from .bvh import build_bvh, concat_bvhs, triangle_blocks


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PreparedScene:
    """Scene in BVH order + acceleration arrays (all device-resident)."""

    scene: Scene              # triangle arrays permuted leaf-contiguous, padded
    node_min: jnp.ndarray     # [M, 3]
    node_max: jnp.ndarray     # [M, 3]
    skip: jnp.ndarray         # [M]
    leaf_first: jnp.ndarray   # [M]
    leaf_count: jnp.ndarray   # [M]
    block_min: jnp.ndarray    # [NB, 3] — CULL granularity AABBs (block_size
                              # triangles each; finer than a page)
    block_max: jnp.ndarray    # [NB, 3]
    block_obj: jnp.ndarray    # [NB] i32 — object id when every real triangle
                              # of the block belongs to one object (padding
                              # ignored), else -9.  Lets shadow culling drop
                              # a tile's own object wholesale (the reference
                              # rule: own-object triangles never occlude,
                              # simple_raytracer.cpp:331).
    gram_t: jnp.ndarray       # [16, (NB+pad)*4*block_size] — feature-major
                              # MT factors for kernels/tiled_t.py: rows are
                              # the 16 ray features, lanes are block-major
                              # det|u|v|t groups of block_size triangles
                              # (lane b*4*BS + g*BS + t).  A window of
                              # consecutive blocks is one 128-aligned lane
                              # slice = one (strided) DMA descriptor, and a
                              # super-step's fetched lanes contract in ONE
                              # transposed matmul.
    gram: jnp.ndarray         # [NP, 16, 4*page_tris] — packed MT factors in
                              # PAGES of page_tris consecutive triangles with
                              # page-level scalar grouping
                              # [det | u_num | v_num | t_num], each page_tris
                              # wide.  A page is the DMA/matmul unit: one
                              # contiguous descriptor fetches it.  Row 10
                              # carries per-triangle object ids (first
                              # page_tris columns).
    gram_s: jnp.ndarray       # [ROWS, (NB+pad)*4*block_size] bf16 — the
                              # K-STACKED twin of gram_t: each Gram row is
                              # split x = h + m (+ l) into bf16 parts and the
                              # partial products of a multi-pass f32-emulating
                              # contraction are laid out ALONG K (pattern in
                              # pack_blocks_stacked_np), so the whole
                              # emulation is ONE MXU pass — measured pass
                              # cost is flat in K up to 128
                              # (scripts/kdepth_probe.py).  stack_parts=3:
                              # rows 32, error ~2^-17 ("tri" grade);
                              # stack_parts=6: rows 64, error ~2^-26
                              # (f32-grade).
    attr_t: jnp.ndarray = None  # [16, (NB+pad)*4*block_size] bf16 — per-
                              # triangle SHADE attributes (flat normal xyz +
                              # object id), each f32 split into THREE bf16
                              # limbs (8+8+8 mantissa bits = the full f32
                              # mantissa, pack_attr_stacked_np) laid out in
                              # the det lane group of the gram lane layout.
                              # The nearest kernel one-hot-contracts the
                              # winner's limbs on the MXU (EXACT: one
                              # nonzero product per ray, ordered-magnitude
                              # f32 limb adds), replacing the ~10 ms/frame
                              # [R, K] XLA record gather.  Packed only for
                              # flat-untextured configs (has_attr).
    # --- static (aux) ---
    num_nodes: int = dataclasses.field(default=0)
    num_blocks: int = dataclasses.field(default=0)
    num_triangles: int = dataclasses.field(default=0)   # real (unpadded) count
    max_leaf: int = dataclasses.field(default=8)
    depth: int = dataclasses.field(default=0)
    block_size: int = dataclasses.field(default=32)
    stack_parts: int = dataclasses.field(default=6)     # products in gram_s
    has_attr: bool = dataclasses.field(default=False)   # attr_t is real
    attr_tex: bool = dataclasses.field(default=False)   # attr_t is the
                              # textured layout (ATTR_ROWS_TEX: normals +
                              # obj + UV affine map + tex id; see
                              # pack_attr_tex_stacked_np)
    attr_smooth: bool = dataclasses.field(default=False)  # attr_t is the
                              # smooth-normal layout (ATTR_ROWS_SMOOTH:
                              # vertex-normal affine map + obj; see
                              # pack_attr_smooth_stacked_np)

    _DYN = ("scene", "node_min", "node_max", "skip", "leaf_first",
            "leaf_count", "block_min", "block_max", "block_obj", "gram_t",
            "gram", "gram_s", "attr_t")
    _STATIC = ("num_nodes", "num_blocks", "num_triangles", "max_leaf",
               "depth", "block_size", "stack_parts", "has_attr",
               "attr_tex", "attr_smooth")

    @property
    def num_pages(self) -> int:
        return int(self.gram.shape[0])

    @property
    def page_tris(self) -> int:
        return int(self.gram.shape[2]) // 4

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._DYN),
                tuple(getattr(self, n) for n in self._STATIC))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def pack_pages_np(verts_cart, tri_obj, page_tris: int):
    """HOST packer: [T,3,3] (+ int object ids [T]) -> Gram pages
    [NP, 16, 4*page_tris] with page-level scalar grouping (T must be a
    multiple of page_tris).  One page = one contiguous DMA descriptor + one
    epilogue slice in kernels/tiled.py.  Object ids ride in row 10 (the ray
    feature vector is zero there, so the contraction is unaffected, and the
    occlusion kernel reads them from the same VMEM buffer — no second DMA).
    """
    import numpy as np
    from ..ops.intersect import pack_mt_gram_np
    v = np.asarray(verts_cart, np.float32)
    T = v.shape[0]
    assert T % page_tris == 0, (T, page_tris)
    NP_ = T // page_tris
    G = pack_mt_gram_np(v)                              # [T, 10, 4]
    # page-level grouping: [NP, 10, 4, PT] -> columns det|u|v|t each PT wide
    Gp = G.reshape(NP_, page_tris, 10, 4).transpose(0, 2, 3, 1)
    gram = np.zeros((NP_, 16, 4 * page_tris), np.float32)
    gram[:, :10] = Gp.reshape(NP_, 10, 4 * page_tris)
    gram[:, 10, :page_tris] = np.asarray(tri_obj, np.float32).reshape(
        NP_, page_tris)
    return gram


GRAM_T_PAD_BLOCKS = 8   # zero-row tail so a window starting at the last real
                        # block stays in bounds (zero det => never a hit)


def pack_blocks_np(verts_cart, block_size: int,
                   pad_blocks: int = GRAM_T_PAD_BLOCKS):
    """HOST packer for the TRANSPOSED (feature-major) kernel layout:
    [T,3,3] -> gram_t [16, (NB+pad)*4*block_size] f32.

    Rows are the 16 ray features (10 real + pad); lanes are block-major
    det|u|v|t groups of block_size triangles (lane b*4*BS + g*BS + t =
    scalar group g of triangle t of cull block b).  Block boundaries land
    on 128-lane multiples (4*BS = 128 at BS=32), so a window of ANY number
    of consecutive blocks is one lane-sliced (strided) DMA descriptor —
    fetch granularity drops to a single 32-triangle block — and all
    windows of a super-step contract in ONE transposed-lhs matmul
    (quad [rows, TILE_R], triangles on SUBLANES: epilogue slices are
    [BS, TILE_R], zero lane padding — kernels/tiled_t.py).  Object ids
    are NOT packed per triangle: blocks are single-object by construction
    (per-object page padding in prepare), so the any-hit kernel tests
    block_obj scalars instead."""
    import numpy as np
    from ..ops.intersect import pack_mt_gram_np
    v = np.asarray(verts_cart, np.float32)
    T = v.shape[0]
    assert T % block_size == 0, (T, block_size)
    NB = T // block_size
    G = pack_mt_gram_np(v)                              # [T, 10, 4]
    # [NB, 10 features, 4 groups, BS]
    Gr = G.reshape(NB, block_size, 10, 4).transpose(0, 2, 3, 1)
    cols = np.zeros((16, (NB + pad_blocks) * 4 * block_size), np.float32)
    cols[:10, :NB * 4 * block_size] = Gr.transpose(1, 0, 2, 3).reshape(
        10, NB * 4 * block_size)
    return cols


# K-stacked product patterns: each (g, f) pair is one partial product of the
# split x = h + m + l (h = bf16(x), m = bf16(x - h), l = bf16(x - h - m);
# |m| <~ 2^-8|x|, |l| <~ 2^-16|x|).  Laying the pairs ALONG the contraction
# axis turns the whole multi-product emulation into ONE MXU matmul — measured
# pass cost is flat in K up to 128 (scripts/kdepth_probe.py), so this is ~3x
# (tri) / ~6x (vs HIGHEST) fewer MXU passes at identical products.
#   3 parts: drops mm/ml/lm/ll terms  -> error ~2^-17 * sum|G||F| (tri grade)
#   6 parts: drops ml/lm/ll           -> error ~2^-26 * sum|G||F| (f32 grade)
STACK_PATTERNS = {
    3: (("h", "h"), ("h", "m"), ("m", "h")),
    6: (("h", "h"), ("h", "m"), ("m", "h"), ("h", "l"), ("l", "h"),
        ("m", "m")),
}


def split3_np(x):
    """f32 -> (h, m, l) bf16 parts with x ~= h + m + l (error ~2^-26|x|)."""
    import ml_dtypes
    bf = ml_dtypes.bfloat16
    h = x.astype(bf)
    r = x - h.astype(np.float32)
    m = r.astype(bf)
    l = (r - m.astype(np.float32)).astype(bf)
    return h, m, l


def pack_blocks_stacked_np(verts_cart, block_size: int, parts: int = 6,
                           pad_blocks: int = GRAM_T_PAD_BLOCKS):
    """HOST packer for the K-STACKED bf16 kernel operand (see gram_s).

    Same lane layout as :func:`pack_blocks_np` (block-major det|u|v|t lane
    groups of ``block_size`` triangles); the ROW axis carries the G-side
    bf16 split parts of each of the 10 Gram features, one 10-row band per
    STACK_PATTERNS product, zero-padded to a 16-row (bf16 sublane tile)
    multiple.  kernels/tiled_t.py pairs it with the matching F-side band
    stack and contracts the whole emulated-precision product in ONE matmul.
    """
    import numpy as np
    from ..ops.intersect import pack_mt_gram_np
    v = np.asarray(verts_cart, np.float32)
    T = v.shape[0]
    assert T % block_size == 0, (T, block_size)
    NB = T // block_size
    G = pack_mt_gram_np(v)                              # [T, 10, 4]
    Gr = G.reshape(NB, block_size, 10, 4).transpose(2, 0, 3, 1).reshape(
        10, NB * 4 * block_size)                        # [10, lanes] f32
    h, m, l = split3_np(Gr)
    part = {"h": h, "m": m, "l": l}
    pattern = STACK_PATTERNS[parts]
    rows = -(-(10 * parts) // 16) * 16
    lanes = (NB + pad_blocks) * 4 * block_size
    cols = np.zeros((rows, lanes), h.dtype)
    for i, (gp, _fp) in enumerate(pattern):
        cols[10 * i:10 * (i + 1), :NB * 4 * block_size] = part[gp]
    return cols


# Shade-attribute transport rows (attr_t): limb l of attribute a rides row
# l * ATTR_N + a; attributes are (nx, ny, nz, obj_id).
ATTR_N = 4
ATTR_ROWS = 16                  # 3 limbs x 4 attrs = 12, padded to sublanes


def pack_attr_stacked_np(tri_normal, tri_obj, block_size: int,
                         pad_blocks: int = GRAM_T_PAD_BLOCKS):
    """HOST packer for the kernel shade-attribute operand (see attr_t).

    Each f32 attribute splits into three bf16 limbs h/m/l (8 mantissa bits
    each; h+m: the residual of round-to-nearest is exactly representable,
    so the three limbs carry the entire 24-bit f32 mantissa and
    h + m + l == x EXACTLY in f32 order-of-magnitude addition).  Values
    sit in the det lane group of the gram lane layout (lane
    b*4*BS + 0*BS + t), zeros elsewhere, so the kernel's existing window
    lane slicing fetches them."""
    import numpy as np
    n = np.asarray(tri_normal, np.float32)               # [T, 3]
    o = np.asarray(tri_obj, np.float32)[:, None]         # [T, 1]
    x = np.concatenate([n, o], axis=1)                   # [T, ATTR_N]
    T = x.shape[0]
    assert T % block_size == 0, (T, block_size)
    NB = T // block_size
    h, m, l = split3_np(x)                               # bf16 limbs
    lanes = (NB + pad_blocks) * 4 * block_size
    cols = np.zeros((ATTR_ROWS, lanes), h.dtype)
    for li, part in enumerate((h, m, l)):
        # [T, ATTR_N] -> det lanes of each block
        pv = part.reshape(NB, block_size, ATTR_N)
        for a in range(ATTR_N):
            row = li * ATTR_N + a
            cols[row, :NB * 4 * block_size] = np.pad(
                pv[:, :, a][:, None, :], ((0, 0), (0, 3), (0, 0))
            ).reshape(-1)
    return cols


# Textured attr layout (attr_tex): the UV affine-map transport.  The
# reference interpolates BAKED texel coords with Ericson barycentrics of
# the hit point (simple_raytracer.cpp:79-128, :348-361); both are affine
# in p over the triangle plane, so texel(p) = A @ p + c with per-triangle
# constants A [2,3], c [2] — ray-independent, hence transportable through
# the one-hot fetch like any other attribute.  Rows:
#   0-11   3 limbs x (nx, ny, nz, obj)        row l*4 + a   (as ATTR_N=4)
#   12-35  3 limbs x (Au0,Au1,Au2,cu, Av0,Av1,Av2,cv)  row 12 + l*8 + a
#          (a 2-limb variant measured 0.28-texel worst-case error through
#           the |A.p| ~ 1e4 cancellation — 3 limbs restore ~f32 grade,
#           0.006 texels, and the fetch matmul's M stays in one MXU tile)
#   36     tex id, single limb (exact in bf16 for ids in [-1, 255])
#   37-39  zero pad
ATTR_ROWS_TEX = 40


def uv_affine_np(verts_cart, uvs):
    """Per-triangle affine texel map: texel(p) = (Au.p + cu, Av.p + cv).

    Exactly the Ericson-barycentric interpolation of the baked texel
    coords (ops/shading.py:barycentric + interpolate_uv) refactored into
    ray-independent constants.  Degenerate triangles (den ~ 0, incl. the
    page-padding copies) collapse to the constant map texel = uv[0]."""
    import numpy as np
    v = np.asarray(verts_cart, np.float64)
    t = np.asarray(uvs, np.float64)                      # [T, 3, 2]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    d00 = (e1 * e1).sum(1)
    d01 = (e1 * e2).sum(1)
    d11 = (e2 * e2).sum(1)
    den = d00 * d11 - d01 * d01
    safe = np.abs(den) > 1e-30
    deni = np.where(safe, 1.0 / np.where(safe, den, 1.0), 0.0)[:, None]
    g1 = (d11[:, None] * e1 - d01[:, None] * e2) * deni  # grad of bary(v1)
    g2 = (d00[:, None] * e2 - d01[:, None] * e1) * deni  # grad of bary(v2)
    A = (t[:, 1] - t[:, 0])[:, :, None] * g1[:, None, :] \
        + (t[:, 2] - t[:, 0])[:, :, None] * g2[:, None, :]   # [T, 2, 3]
    c = t[:, 0] - (A * v0[:, None, :]).sum(-1)               # [T, 2]
    return A.astype(np.float32), c.astype(np.float32)


def pack_attr_tex_stacked_np(verts_cart, tri_normal, tri_obj, tri_tex, uvs,
                             block_size: int,
                             pad_blocks: int = GRAM_T_PAD_BLOCKS):
    """HOST packer for the TEXTURED kernel shade-attribute operand
    (layout above; see pack_attr_stacked_np for the limb/lane scheme)."""
    import numpy as np
    A, c = uv_affine_np(verts_cart, uvs)
    n = np.asarray(tri_normal, np.float32)
    o = np.asarray(tri_obj, np.float32)[:, None]
    tx = np.asarray(tri_tex, np.float32)[:, None]
    T = n.shape[0]
    assert T % block_size == 0, (T, block_size)
    NB = T // block_size
    lanes = (NB + pad_blocks) * 4 * block_size
    uvrows = np.concatenate([A[:, 0], c[:, 0:1], A[:, 1], c[:, 1:2]],
                            axis=1)                          # [T, 8]
    base = np.concatenate([n, o], axis=1)                    # [T, 4]
    h4, m4, l4 = split3_np(base)
    h8, m8, l8 = split3_np(uvrows)
    cols = np.zeros((ATTR_ROWS_TEX, lanes), h4.dtype)

    def put(row, col_tri):                                   # [T] -> det lane
        pv = col_tri.reshape(NB, 1, block_size)
        cols[row, :NB * 4 * block_size] = np.pad(
            pv, ((0, 0), (0, 3), (0, 0))).reshape(-1)

    for li, part in enumerate((h4, m4, l4)):
        for a in range(4):
            put(li * 4 + a, part[:, a])
    for li, part in enumerate((h8, m8, l8)):
        for a in range(8):
            put(12 + li * 8 + a, part[:, a])
    put(36, tx[:, 0].astype(h4.dtype))
    return cols


# Smooth-normal attr layout (attr_smooth): the same affine refactor as
# textures applied to VERTEX NORMALS — the barycentric interpolation of
# vnormals (ops/shading.py:smooth_normal, simple_raytracer.cpp:132-140) is
# affine in p over the triangle plane: n_raw(p) = An @ p + cn; the kernel
# normalizes.  Rows:
#   0-11   3 limbs x (cnx, cny, cnz, obj)     row l*4 + a  (the constant
#          term rides the flat-normal slots so the epilogue decode and the
#          bounds/self-object rows are layout-identical to the flat case)
#   12-38  3 limbs x (An 9 row-major values)  row 12 + l*9 + a
#   39     zero pad
ATTR_ROWS_SMOOTH = 40


def pack_attr_smooth_stacked_np(verts_cart, vnormals, tri_obj,
                                block_size: int,
                                pad_blocks: int = GRAM_T_PAD_BLOCKS):
    """HOST packer for the SMOOTH-NORMAL kernel shade-attribute operand
    (layout above; limb/lane scheme of pack_attr_stacked_np)."""
    import numpy as np
    A, c = uv_affine_np(verts_cart, vnormals)            # [T,3,3], [T,3]
    o = np.asarray(tri_obj, np.float32)[:, None]
    T = o.shape[0]
    assert T % block_size == 0, (T, block_size)
    NB = T // block_size
    lanes = (NB + pad_blocks) * 4 * block_size
    base = np.concatenate([c, o], axis=1)                # [T, 4]
    arows = A.reshape(T, 9)
    h4, m4, l4 = split3_np(base)
    h9, m9, l9 = split3_np(arows)
    cols = np.zeros((ATTR_ROWS_SMOOTH, lanes), h4.dtype)

    def put(row, col_tri):
        pv = col_tri.reshape(NB, 1, block_size)
        cols[row, :NB * 4 * block_size] = np.pad(
            pv, ((0, 0), (0, 3), (0, 0))).reshape(-1)

    for li, part in enumerate((h4, m4, l4)):
        for a in range(4):
            put(li * 4 + a, part[:, a])
    for li, part in enumerate((h9, m9, l9)):
        for a in range(9):
            put(12 + li * 9 + a, part[:, a])
    return cols


def prepare(scene: Scene, cfg: RenderConfig) -> PreparedScene:
    """Build per-object BVHs (reference topology), chain them into one global
    stackless array, reorder+pad the scene, and compute triangle blocks."""
    verts_cart = np.asarray(scene.verts[..., :3] / scene.verts[..., 3:4])
    tri_obj = np.asarray(scene.tri_obj)
    T = verts_cart.shape[0]

    # object boundaries (SceneManager emits objects contiguously)
    if T and np.any(np.diff(tri_obj) < 0):
        order = np.argsort(tri_obj, kind="stable").astype(np.int32)
        scene = scene.reorder(order)
        verts_cart = verts_cart[order]
        tri_obj = tri_obj[order]

    bvhs, offsets = [], []
    start = 0
    while start < T:
        end = start
        while end < T and tri_obj[end] == tri_obj[start]:
            end += 1
        bvhs.append(build_bvh(verts_cart[start:end], cfg.bvh.leaf_size,
                              split=cfg.bvh.split))
        offsets.append(start)
        start = end
    if not bvhs:
        bvhs = [build_bvh(np.zeros((0, 3, 3), np.float32), cfg.bvh.leaf_size)]
        offsets = [0]

    # Pad each OBJECT's triangle range to a PAGE multiple so every cull
    # block/page is single-object ("pure"): shadow-time self-object
    # exclusion is then exact at block level and the sublane any-hit kernel
    # compares ONE scalar object id per block instead of per-triangle ids
    # (kernels/tiled_t.py).  Pad rows are degenerate copies of a real
    # vertex of the same object: zero area (MT det = 0, never hits) and
    # inside the object's last block AABB.  Cost: <= page_tris-1 extra
    # triangles per object.
    bs = cfg.bvh.block_size
    pt = cfg.bvh.page_tris
    assert pt % bs == 0, f"page_tris {pt} must be a block_size {bs} multiple"
    counts = [len(b.perm) for b in bvhs]
    pcounts = [-(-c // pt) * pt for c in counts]
    poffsets = [0]
    for pc in pcounts[:-1]:
        poffsets.append(poffsets[-1] + pc)
    flat = concat_bvhs(bvhs, poffsets)
    Tp = poffsets[-1] + pcounts[-1]

    # gather map new padded position -> original triangle row (pads repeat
    # the object's last real triangle; their rows are degenerated below)
    src = np.zeros(Tp, np.int32)
    pad_mask = np.ones(Tp, bool)
    for b, c, pc, po, ro in zip(bvhs, counts, pcounts, poffsets, offsets):
        if c:
            src[po:po + c] = b.perm + ro
            src[po + c:po + pc] = int(b.perm[-1]) + ro
            pad_mask[po:po + c] = False
    scene = scene.reorder(src)

    # tail slack: BVH leaf windows may read up to max_leaf rows past their
    # first triangle; keep the global array long enough (tri_obj = -1).
    pad_to = max(-(-max(Tp, 1) // pt) * pt, Tp + flat.max_leaf)
    pad_to = -(-pad_to // pt) * pt
    pad = pad_to - Tp
    scene_np = {name: np.asarray(getattr(scene, name))
                for name in Scene._ARRAY_FIELDS}
    if Tp and pad_mask.any():
        v0 = scene_np["verts"][pad_mask][:, 0:1, :]
        scene_np["verts"] = scene_np["verts"].copy()
        scene_np["verts"][pad_mask] = np.broadcast_to(
            v0, (int(pad_mask.sum()), 3, 4))
        for name, fill in (("vnormals", 0.0), ("tri_normal", 0.0),
                           ("uvs", 0.0), ("tri_color", 1.0)):
            scene_np[name] = scene_np[name].copy()
            scene_np[name][pad_mask] = fill
        scene_np["tri_tex"] = scene_np["tri_tex"].copy()
        scene_np["tri_tex"][pad_mask] = -1
        # tri_obj keeps the object id: block purity by construction
    if pad:
        last_v = (scene_np["verts"][-1, 0:1, :] if Tp
                  else np.array([[0, 0, 0, 1]], np.float32))
        scene_np["verts"] = np.concatenate(
            [scene_np["verts"],
             np.broadcast_to(last_v, (pad, 3, 4)).copy()], axis=0)
        for name, fill in (("vnormals", 0.0), ("tri_normal", 0.0),
                           ("uvs", 0.0), ("tri_color", 1.0)):
            a = scene_np[name]
            scene_np[name] = np.concatenate(
                [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
        for name in ("tri_tex", "tri_obj"):
            a = scene_np[name]
            scene_np[name] = np.concatenate(
                [a, np.full((pad,), -1, a.dtype)], axis=0)
    # All host math stays numpy — on a tunneled TPU every intermediate device
    # op is a network round trip (observed: 170s vs 0.7s for a 69k-tri
    # prepare).  One single device_put of the finished pytree at the end.
    padded = Scene(**scene_np, has_textures=scene.has_textures)

    vc = padded.verts[..., :3] / padded.verts[..., 3:4]
    bmin, bmax, nb = triangle_blocks(vc, bs)

    # per-block object purity (see PreparedScene.block_obj): max over the
    # block is the candidate id; padding (-1) never disqualifies purity.
    # Per-object page padding above makes EVERY block pure by construction
    # (the sublane any-hit kernel relies on this for its scalar per-block
    # self-object test).
    to = np.asarray(padded.tri_obj).reshape(nb, bs)
    mx = to.max(axis=1) if nb else np.zeros((0,), np.int32)
    pure = np.all((to == mx[:, None]) | (to == -1), axis=1)
    block_obj = np.where(pure, mx, -9).astype(np.int32)
    assert np.all(block_obj != -9), "impure cull block despite object padding"

    # precompute the tiled path's packed MT Gram pages + per-triangle object
    # ids here (host numpy) so per-frame renders skip the packing entirely
    gram = pack_pages_np(vc, np.asarray(padded.tri_obj), cfg.bvh.page_tris)
    gram_t = pack_blocks_np(vc, bs)

    # stacked-K operand: 6 parts (f32-grade, 128 B/lane) unless that alone
    # would push a VMEM-residency-eligible scene out of residency, in which
    # case 3 parts (tri-grade, 64 B/lane — same bytes as the f32 gram_t).
    # SRT_STACK_PARTS forces.  (Residency limit mirrors
    # kernels/tiled_t.RES_LIMIT_MB; read here because prepare time is when
    # the operand layout is fixed.)
    import os as _os
    env_parts = _os.environ.get("SRT_STACK_PARTS", "")
    if env_parts:
        parts = int(env_parts)
    else:
        lanes = gram_t.shape[1]
        lim = int(_os.environ.get("SRT_TILED_RESIDENT_MB", "64")) * 2 ** 20
        parts = 3 if (32 * lanes * 2 <= lim < 64 * lanes * 2) else 6
    gram_s = pack_blocks_stacked_np(vc, bs, parts)

    # shade-attribute operand, one of three layouts: lean 16-row flat
    # normals (the common case), attr_tex (UV affine map + tex id,
    # pack_attr_tex_stacked_np), or attr_smooth (vertex-normal affine
    # map, pack_attr_smooth_stacked_np).  smooth+textured together would
    # need both limb groups (AR 64) — rare enough (no reference scene
    # combines them) that it keeps the XLA record gather.
    smooth = bool(cfg.shading.smooth_normals)
    textured = bool(padded.has_textures)
    attr_tex = textured and not smooth
    attr_smooth = smooth and not textured
    has_attr = attr_tex or attr_smooth or (not smooth and not textured)
    if attr_tex:
        attr_t = pack_attr_tex_stacked_np(
            padded.verts_cart(), np.asarray(padded.tri_normal),
            np.asarray(padded.tri_obj), np.asarray(padded.tri_tex),
            np.asarray(padded.uvs), bs)
    elif attr_smooth:
        attr_t = pack_attr_smooth_stacked_np(
            padded.verts_cart(), np.asarray(padded.vnormals),
            np.asarray(padded.tri_obj), bs)
    elif has_attr:
        attr_t = pack_attr_stacked_np(np.asarray(padded.tri_normal),
                                      np.asarray(padded.tri_obj), bs)
    else:
        attr_t = np.zeros((1, 128), np.float32).astype(gram_s.dtype)

    ps = PreparedScene(
        scene=padded,
        node_min=flat.node_min,
        node_max=flat.node_max,
        skip=flat.skip,
        leaf_first=flat.leaf_first,
        leaf_count=flat.leaf_count,
        block_min=bmin,
        block_max=bmax,
        block_obj=block_obj,
        gram_t=gram_t,
        gram=gram,
        gram_s=gram_s,
        attr_t=attr_t,
        has_attr=has_attr,
        num_nodes=int(len(flat.skip)),
        num_blocks=int(nb),
        num_triangles=int(T),
        max_leaf=int(flat.max_leaf),
        depth=int(flat.depth),
        block_size=int(bs),
        stack_parts=int(parts),
        attr_tex=attr_tex,
        attr_smooth=attr_smooth,
    )
    return jax.device_put(ps)
