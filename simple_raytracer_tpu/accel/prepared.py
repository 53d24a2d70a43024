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
    gram: jnp.ndarray         # [NP, 16, 4*page_tris] — packed MT factors in
                              # PAGES of page_tris consecutive triangles with
                              # page-level scalar grouping
                              # [det | u_num | v_num | t_num], each page_tris
                              # wide.  A page is the DMA/matmul unit: one
                              # contiguous descriptor fetches it.  Row 10
                              # carries per-triangle object ids (first
                              # page_tris columns).
    # --- static (aux) ---
    num_nodes: int = dataclasses.field(default=0)
    num_blocks: int = dataclasses.field(default=0)
    num_triangles: int = dataclasses.field(default=0)   # real (unpadded) count
    max_leaf: int = dataclasses.field(default=8)
    depth: int = dataclasses.field(default=0)
    block_size: int = dataclasses.field(default=32)

    _DYN = ("scene", "node_min", "node_max", "skip", "leaf_first",
            "leaf_count", "block_min", "block_max", "block_obj", "gram")
    _STATIC = ("num_nodes", "num_blocks", "num_triangles", "max_leaf",
               "depth", "block_size")

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
    flat = concat_bvhs(bvhs, offsets)

    scene = scene.reorder(flat.perm)

    # pad triangles to a PAGE multiple (+ leaf window slack) with degenerate
    # copies of the last vertex: zero area (MT det = 0, never hits) and inside
    # the last block's AABB.
    bs = cfg.bvh.block_size
    pt = cfg.bvh.page_tris
    assert pt % bs == 0, f"page_tris {pt} must be a block_size {bs} multiple"
    pad_to = max(-(-max(T, 1) // pt) * pt, T + flat.max_leaf)
    pad_to = -(-pad_to // pt) * pt
    pad = pad_to - T
    scene_np = {name: np.asarray(getattr(scene, name))
                for name in Scene._ARRAY_FIELDS}
    if pad:
        last_v = (scene_np["verts"][-1, 0:1, :] if T
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
    # block is the candidate id; padding (-1) never disqualifies purity
    to = np.asarray(padded.tri_obj).reshape(nb, bs)
    mx = to.max(axis=1) if nb else np.zeros((0,), np.int32)
    pure = np.all((to == mx[:, None]) | (to == -1), axis=1)
    block_obj = np.where(pure, mx, -9).astype(np.int32)

    # precompute the tiled path's packed MT Gram pages + per-triangle object
    # ids here (host numpy) so per-frame renders skip the packing entirely
    gram = pack_pages_np(vc, np.asarray(padded.tri_obj), cfg.bvh.page_tris)

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
        gram=gram,
        num_nodes=int(len(flat.skip)),
        num_blocks=int(nb),
        num_triangles=int(T),
        max_leaf=int(flat.max_leaf),
        depth=int(flat.depth),
        block_size=int(bs),
    )
    return jax.device_put(ps)
