"""Primary-ray generation: pinhole camera at the view-space origin.

Reference (simple_raytracer.cpp:505-525): for pixel column i ∈ [-W/2, W/2) and
row j ∈ [-H/2, H/2), ray direction = (i, j, focal) with focal = 400
(= focal length in pixels, :506), origin (0,0,0), directions NOT normalized.
World→view is handled by pre-baking inverse(viewMatrix) into the geometry and
light (:558, :778), so the camera itself never moves.

Image convention: output[row, col] with row = j + H/2, col = i + W/2 (CImg
top-left origin, :517).
"""

from __future__ import annotations

import jax.numpy as jnp


def primary_rays(width: int, height: int, focal: float = 400.0,
                 normalize: bool = False, dtype=jnp.float32):
    """Generate all primary rays for a W x H image.

    Returns (origins [H, W, 3], directions [H, W, 3]) with directions
    (i, j, focal); row-major image layout.
    """
    i = jnp.arange(-(width // 2), width - width // 2, dtype=dtype)     # columns
    j = jnp.arange(-(height // 2), height - height // 2, dtype=dtype)  # rows
    ii, jj = jnp.meshgrid(i, j)          # [H, W]
    d = jnp.stack([ii, jj, jnp.full_like(ii, focal)], axis=-1)
    if normalize:
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros_like(d)
    return o, d


def primary_rays_world(width: int, height: int, view_matrix: jnp.ndarray,
                       focal: float = 400.0, normalize: bool = False,
                       dtype=jnp.float32):
    """World-space primary rays for a camera described by ``view_matrix``
    (Transformation.cpp:84-90 convention: T(pos)*Rz*Ry*Rx; rigid).

    The reference moves the WORLD into view space every frame — it bakes
    inverse(viewMatrix) into all geometry and the light
    (simple_raytracer.cpp:558,778), forcing a full host rebuild + BVH rebuild
    per frame (SURVEY.md §3.1).  The TPU-native inverse: geometry and its BVH
    stay static in world space, and the RAYS move —
    origin = V[:3,3], direction = V[:3,:3] @ (i, j, focal).  For a rigid V
    the hit parameters t and all shading dot products are identical, so
    images match the reference bit-for-near-bit while the per-frame cost
    becomes pure device compute.
    """
    o, d = primary_rays(width, height, focal, normalize=False, dtype=dtype)
    V = jnp.asarray(view_matrix, dtype=dtype)
    d = jnp.einsum("ij,hwj->hwi", V[:3, :3], d)
    if normalize:
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(V[:3, 3], d.shape)
    return o, d
