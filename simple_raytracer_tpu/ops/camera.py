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
