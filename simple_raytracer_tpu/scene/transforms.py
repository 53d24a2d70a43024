"""Homogeneous 4x4 transform factories, matching the reference semantics.

Reference: Transformation.cpp (all of it).  The reference builds GLM matrices,
which are COLUMN-major (``m[col][row]``); expressed as row-major numpy matrices
(``M[row, col]``, applied as ``M @ v``), its rotation factories come out as the
TRANSPOSE of the standard rotation matrices — i.e. a rotation by ``-angle`` in
the usual convention (Transformation.cpp:15-47).  We reproduce that exactly so
scenes composed through this API match the reference's geometry bit-for-bit.

All functions accept radians (the reference passes ``glm::radians(deg)``) and
return float32 numpy arrays; they are host-side scene-construction helpers.
The single application point on device is :func:`apply_transform`, one einsum
over the whole vertex array (vs. the reference's per-triangle loop,
Object.cpp:183-190).
"""

from __future__ import annotations

import numpy as np


def scale(sx: float, sy: float, sz: float) -> np.ndarray:
    """Transformation.cpp:6-13."""
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = sx
    m[1, 1] = sy
    m[2, 2] = sz
    m[3, 3] = 1.0
    return m


def rotate_x(angle: float) -> np.ndarray:
    """Transformation.cpp:15-25.  GLM column-major layout makes this the
    transpose of the standard Rx, i.e. Rx(-angle)."""
    c, s = np.cos(angle), np.sin(angle)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = 1.0
    m[1, 1] = c
    m[1, 2] = s     # glm m[2][1] = sin  (col 2, row 1)
    m[2, 1] = -s    # glm m[1][2] = -sin (col 1, row 2)
    m[2, 2] = c
    m[3, 3] = 1.0
    return m


def rotate_y(angle: float) -> np.ndarray:
    """Transformation.cpp:27-36 (transposed standard Ry)."""
    c, s = np.cos(angle), np.sin(angle)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = c
    m[0, 2] = -s    # glm m[2][0] = -sin
    m[1, 1] = 1.0
    m[2, 0] = s     # glm m[0][2] = sin
    m[2, 2] = c
    m[3, 3] = 1.0
    return m


def rotate_z(angle: float) -> np.ndarray:
    """Transformation.cpp:38-47 (transposed standard Rz)."""
    c, s = np.cos(angle), np.sin(angle)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = c
    m[0, 1] = s     # glm m[1][0] = sin
    m[1, 0] = -s    # glm m[0][1] = -sin
    m[1, 1] = c
    m[2, 2] = 1.0
    m[3, 3] = 1.0
    return m


def mirror(mx: bool = False, my: bool = False, mz: bool = False) -> np.ndarray:
    """Transformation.cpp:49-63."""
    m = np.eye(4, dtype=np.float32)
    if mx:
        m[0, 0] = -1.0
    if my:
        m[1, 1] = -1.0
    if mz:
        m[2, 2] = -1.0
    return m


def shear(shear_xy: float = 0.0, shear_xz: float = 0.0, shear_yx: float = 0.0,
          shear_yz: float = 0.0, shear_zx: float = 0.0, shear_zy: float = 0.0) -> np.ndarray:
    """Transformation.cpp:65-76 (glm m[col][row] transcribed to M[row][col])."""
    m = np.eye(4, dtype=np.float32)
    m[0, 1] = shear_xy   # glm m[1][0]
    m[0, 2] = shear_xz   # glm m[2][0]
    m[1, 0] = shear_yx   # glm m[0][1]
    m[1, 2] = shear_yz   # glm m[2][1]
    m[2, 0] = shear_zx   # glm m[0][2]
    m[2, 1] = shear_zy   # glm m[1][2]
    return m


def translate(position) -> np.ndarray:
    """Transformation.cpp:78-82."""
    m = np.eye(4, dtype=np.float32)
    m[0:3, 3] = np.asarray(position, dtype=np.float32)
    return m


def view_matrix(position, rotation) -> np.ndarray:
    """Transformation.cpp:84-90: ``T(pos) * Rz * Ry * Rx`` with the transposed
    rotation factories above.  ``rotation`` is (rx, ry, rz) in radians."""
    rx, ry, rz = rotation
    return (translate(position) @ rotate_z(rz) @ rotate_y(ry) @ rotate_x(rx)).astype(np.float32)


def apply_transform(matrix: np.ndarray, verts_h: np.ndarray) -> np.ndarray:
    """Apply a 4x4 to homogeneous vertices of any leading shape [..., 4].

    Replaces the reference's per-triangle loop (Object.cpp:183-190) with one
    einsum over the entire SoA vertex array.
    """
    return np.einsum("ij,...j->...i", matrix.astype(verts_h.dtype), verts_h)
