"""numpy-facing wrappers over the native library (ctypes)."""

from __future__ import annotations

import numpy as np

from .build import get_lib


def bvh_build_native(verts_cart: np.ndarray, leaf_size: int):
    """Native BVH build; returns the same tuple layout the Python builder
    produces: (node_min, node_max, skip, leaf_first, leaf_count, perm,
    max_leaf, depth) — or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    T = int(verts_cart.shape[0])
    v = np.ascontiguousarray(verts_cart.reshape(T, 9), dtype=np.float32)
    max_nodes = max(2 * T + 2, 8)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    skip = np.empty((max_nodes,), np.int32)
    leaf_first = np.empty((max_nodes,), np.int32)
    leaf_count = np.empty((max_nodes,), np.int32)
    perm = np.empty((max(T, 1),), np.int32)
    stats = np.zeros((2,), np.int32)
    M = lib.bvh_build(v, T, int(leaf_size), node_min, node_max, skip,
                      leaf_first, leaf_count, perm, max_nodes, stats)
    if M < 0:
        return None
    return (node_min[:M].copy(), node_max[:M].copy(), skip[:M].copy(),
            leaf_first[:M].copy(), leaf_count[:M].copy(), perm[:T].copy(),
            int(stats[0]), int(stats[1]))


def obj_parse_native(path: str):
    """Native OBJ core parse.

    Returns (positions [NV,3], texcoords [NT,2], normals [NN,3],
    faces [NF,3,3] i32 (corner x (v,t,n)), face_mtl [NF] i32,
    usemtl_names list[str]) or None if unavailable / unreadable.
    """
    lib = get_lib()
    if lib is None:
        return None
    counts = np.zeros((6,), np.int64)
    if lib.obj_count(path.encode(), counts) != 0:
        return None
    nv, nt, nn, nf, nm, mb = (int(c) for c in counts)
    positions = np.zeros((max(nv, 1), 3), np.float32)
    texcoords = np.zeros((max(nt, 1), 2), np.float32)
    normals = np.zeros((max(nn, 1), 3), np.float32)
    faces = np.zeros((max(nf, 1), 9), np.int32)
    face_mtl = np.zeros((max(nf, 1),), np.int32)
    import ctypes
    buf = ctypes.create_string_buffer(mb)
    got = lib.obj_parse(path.encode(), positions, texcoords, normals, faces,
                        face_mtl, buf, mb)
    if got < 0:
        return None
    assert got == nf, (got, nf)
    names = buf.raw.split(b"\x00", 1)[0].decode(errors="replace")
    usemtl = names.split("\n")[:-1] if names else []
    return (positions[:nv], texcoords[:nt], normals[:nn],
            faces[:nf].reshape(nf, 3, 3), face_mtl[:nf], usemtl)
