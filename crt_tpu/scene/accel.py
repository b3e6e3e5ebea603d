"""Host-side scene compilation: smooth normals + KD/AABB tree build.

The tree replicates the reference builder's semantics exactly
(crt_acceleration_tree.cpp:31-106):

  - root AABB = union of all triangle AABBs
  - midpoint split, axis alternating with depth (depth % 3)
  - triangles routed to children by AABB *overlap* — duplicated into both
    children when straddling the split plane
  - child0 is created (and recursed into) before child1, matching node
    numbering
  - leaf when <= MAX_BOX_TRIANGLE_COUNT (16) triangles or
    depth > MAX_ACCELERATION_TREE_DEPTH (39)

but the output is flat SoA arrays (AccelTree) instead of a pointer soup:
node AABBs, child indices, and a padded [num_leaves, leaf_size] triangle-id
table that a Pallas kernel can stream with one dynamic slice per leaf.

This build runs on the host at scene-load time (crt_json.cpp:606 does the
same).  A C++ implementation of the hot recursion lives in native/ with this
NumPy version as the always-available fallback.
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from crt_tpu.scene.types import (
    MAX_ACCELERATION_TREE_DEPTH,
    MAX_BOX_TRIANGLE_COUNT,
    AccelTree,
)


def accumulate_vertex_normals(pos: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Smooth vertex normals exactly as crt_mesh.cpp:10-30.

    Each triangle adds its *normalized* face normal to its three vertices;
    the result is normalized per vertex.  Unreferenced vertices keep zero.
    """
    if len(idx) == 0:
        return np.zeros_like(pos)
    v0 = pos[idx[:, 0]]
    v1 = pos[idx[:, 1]]
    v2 = pos[idx[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    norm = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.where(norm > 0, norm, 1.0)

    out = np.zeros_like(pos)
    for k in range(3):
        np.add.at(out, idx[:, k], fn)
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.where(n > 0, n, 1.0)).astype(np.float32)


def triangle_aabbs(vertices: np.ndarray, tri_vidx: np.ndarray):
    """Per-triangle AABBs -> (min [T,3], max [T,3])."""
    pts = vertices[tri_vidx]  # [T, 3, 3]
    return pts.min(axis=1), pts.max(axis=1)


def _build_host(
    tmin: np.ndarray,
    tmax: np.ndarray,
    max_depth: int,
    max_leaf: int,
):
    """Reference-faithful recursive build over triangle AABBs.

    Returns (node_min, node_max, node_children, leaf_lists) where leaf_lists
    maps node id -> list of triangle ids (original order preserved, including
    duplicates created by straddle routing).
    """
    T = len(tmin)
    node_min: list[np.ndarray] = []
    node_max: list[np.ndarray] = []
    node_children: list[list[int]] = []
    leaf_lists: dict[int, np.ndarray] = {}

    root_min = tmin.min(axis=0)
    root_max = tmax.max(axis=0)
    node_min.append(root_min)
    node_max.append(root_max)
    node_children.append([-1, -1])

    def build_branch(parent: int, tris: np.ndarray, depth: int):
        """Mirrors build_branch (crt_acceleration_tree.cpp:31-85) including
        node numbering: child0's whole subtree is emitted before child1."""
        if depth > max_depth or len(tris) <= max_leaf:
            leaf_lists[parent] = tris
            return

        axis = depth % 3
        bmin = node_min[parent]
        bmax = node_max[parent]
        mid = (bmin[axis] + bmax[axis]) * np.float32(0.5)

        c0_min, c0_max = bmin.copy(), bmax.copy()
        c0_max[axis] = mid
        c1_min, c1_max = bmin.copy(), bmax.copy()
        c1_min[axis] = mid

        lo = tmin[tris]
        hi = tmax[tris]
        # AABB::intersects — inclusive overlap (crt_aabb.h:37-45)
        in0 = np.all(lo <= c0_max, axis=1) & np.all(hi >= c0_min, axis=1)
        in1 = np.all(lo <= c1_max, axis=1) & np.all(hi >= c1_min, axis=1)
        t0 = tris[in0]
        t1 = tris[in1]

        if len(t0) > 0:
            idx0 = len(node_min)
            node_min.append(c0_min)
            node_max.append(c0_max)
            node_children.append([-1, -1])
            node_children[parent][0] = idx0
            build_branch(idx0, t0, depth + 1)
        if len(t1) > 0:
            idx1 = len(node_min)
            node_min.append(c1_min)
            node_max.append(c1_max)
            node_children.append([-1, -1])
            node_children[parent][1] = idx1
            build_branch(idx1, t1, depth + 1)

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, max_depth + 100))
    try:
        build_branch(0, np.arange(T, dtype=np.int32), 0)
    finally:
        sys.setrecursionlimit(old_limit)

    return node_min, node_max, node_children, leaf_lists


def build_accel_tree(
    vertices: np.ndarray,
    tri_vidx: np.ndarray,
    max_depth: int = MAX_ACCELERATION_TREE_DEPTH,
    max_leaf: int = MAX_BOX_TRIANGLE_COUNT,
    use_native: bool = True,
) -> AccelTree:
    """Build and flatten the acceleration tree for a triangle soup."""
    vertices = np.asarray(vertices, np.float32)
    tri_vidx = np.asarray(tri_vidx, np.int32)
    tmin, tmax = triangle_aabbs(vertices, tri_vidx)

    built = None
    if use_native:
        try:
            from crt_tpu.scene import native_accel

            built = native_accel.build_host(tmin, tmax, max_depth, max_leaf)
        except Exception:
            built = None
    if built is None:
        built = _build_host(tmin, tmax, max_depth, max_leaf)
    node_min, node_max, node_children, leaf_lists = built

    N = len(node_min)
    leaf_size = max(
        max_leaf, max((len(v) for v in leaf_lists.values()), default=0)
    )

    node_leaf_id = np.full(N, -1, np.int32)
    num_leaves = len(leaf_lists)
    leaf_tris = np.full((max(num_leaves, 1), leaf_size), -1, np.int32)
    leaf_node = np.zeros(max(num_leaves, 1), np.int32)
    for li, (nid, tris) in enumerate(sorted(leaf_lists.items())):
        node_leaf_id[nid] = li
        leaf_tris[li, : len(tris)] = tris
        leaf_node[li] = nid

    return AccelTree(
        node_min=jnp.asarray(np.stack(node_min)),
        node_max=jnp.asarray(np.stack(node_max)),
        node_children=jnp.asarray(np.asarray(node_children, np.int32)),
        node_leaf_id=jnp.asarray(node_leaf_id),
        leaf_tris=jnp.asarray(leaf_tris),
        leaf_node=jnp.asarray(leaf_node),
        leaf_size=int(leaf_size),
        num_nodes=N,
        num_leaves=num_leaves,
    )
