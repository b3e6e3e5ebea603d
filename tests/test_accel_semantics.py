"""KD builder semantics vs crt_acceleration_tree.cpp (explicit cases)."""

import numpy as np

from crt_tpu.scene import accel as A
from crt_tpu.scene.types import MAX_BOX_TRIANGLE_COUNT


def tri_soup(tris):
    """tris: list of 3x3 vertex arrays -> (verts, idx)."""
    verts = np.concatenate(tris).astype(np.float32)
    idx = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    return verts, idx


def test_small_scene_is_single_leaf():
    # <= 16 triangles -> root is the only node and it is a leaf
    tris = [np.array([[i, 0, 0], [i + 0.5, 0, 0], [i, 0.5, 0]])
            for i in range(MAX_BOX_TRIANGLE_COUNT)]
    verts, idx = tri_soup(tris)
    t = A.build_accel_tree(verts, idx, use_native=False)
    assert t.num_nodes == 1 and t.num_leaves == 1
    assert int(t.node_leaf_id[0]) == 0
    got = set(np.asarray(t.leaf_tris[0])[np.asarray(t.leaf_tris[0]) >= 0].tolist())
    assert got == set(range(MAX_BOX_TRIANGLE_COUNT))


def test_straddling_triangle_duplicated_into_both_children():
    # 17 triangles on the x axis: forces one split at x-midpoint (depth 0,
    # axis 0); a triangle exactly spanning the midpoint must appear in BOTH
    # children (crt_acceleration_tree.cpp:49-57).
    tris = [np.array([[i, 0, 0], [i + 0.4, 0, 0], [i, 0.4, 0]])
            for i in range(17)]
    # midpoint of x-range [0, 16.4] is 8.2 -> triangle 8 spans [8, 8.4]
    verts, idx = tri_soup(tris)
    t = A.build_accel_tree(verts, idx, use_native=False)
    assert t.num_leaves >= 2
    lt = np.asarray(t.leaf_tris)
    containing = [li for li in range(t.num_leaves) if 8 in lt[li]]
    assert len(containing) == 2, f"straddler in {len(containing)} leaves"


def test_split_axis_alternates_and_children_order():
    # child0 (low side) subtree is numbered before child1
    # (crt_acceleration_tree.cpp:62-84)
    rng = np.random.default_rng(0)
    centers = rng.uniform(-5, 5, (40, 1, 3))
    tris = [c + rng.uniform(-0.2, 0.2, (3, 3)) for c in centers]
    verts, idx = tri_soup(tris)
    t = A.build_accel_tree(verts, idx, use_native=False)
    ch = np.asarray(t.node_children)
    c0, c1 = ch[0]
    assert c0 == 1  # first child immediately follows the root
    assert c1 > c0  # low child's subtree numbered first
    # root split on axis 0: children boxes split at x midpoint
    nmin = np.asarray(t.node_min)
    nmax = np.asarray(t.node_max)
    mid = (nmin[0, 0] + nmax[0, 0]) * 0.5
    np.testing.assert_allclose(nmax[c0, 0], mid)
    np.testing.assert_allclose(nmin[c1, 0], mid)
