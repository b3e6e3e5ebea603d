"""Native C++ KD builder: bit-identical to the NumPy reference builder."""

import numpy as np
import pytest

from crt_tpu.scene import accel as A


@pytest.fixture(scope="module")
def native_available():
    try:
        from crt_tpu.scene import native_accel

        native_accel._load()
        return True
    except Exception as e:  # g++ missing etc.
        pytest.skip(f"native builder unavailable: {e}")


def test_native_matches_numpy_on_real_scene(native_available, scenes_dir):
    from crt_tpu import load_scene

    scene = load_scene(
        str(scenes_dir / "09-02-diffuse-smooth-shading/scene2.crtscene"),
        build_accel=False,
    )
    verts = np.asarray(scene.vertices)
    idx = np.asarray(scene.tri_vidx)

    native = A.build_accel_tree(verts, idx, use_native=True)
    pure = A.build_accel_tree(verts, idx, use_native=False)

    for f in ("node_min", "node_max", "node_children", "node_leaf_id",
              "leaf_tris", "leaf_node"):
        a, b = np.asarray(getattr(native, f)), np.asarray(getattr(pure, f))
        assert a.shape == b.shape, f
        if a.dtype.kind == "f":
            np.testing.assert_array_equal(a, b, err_msg=f)
        else:
            assert (a == b).all(), f
    assert native.num_nodes == pure.num_nodes
    assert native.num_leaves == pure.num_leaves
