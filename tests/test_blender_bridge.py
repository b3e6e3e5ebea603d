"""Blender bridge pure-math tests (run without bpy)."""

import numpy as np

from crt_tpu.frontend.blender import scene_bridge


def test_axis_conversion_roundtrip():
    v = [1.0, 2.0, 3.0]
    assert scene_bridge.r2b_vec(scene_bridge.b2r_vec(v)) == v
    assert scene_bridge.b2r_vec(scene_bridge.r2b_vec(v)) == v


def test_axis_conversion_handedness():
    # Blender +Z (up) -> renderer +Y (up)
    assert scene_bridge.b2r_vec([0, 0, 1]) == [0, 1, 0]
    # Blender -Y (camera forward) -> renderer +Z?? no: -Y_blender -> (0,0,1)
    assert scene_bridge.b2r_vec([0, -1, 0]) == [0, 0, 1]
    # right-handedness preserved: x stays x
    assert scene_bridge.b2r_vec([1, 0, 0]) == [1, 0, 0]


def test_bpy_gated_import():
    # outside Blender the module loads with bpy=None and no crash
    assert scene_bridge.bpy is None or hasattr(scene_bridge.bpy, "data")
