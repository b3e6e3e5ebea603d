"""Execute the Blender add-on against the mock bpy (tests/mock_bpy.py).

Covers what the reference add-on does for real inside Blender
(bl_crt_engine.py:12-65, bl_crt_json.py:48-401, bl_crt_properties.py,
bl_crt_ops.py): registration, scene export from a depsgraph, the
RenderEngine Combined-pass render, .crtscene import, and the camera-matrix
convention parity with the reference exporter.
"""

import json
import math
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import mock_bpy  # noqa: E402

# Reference conversion (bl_crt_json.py:11-19): Blender (x,y,z) -> (x,z,-y).
_B2R = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]])


@pytest.fixture(scope="module")
def bpy():
    b = mock_bpy.install()
    from crt_tpu.frontend import blender as addon

    addon.register()
    yield b
    addon.unregister()
    mock_bpy.uninstall()


def _camera_object(bpy, rot3, loc, fov_deg=90.0):
    from mathutils import Matrix

    cam_data = bpy.data.cameras.new("Camera")
    cam_data.angle = math.radians(fov_deg)
    ob = bpy.data.objects.new("Camera", cam_data)
    mw = np.eye(4)
    mw[:3, :3] = rot3
    mw[:3, 3] = loc
    ob.matrix_world = Matrix(mw.tolist())
    return ob


def _simple_depsgraph(bpy, objects, camera, lights=(), width=16, height=16):
    scene = bpy.types.Scene()
    scene.camera = camera
    scene.render = types.SimpleNamespace(
        resolution_x=width, resolution_y=height, resolution_percentage=100
    )
    scene.world = types.SimpleNamespace(color=(0.1, 0.2, 0.3))
    instances = [
        types.SimpleNamespace(object=ob, matrix_world=ob.matrix_world)
        for ob in list(objects) + list(lights) + [camera]
    ]
    return types.SimpleNamespace(scene=scene, object_instances=instances)


def _rotx(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], float)


# --------------------------------------------------------------------------
# camera matrix convention
# --------------------------------------------------------------------------


def test_b2r_mat3_matches_reference_convention(bpy):
    """Export must equal the reference's one-sided (B2R @ M).T
    (bl_crt_json.py:22,109)."""
    from mathutils import Matrix

    from crt_tpu.frontend.blender import scene_bridge

    rot = _rotx(0.3) @ np.array(
        [[0, 0, 1], [0, 1, 0], [-1, 0, 0]], float
    )  # arbitrary rotation
    flat = scene_bridge.b2r_mat3(Matrix(rot.tolist()))
    expected = (_B2R @ rot).T.flatten()
    np.testing.assert_allclose(np.array(flat), expected, atol=1e-12)


def test_identity_camera_looks_along_blender_minus_z(bpy):
    """An identity Blender camera looks along world -Z; the exported
    renderer matrix (row-vector convention, camera forward = -Z row-local)
    must aim the renderer camera at b2r(-Z_blender) = (0, -1, 0)."""
    from mathutils import Matrix

    from crt_tpu.frontend.blender import scene_bridge

    flat = scene_bridge.b2r_mat3(Matrix(np.eye(3).tolist()))
    R = np.array(flat).reshape(3, 3)
    renderer_dir = np.array([0.0, 0.0, -1.0]) @ R  # row-vector convention
    np.testing.assert_allclose(
        renderer_dir, _B2R @ np.array([0.0, 0.0, -1.0]), atol=1e-12
    )


def test_camera_roundtrip_restores_matrix_world(bpy):
    """export -> import_scene_dict must reproduce matrix_world (the advisor's
    round-trip criterion) — and the intermediate dict must match the
    reference exporter's convention, so reference-authored .crtscene files
    import correctly too."""
    from crt_tpu.frontend.blender import scene_bridge

    rot = _rotx(0.7)
    loc = (1.0, 2.0, 3.0)
    cam = _camera_object(bpy, rot, loc, fov_deg=72.0)
    dg = _simple_depsgraph(bpy, [], cam)

    d = scene_bridge.build_camera(dg.scene, dg)
    assert d["fov_degrees"] == pytest.approx(72.0)
    np.testing.assert_allclose(
        np.array(d["matrix"]), (_B2R @ rot).T.flatten(), atol=1e-12
    )
    np.testing.assert_allclose(
        np.array(d["position"]), _B2R @ np.array(loc), atol=1e-12
    )

    scene_bridge.import_scene_dict(
        {"camera": d}, collection=bpy.context.collection
    )
    imported = bpy.context.scene.camera
    np.testing.assert_allclose(
        imported.matrix_world.to_3x3().a, rot, atol=1e-12
    )
    np.testing.assert_allclose(
        np.array(list(imported.location)), np.array(loc), atol=1e-12
    )
    assert imported.data.angle == pytest.approx(math.radians(72.0))


# --------------------------------------------------------------------------
# registration / properties
# --------------------------------------------------------------------------


def test_registration_registers_engine_and_props(bpy):
    from crt_tpu.frontend.blender.engine import CRTTpuRenderEngine

    assert CRTTpuRenderEngine in bpy.utils.registered_classes
    scene = bpy.types.Scene()
    assert scene.crt.max_ray_depth == 3
    assert scene.crt.reflections_on is True
    mat = bpy.data.materials.new("m")
    assert mat.crt.type == "DIFFUSE"
    assert list(mat.crt.albedo) == pytest.approx([0.8, 0.8, 0.8])
    light = bpy.data.lights.new("l", "POINT")
    assert light.crt.intensity == 1000.0


def test_panels_draw(bpy):
    """Panel draw() methods execute against a fake layout."""
    from crt_tpu.frontend.blender import ui

    calls = []
    col = types.SimpleNamespace(
        prop=lambda *a, **k: calls.append(a), separator=lambda: None
    )
    layout = types.SimpleNamespace(
        column=lambda: col, prop=lambda *a, **k: calls.append(a)
    )
    scene = bpy.types.Scene()
    mat = bpy.data.materials.new("pm")
    light = bpy.data.lights.new("pl", "POINT")
    ctx = types.SimpleNamespace(
        engine="CRT_TPU", scene=scene, material=mat, light=light, texture=None
    )
    for panel_cls in (
        ui.CRT_PT_render_settings,
        ui.CRT_PT_material,
        ui.CRT_PT_light,
    ):
        p = panel_cls()
        p.layout = layout
        assert panel_cls.poll(ctx)
        p.draw(ctx)
    assert len(calls) >= 12


# --------------------------------------------------------------------------
# mesh export
# --------------------------------------------------------------------------


def _cube_object(bpy, material=None, size=1.0):
    from mathutils import Matrix

    s = size
    verts = [
        (-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s),
        (-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s),
    ]
    quads = [
        (0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1),
        (1, 5, 6, 2), (2, 6, 7, 3), (3, 7, 4, 0),
    ]
    mesh = bpy.data.meshes.new("cube")
    mesh.from_pydata(verts, [], quads)
    if material is not None:
        mesh.materials.new(material)
    ob = bpy.data.objects.new("cube", mesh)
    ob.matrix_world = Matrix(np.eye(4).tolist())
    return ob


def test_mesh_export_triangulates_and_converts(bpy):
    from crt_tpu.frontend.blender import scene_bridge

    mat = bpy.data.materials.new("cube_mat")
    mat.crt.type = "DIFFUSE"
    _, index_of = scene_bridge.build_materials()
    cube = _cube_object(bpy, material=mat)
    dg = _simple_depsgraph(bpy, [cube], _camera_object(bpy, np.eye(3), (0, 0, 5)))
    objs = scene_bridge.build_objects(dg, index_of)

    assert len(objs) == 1
    o = objs[0]
    assert len(o["triangles"]) == 12 * 3  # 6 quads fan-triangulated
    assert len(o["vertices"]) == 8 * 3  # deduplicated corner vertices
    assert o["material_index"] == index_of["cube_mat"]
    vs = np.array(o["vertices"]).reshape(-1, 3)
    # all exported verts are axis-converted cube corners
    assert sorted(map(tuple, np.abs(vs))) == sorted(
        [(1.0, 1.0, 1.0)] * 8
    )


# --------------------------------------------------------------------------
# engine render (end-to-end through the real CPU renderer)
# --------------------------------------------------------------------------


def test_engine_renders_combined_pass(bpy):
    from mathutils import Matrix

    from crt_tpu.frontend.blender.engine import CRTTpuRenderEngine

    mat = bpy.data.materials.new("tri_mat")
    mat.crt.type = "DIFFUSE"
    mat.crt.albedo = [1.0, 0.5, 0.25]

    # one triangle facing the camera
    mesh = bpy.data.meshes.new("tri")
    # In Blender space, camera at origin looks along -Z? No: the renderer
    # camera looks along blender -Z only for the identity camera.  Place the
    # triangle below the origin on -Y?  b2r maps blender -Y -> renderer +Z;
    # renderer camera looks along -Z => put geometry at +Y blender.
    mesh.from_pydata(
        [(-1.0, 3.0, -1.0), (1.0, 3.0, -1.0), (0.0, 3.0, 1.0)],
        [],
        [(0, 1, 2)],
    )
    mesh.materials.new(mat)
    tri = bpy.data.objects.new("tri", mesh)
    tri.matrix_world = Matrix(np.eye(4).tolist())

    light_data = bpy.data.lights.new("sun", "POINT")
    light_data.crt.intensity = 2000.0
    light = bpy.data.objects.new("sun", light_data)
    lw = np.eye(4)
    lw[:3, 3] = (0.0, 1.0, 2.0)
    light.matrix_world = Matrix(lw.tolist())

    # camera looking along blender +Y: rotate -Z onto +Y = rot_x(+90 deg)
    cam = _camera_object(bpy, _rotx(math.pi / 2), (0.0, 0.0, 0.0))
    dg = _simple_depsgraph(bpy, [tri], cam, lights=[light], width=24, height=16)

    engine = CRTTpuRenderEngine()
    engine.render(dg)

    rect = engine.result.layers[0].passes["Combined"].rect
    arr = np.asarray(rect, np.float32)
    assert arr.shape == (24 * 16, 4)
    assert np.all(arr[:, 3] == 1.0)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    # some pixels hit the triangle (lit => differs from background)
    assert (np.abs(arr[:, :3] - bg).max(axis=1) > 0.05).any()
    # and some miss (exact background)
    assert (np.abs(arr[:, :3] - bg).max(axis=1) < 1e-6).any()


# --------------------------------------------------------------------------
# operators
# --------------------------------------------------------------------------


def test_export_import_operators_roundtrip(bpy, tmp_path):
    from mathutils import Matrix

    mat = bpy.data.materials.new("op_mat")
    mat.crt.type = "REFRACTIVE"
    mat.crt.ior = 1.5
    cube = _cube_object(bpy, material=mat)
    cam = _camera_object(bpy, np.eye(3), (0, -5, 0))
    dg = _simple_depsgraph(bpy, [cube], cam)
    bpy.context.evaluated_depsgraph_get = lambda: dg

    path = tmp_path / "scene.crtscene"
    result = bpy.ops.crt.export_scene(filepath=str(path))
    assert result == {"FINISHED"}
    data = json.loads(path.read_text())
    assert data["camera"]["position"] == [0.0, 0.0, 5.0]
    assert any(m.get("ior") == 1.5 for m in data["materials"])

    n_objects = len(bpy.data.objects)
    result = bpy.ops.crt.import_scene(filepath=str(path))
    assert result == {"FINISHED"}
    assert len(bpy.data.objects) > n_objects


def test_debug_ray_add_operator(bpy):
    n = len(bpy.context.collection.objects._items)
    result = bpy.ops.crt.debug_ray_add(
        origin=(0.0, 1.0, 2.0),
        direction=(0.0, 0.0, -1.0),
        length=2.5,
        depth=1,
        raster_coords=(827, 410),
    )
    assert result == {"FINISHED"}
    items = bpy.context.collection.objects._items
    assert len(items) == n + 1
    empty = items[-1]
    assert empty.name == "crt_ray_827_410_d1"
    # renderer (0,1,2) -> blender (0,-2,1)
    assert list(empty.location) == [0.0, -2.0, 1.0]
