"""Scene loader semantics vs crt_json.cpp."""

import numpy as np
import pytest

from crt_tpu.scene.json_loader import SceneFormatError, scene_from_dict


def minimal_dict(**over):
    d = {
        "settings": {
            "background_color": [0, 0.5, 0],
            "image_settings": {"width": 8, "height": 4},
        },
        "camera": {
            "matrix": [1, 0, 0, 0, 1, 0, 0, 0, 1],
            "position": [0, 0, 0],
        },
        "materials": [
            {"type": "diffuse", "albedo": [1, 0, 0], "smooth_shading": False}
        ],
        "objects": [
            {
                "material_index": 0,
                "vertices": [-1, -1, -3, 1, -1, -3, 0, 1, -3],
                "triangles": [0, 1, 2],
            }
        ],
        "lights": [{"intensity": 100, "position": [0, 5, 0]}],
    }
    d.update(over)
    return d


def test_minimal_scene_loads():
    s = scene_from_dict(minimal_dict())
    assert s.width == 8 and s.height == 4
    assert s.num_triangles == 1
    assert s.num_lights == 1
    assert not s.gi_on and s.reflections_on and s.refractions_on
    # inline albedo auto-wrapped as a texture (crt_json.cpp:507-516)
    assert int(s.mat_albedo_tex[0]) == 0
    np.testing.assert_allclose(np.asarray(s.tex_color_a[0]), [1, 0, 0])


def test_missing_required_keys_raise():
    for key in ("settings", "camera", "objects", "lights", "materials"):
        d = minimal_dict()
        del d[key]
        if key in ("materials", "lights"):
            # lenient mode accepts these (legacy scenes)
            scene_from_dict(d)
            with pytest.raises(SceneFormatError):
                scene_from_dict(d, strict=True)
        else:
            with pytest.raises(SceneFormatError):
                scene_from_dict(d)


def test_empty_materials_rejected():
    with pytest.raises(SceneFormatError):
        scene_from_dict(minimal_dict(materials=[]))


def test_fov_default_and_custom():
    s = scene_from_dict(minimal_dict())
    np.testing.assert_allclose(float(s.cam_tan_half_fov), 1.0, rtol=1e-6)
    d = minimal_dict()
    d["camera"]["fov_degrees"] = 45
    s = scene_from_dict(d)
    np.testing.assert_allclose(
        float(s.cam_tan_half_fov), np.tan(np.radians(22.5)), rtol=1e-6
    )


def test_texture_name_reference_and_types():
    d = minimal_dict()
    d["textures"] = [
        {"name": "flat", "type": "albedo", "albedo": [0.1, 0.2, 0.3]},
        {"name": "e", "type": "edges", "edge_width": 0.05,
         "edge_color": [1, 1, 1], "inner_color": [0, 0, 0]},
        {"name": "c", "type": "checker", "color_A": [1, 1, 1],
         "color_B": [0, 0, 0], "square_size": 0.25},
    ]
    d["materials"] = [
        {"type": "diffuse", "albedo": "c", "smooth_shading": False}
    ]
    s = scene_from_dict(d)
    assert int(s.mat_albedo_tex[0]) == 2
    assert s.tex_type.shape[0] == 3

    d["materials"] = [
        {"type": "diffuse", "albedo": "missing", "smooth_shading": False}
    ]
    with pytest.raises(SceneFormatError):
        scene_from_dict(d)


def test_refractive_ior_and_feature_flags():
    d = minimal_dict()
    d["materials"] = [
        {"type": "refractive", "ior": 1.51, "smooth_shading": True},
    ]
    s = scene_from_dict(d)
    assert s.has_refractive and not s.has_reflective
    np.testing.assert_allclose(float(s.mat_ior[0]), 1.51)
    assert int(s.mat_albedo_tex[0]) == -1


def test_smooth_normals_accumulation():
    # Two triangles sharing an edge at 90 degrees: shared vertices get the
    # averaged normal (normalized sum of the two unit face normals).
    d = minimal_dict()
    d["objects"] = [{
        "material_index": 0,
        # quad folded: tri0 in z=0 plane (normal +z), tri1 in x=0 plane
        "vertices": [0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1],
        "triangles": [0, 1, 2, 0, 2, 3],
    }]
    s = scene_from_dict(d)
    n = np.asarray(s.vertex_normals)
    # tri0 normal = +z; tri1 normal: (v2-v0)x(v3-v0) = (0,1,0)x(0,0,1) = +x
    expect_shared = np.array([1, 0, 1]) / np.sqrt(2)
    np.testing.assert_allclose(n[0], expect_shared, atol=1e-6)
    np.testing.assert_allclose(n[2], expect_shared, atol=1e-6)
    np.testing.assert_allclose(n[1], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(n[3], [1, 0, 0], atol=1e-6)


def test_scene_flag_parsing():
    d = minimal_dict()
    d["settings"]["gi_on"] = True
    d["settings"]["reflections_on"] = False
    s = scene_from_dict(d)
    assert s.gi_on and not s.reflections_on and s.refractions_on
