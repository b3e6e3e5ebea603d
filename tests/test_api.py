"""_crt-parity Python API contract tests (py_crt_module.cpp semantics)."""

import numpy as np

from crt_tpu.frontend import api
from tests.test_scene_loader import minimal_dict


def test_renderer_settings_tuple_contract():
    rs = api.RendererSettings()
    # positional 6-tuple, same field order as the struct-sequence
    assert tuple(rs) == (
        api.DEFAULT_MAX_RAY_DEPTH,
        api.DEFAULT_DIFFUSE_REFLECTION_RAY_COUNT,
        api.DEFAULT_SHADOW_BIAS,
        api.DEFAULT_REFLECTION_BIAS,
        api.DEFAULT_DIFFUSE_REFLECTION_BIAS,
        api.DEFAULT_REFRACTION_BIAS,
    )
    assert api.DEFAULT_MAX_RAY_DEPTH == 3
    assert api.DEFAULT_DIFFUSE_REFLECTION_RAY_COUNT == 4
    assert api.DEFAULT_SCENE_BUCKET_SIZE == 24


def test_render_scene_from_dict_vflip_and_rgba():
    d = minimal_dict()
    rgba = api.render_scene_from_dict_array(d, "/")
    assert rgba.shape == (4, 8, 4)
    assert (rgba[..., 3] == 1.0).all()

    flat = api.render_scene_from_dict(d, "/")
    assert len(flat) == 4 * 8
    assert all(len(px) == 4 for px in flat)

    # V-flip: flat row 0 is the image's BOTTOM row
    from crt_tpu import RenderSettings, render_image
    from crt_tpu.scene.json_loader import scene_from_dict

    img = np.asarray(render_image(scene_from_dict(d), RenderSettings()))
    np.testing.assert_allclose(
        np.asarray(flat[:8])[:, :3], img[-1], rtol=1e-6, atol=1e-6
    )


def test_render_scene_from_dict_accepts_plain_tuple():
    d = minimal_dict()
    out = api.render_scene_from_dict_array(
        d, "/", (2, 1, 1e-2, 1e-2, 1e-2, 1e-2)
    )
    assert out.shape == (4, 8, 4)
