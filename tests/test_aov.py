"""AOV (auxiliary output / debug pass) rendering."""

import numpy as np

from crt_tpu import RenderSettings
from crt_tpu.renderer import render_aov
from crt_tpu.scene.procedural import make_test_scene


def test_bary_aov():
    scene = make_test_scene(width=32, height=24, num_quads=4)
    img = np.asarray(render_aov(scene, RenderSettings(), aov="bary"))
    assert img.shape == (24, 32, 3)
    bg = np.asarray(scene.background_color)
    hit = np.abs(img - bg).max(-1) > 1e-6
    assert hit.any()
    # on hits: u, v in [0, 1], blue channel 0
    assert (img[hit][:, 2] == 0).all()
    assert (img[hit][:, :2] >= 0).all() and (img[hit][:, :2] <= 1.0 + 1e-5).all()


def test_normal_depth_aovs():
    scene = make_test_scene(width=32, height=24, num_quads=4)
    nrm = np.asarray(render_aov(scene, RenderSettings(), aov="normal"))
    dep = np.asarray(render_aov(scene, RenderSettings(), aov="depth"))
    assert np.isfinite(nrm).all()
    bg = np.asarray(scene.background_color)
    hit = np.abs(nrm - bg).max(-1) > 1e-6
    assert hit.any()
    # depth positive on hits
    assert (dep[hit][:, 0] > 0).all()


def test_aov_first_class_setting():
    """settings.aov routes render_image to the AOV pass — golden profile
    dicts (utils/golden.py) apply verbatim through the public API."""
    from crt_tpu import render_image

    scene = make_test_scene(width=32, height=24, num_quads=4)
    via_setting = np.asarray(
        render_image(scene, RenderSettings(aov="bary"))
    )
    via_arg = np.asarray(render_aov(scene, RenderSettings(), aov="bary"))
    np.testing.assert_array_equal(via_setting, via_arg)
    # and the 09-01-scene0 profile dict constructs as-is
    from crt_tpu.utils import golden

    profile = dict(golden.LEGACY_GOLDEN_CASES[5][2])
    assert profile == {"aov": "bary"}
    RenderSettings(**profile)  # must not raise
