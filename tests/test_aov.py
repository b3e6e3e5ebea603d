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
