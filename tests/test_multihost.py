"""Multi-host module, single-process paths."""

import numpy as np

from crt_tpu import RenderSettings, render_image
from crt_tpu.parallel import multihost
from crt_tpu.scene.procedural import make_test_scene


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize() is False


def test_render_multihost_single_process():
    scene = make_test_scene(width=32, height=16, num_quads=4)
    img = multihost.render_image_multihost(scene, RenderSettings())
    single = np.asarray(render_image(scene, RenderSettings()))
    np.testing.assert_allclose(img, single, rtol=1e-5, atol=1e-6)


def test_render_rows_local_redispatch():
    scene = make_test_scene(width=32, height=16, num_quads=4)
    full = np.asarray(render_image(scene, RenderSettings()))
    block = np.asarray(
        multihost.render_rows_local(scene, row_start=4, num_rows=6)
    )
    np.testing.assert_allclose(block, full[4:10], rtol=1e-5, atol=1e-6)
