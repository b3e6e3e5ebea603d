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


def test_fault_injection_redispatch_bit_identical():
    """VERDICT r1 item 10: drop a block's output, let the scheduler
    re-dispatch it, and demand the reassembled frame is BIT-identical to
    the straight render."""
    scene = make_test_scene(width=32, height=24, num_quads=4)
    settings = RenderSettings()
    full = np.asarray(render_image(scene, settings))

    calls = {"n": 0, "failed": []}

    def flaky_block(s, start, n, st):
        calls["n"] += 1
        # first attempt of block starting at row 12 is "lost"
        if start == 12 and 12 not in calls["failed"]:
            calls["failed"].append(12)
            raise ConnectionError("host of block 12 went away")
        return multihost.render_rows_local(s, start, n, st)

    frame = multihost.render_blocks_with_recovery(
        scene, settings, num_blocks=4, render_block=flaky_block
    )
    assert calls["failed"] == [12]  # the failure actually happened
    assert calls["n"] == 5  # 4 blocks + 1 re-dispatch
    np.testing.assert_array_equal(frame, full)


def test_block_exhausts_retries_raises():
    scene = make_test_scene(width=16, height=8, num_quads=2)

    def always_fails(s, start, n, st):
        raise ConnectionError("dead host")

    import pytest

    with pytest.raises(multihost.BlockRenderError):
        multihost.render_blocks_with_recovery(
            scene, RenderSettings(), num_blocks=2,
            render_block=always_fails, max_attempts=2,
        )
