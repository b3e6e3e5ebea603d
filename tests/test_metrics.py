"""Ray accounting + binning statistics."""

import numpy as np

from crt_tpu import RenderSettings
from crt_tpu.scene.procedural import make_test_scene
from crt_tpu.utils.metrics import binning_stats, render_with_stats


def test_ray_accounting_diffuse_only():
    scene = make_test_scene(width=32, height=16, num_quads=3,
                            with_reflective=False)
    img, stats = render_with_stats(scene, RenderSettings())
    # diffuse-only, 2 lights: exactly 1 primary + 1 merged shadow trace
    assert stats.num_traces == 2
    # merged shadow trace covers num_lights * R rays
    assert stats.primary_rays == 32 * 16
    assert stats.rays_traced >= 3 * stats.primary_rays  # 1 + 2 lights
    assert np.isfinite(np.asarray(img)).all()


def test_ray_accounting_reflective_adds_traces():
    scene = make_test_scene(width=32, height=16, num_quads=3,
                            with_reflective=True)
    _, stats = render_with_stats(scene, RenderSettings(max_ray_depth=2))
    # reflection recursion adds one trace + one shadow trace per level
    assert stats.num_traces > 2


def test_binning_stats():
    scene = make_test_scene(width=64, height=32, num_quads=10)
    s = binning_stats(scene, RenderSettings())
    assert s["clusters"] >= 1
    assert 0 <= s["mean_clusters_per_tile"] <= s["clusters"]
    assert 0.0 <= s["cull_ratio"] <= 1.0
