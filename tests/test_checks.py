"""Numerical hygiene checks run clean on a representative scene."""

from crt_tpu import RenderSettings
from crt_tpu.scene.procedural import make_test_scene
from crt_tpu.utils.checks import (
    check_deterministic,
    check_finite,
    check_grads_finite,
)


def test_all_checks_pass():
    scene = make_test_scene(width=24, height=16, num_quads=4,
                            with_reflective=True, with_refractive=True)
    settings = RenderSettings(max_ray_depth=2)
    check_finite(scene, settings)
    check_deterministic(scene, settings)
    check_grads_finite(scene, settings)
