"""Scene-partitioned rendering on a 2-D (rays x scene) CPU mesh."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from crt_tpu import RenderSettings, render_image
from crt_tpu.parallel.scene_sharded import render_image_scene_sharded
from crt_tpu.scene.procedural import make_test_scene


@pytest.fixture(scope="module")
def mesh2d():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("rays", "scene"))


def test_scene_sharded_matches_single_device(mesh2d):
    scene = make_test_scene(width=40, height=24, num_quads=7,
                            with_reflective=True)
    single = np.asarray(render_image(scene, RenderSettings(backend="bruteforce")))
    sharded = np.asarray(
        render_image_scene_sharded(scene, RenderSettings(), mesh2d)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_scene_sharded_nondivisible_triangles(mesh2d):
    # 3 quads -> floor(2) + 3 = 5 triangles; 5 % 4 != 0 -> padding path
    scene = make_test_scene(width=16, height=8, num_quads=3,
                            with_reflective=False)
    assert scene.num_triangles % 4 != 0
    single = np.asarray(render_image(scene, RenderSettings(backend="bruteforce")))
    sharded = np.asarray(
        render_image_scene_sharded(scene, RenderSettings(), mesh2d)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
