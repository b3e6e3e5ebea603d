"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crt_tpu import RenderSettings, render_image
from crt_tpu.parallel.sharded import (
    inverse_render_step,
    make_mesh,
    render_image_sharded,
)
from crt_tpu.scene.procedural import make_test_scene


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def scene():
    return make_test_scene(width=40, height=32, num_quads=5)


def test_sharded_render_matches_single_device(mesh, scene):
    single = np.asarray(render_image(scene, RenderSettings()))
    sharded = np.asarray(render_image_sharded(scene, RenderSettings(), mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_sharded_render_nondivisible_rows(mesh):
    scene = make_test_scene(width=16, height=30, num_quads=3)  # 30 % 8 != 0
    single = np.asarray(render_image(scene, RenderSettings()))
    sharded = np.asarray(render_image_sharded(scene, RenderSettings(), mesh))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_inverse_render_step_reduces_loss(mesh, scene):
    settings = RenderSettings()
    target = render_image_sharded(scene, settings, mesh)

    # perturb vertices, then take gradient steps back toward the target
    rng = np.random.default_rng(1)
    noisy = scene.vertices + jnp.asarray(
        rng.normal(scale=0.05, size=scene.vertices.shape).astype(np.float32)
    )
    params = {"vertices": noisy}

    losses = []
    for _ in range(3):
        params, loss = inverse_render_step(
            scene.replace(vertices=params["vertices"]),
            target,
            params={"vertices": params["vertices"]},
            settings=settings,
            mesh=mesh,
            lr=2e-2,
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
