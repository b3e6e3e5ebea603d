"""Progressive GI accumulation (crt_tpu.progressive).

Pass-0 bit-exactness vs the single-shot render, per-pass stream
decorrelation, mean-of-passes math, and orbax checkpoint/resume.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from crt_tpu import RenderSettings, render_image, render_progressive
from crt_tpu.scene.procedural import make_test_scene


@pytest.fixture(scope="module")
def gi_scene():
    scene = make_test_scene(width=24, height=16, num_quads=4,
                            with_reflective=False)
    return scene.replace(gi_on=True)


@pytest.fixture(scope="module")
def gi_settings():
    return RenderSettings(backend="bruteforce", max_ray_depth=1,
                          diffuse_reflection_ray_count=2)


def test_pass0_bit_exact(gi_scene, gi_settings):
    single = np.asarray(render_image(gi_scene, gi_settings))
    prog = np.asarray(render_progressive(gi_scene, gi_settings, passes=1))
    np.testing.assert_array_equal(prog, single)


def test_salted_passes_decorrelate(gi_scene, gi_settings):
    a = np.asarray(render_image(gi_scene, gi_settings, gi_salt=jnp.uint32(0)))
    b = np.asarray(render_image(gi_scene, gi_settings, gi_salt=jnp.uint32(1)))
    c = np.asarray(render_image(gi_scene, gi_settings, gi_salt=jnp.uint32(2)))
    # different salts draw different GI samples...
    assert (a != b).any() and (b != c).any()
    # ...but deterministically per salt
    b2 = np.asarray(render_image(gi_scene, gi_settings, gi_salt=jnp.uint32(1)))
    np.testing.assert_array_equal(b, b2)


def test_progressive_is_mean_of_salted_passes(gi_scene, gi_settings):
    imgs = [
        np.asarray(render_image(gi_scene, gi_settings, gi_salt=jnp.uint32(p)))
        for p in range(3)
    ]
    prog = np.asarray(render_progressive(gi_scene, gi_settings, passes=3))
    np.testing.assert_allclose(prog, np.mean(imgs, axis=0), atol=1e-6)


def test_checkpoint_resume(gi_scene, gi_settings, tmp_path):
    ckpt = str(tmp_path / "prog")
    # interrupted run: 2 of 4 passes, checkpointed every pass
    partial = render_progressive(
        gi_scene, gi_settings, passes=2, checkpoint_dir=ckpt,
        checkpoint_every=1,
    )
    assert partial is not None
    # resume to 4 passes must equal the uninterrupted accumulation
    resumed = np.asarray(
        render_progressive(gi_scene, gi_settings, passes=4,
                           checkpoint_dir=ckpt, checkpoint_every=1)
    )
    straight = np.asarray(
        render_progressive(gi_scene, gi_settings, passes=4)
    )
    np.testing.assert_allclose(resumed, straight, atol=1e-6)


def test_unsalted_render_unchanged(gi_scene, gi_settings):
    """gi_salt=None must leave the existing render path bit-identical."""
    a = np.asarray(render_image(gi_scene, gi_settings))
    b = np.asarray(render_image(gi_scene, gi_settings, gi_salt=jnp.uint32(0)))
    np.testing.assert_array_equal(a, b)
