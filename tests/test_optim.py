"""Inverse-rendering optimization + checkpoint/resume."""

import numpy as np
import jax.numpy as jnp

from crt_tpu import RenderSettings, render_image
from crt_tpu.optim import fit_scene
from crt_tpu.scene.procedural import make_test_scene


def test_fit_recovers_albedo(tmp_path):
    scene = make_test_scene(width=24, height=16, num_quads=3,
                            with_reflective=False)
    settings = RenderSettings()
    target = render_image(scene, settings)

    # perturb the texture colors and fit them back
    rng = np.random.default_rng(0)
    noisy = jnp.clip(
        scene.tex_color_a
        + jnp.asarray(rng.normal(scale=0.2, size=scene.tex_color_a.shape),
                      jnp.float32),
        0.05, 1.0,
    )
    params = {"tex_color_a": noisy}
    params, losses = fit_scene(
        scene, target, params=params, settings=settings, steps=25
    )
    assert losses[-1] < losses[0] * 0.25, losses[:3] + losses[-3:]


def test_fit_checkpoint_resume(tmp_path):
    scene = make_test_scene(width=16, height=8, num_quads=2,
                            with_reflective=False)
    settings = RenderSettings()
    target = render_image(scene, settings)
    params0 = {"tex_color_a": scene.tex_color_a + 0.2}

    ckpt = str(tmp_path / "ckpt")
    p1, l1 = fit_scene(scene, target, params=dict(params0),
                       settings=settings, steps=6, checkpoint_dir=ckpt,
                       checkpoint_every=2)
    # resume: continues from the saved step rather than restarting
    p2, l2 = fit_scene(scene, target, params=dict(params0),
                       settings=settings, steps=10, checkpoint_dir=ckpt,
                       checkpoint_every=5)
    assert len(l2) < 10, "resume should skip completed steps"
    assert np.isfinite(l2).all()
