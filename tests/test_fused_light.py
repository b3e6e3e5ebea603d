"""Fused direct-lighting VJP (ops/shade.light_lum).

Contract: with ``fused_light_vjp=True`` (the default) the forward image is
BIT-IDENTICAL to the inline autodiff chain (same ops, same order), and the
gradients w.r.t. every trainable parameter match jax.grad of the inline
chain to f32 roundoff — the hand-written backward recomputes the per-light
chain analytically (d lum/d n = k r^-3 v, d lum/d p = 3 k cos/r^2 v - k n/r^3,
d lum/d I = cos/(4 pi r^2)) instead of storing [Ll, R](,3) residuals.

Reference semantics: crt_renderer.cpp:81-96 (intensity/(4 pi r^2) * cos law).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crt_tpu import RenderSettings, render_image
from crt_tpu.scene.procedural import make_test_scene


@pytest.fixture(scope="module")
def scene():
    # with_edges: textured albedo so tex tables get nonzero grads too
    return make_test_scene(width=48, height=32, num_quads=5, with_edges=True)


def _loss(scene, settings):
    def f(params):
        img = render_image(scene.replace(**params), settings, jit=False)
        return jnp.sum(img * img)

    return f


def _params(scene):
    return {
        "vertices": scene.vertices,
        "light_intensity": scene.light_intensity,
        "light_position": scene.light_position,
        "cam_position": scene.cam_position,
    }


def test_forward_bit_identical(scene):
    on = np.asarray(render_image(scene, RenderSettings(fused_light_vjp=True)))
    off = np.asarray(
        render_image(scene, RenderSettings(fused_light_vjp=False))
    )
    np.testing.assert_array_equal(on, off)


def test_grads_match_autodiff(scene):
    p = _params(scene)
    g_on = jax.grad(_loss(scene, RenderSettings(fused_light_vjp=True)))(p)
    g_off = jax.grad(_loss(scene, RenderSettings(fused_light_vjp=False)))(p)
    for k in p:
        a, b = np.asarray(g_on[k]), np.asarray(g_off[k])
        assert np.isfinite(a).all(), k
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6, err_msg=k)
        assert np.abs(b).max() > 0, f"degenerate test: zero grad for {k}"


def test_grads_match_autodiff_iter_wavefront(scene):
    """The bank wavefront (shade_iter) shares light_lum — same parity."""
    p = _params(scene)
    s_on = RenderSettings(fused_light_vjp=True, wavefront="iter")
    s_off = RenderSettings(fused_light_vjp=False, wavefront="iter")
    g_on = jax.grad(_loss(scene, s_on))(p)
    g_off = jax.grad(_loss(scene, s_off))(p)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(g_on[k]), np.asarray(g_off[k]),
            rtol=2e-5, atol=1e-6, err_msg=k,
        )
