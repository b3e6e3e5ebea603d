"""MXU segment-matmul VJP (crt_tpu.ops.pallas_segsum).

The kernel must equal the XLA scatter-add it replaces up to f32 summation
order, skip out-of-range ids, and leave gradients of the full render
unchanged.  The Pallas kernel itself runs here in interpret mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from crt_tpu.ops import pallas_segsum as ps


def _reference(tri, g, T):
    valid = (tri >= 0) & (tri < T)
    safe = np.where(valid, tri, 0)
    out = np.zeros((g.shape[0], T), np.float64)
    for r in range(tri.shape[0]):
        if valid[r]:
            out[:, safe[r]] += g[:, r]
    return out.astype(np.float32)


def test_kernel_matches_scatter(monkeypatch):
    rng = np.random.default_rng(7)
    R, K, T = 3000, 9, 500
    tri = rng.integers(-1, T, size=R).astype(np.int32)
    g = rng.normal(size=(K, R)).astype(np.float32)

    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    out = np.asarray(
        ps.segment_accumulate_matmul(jnp.asarray(tri), jnp.asarray(g), T)
    )
    expected = _reference(tri, g, T)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-4)


def test_packed_gather_forward_and_grad():
    rng = np.random.default_rng(3)
    K, T, R = 6, 40, 200
    packed = jnp.asarray(rng.normal(size=(K, T)).astype(np.float32))
    tri = jnp.asarray(rng.integers(0, T, size=R).astype(np.int32))

    out = ps.packed_gather(packed, tri)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(packed[:, tri]))

    def loss(p):
        return jnp.sum(ps.packed_gather(p, tri) ** 2)

    g_custom = jax.grad(loss)(packed)
    g_plain = jax.grad(lambda p: jnp.sum(p[:, tri] ** 2))(packed)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_plain), rtol=1e-5, atol=1e-5
    )


def test_render_grad_unchanged_by_custom_vjp():
    """End-to-end: gradients through hit_attributes (which now routes the
    gather through packed_gather) match finite differences."""
    from crt_tpu import RenderSettings, render_image
    from crt_tpu.scene.procedural import make_test_scene

    scene = make_test_scene(width=16, height=12, num_quads=3)

    def loss(lights):
        img = render_image(
            scene.replace(light_intensity=lights), RenderSettings(),
            jit=False,
        )
        return jnp.sum(img)

    g = jax.grad(loss)(scene.light_intensity)
    eps = 1e-2
    for i in range(scene.light_intensity.shape[0]):
        li = scene.light_intensity.at[i].add(eps)
        lo = scene.light_intensity.at[i].add(-eps)
        fd = (loss(li) - loss(lo)) / (2 * eps)
        # rtol bounded by f32 cancellation in the FD numerator
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-2)
