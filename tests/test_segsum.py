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
    monkeypatch.setattr(ps, "_pallas_available", lambda: True)
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


def test_banded_segsum_matches_scatter(monkeypatch):
    """Rank-remapped (banded) accumulation must equal the plain scatter in
    ORIGINAL segment ids, with ids clustered per ray tile (the skip path)
    and scattered (no skip) alike."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(ps, "_pallas_available", lambda: True)

    rng = np.random.default_rng(11)
    R, K, T = 4096, 5, 700
    rank = jnp.asarray(rng.permutation(T).astype(np.int32))
    # tile-banded ids: each 1024-ray tile draws from a narrow id window
    tri = np.empty(R, np.int32)
    for t0 in range(0, R, 1024):
        lo = rng.integers(0, T - 60)
        tri[t0 : t0 + 1024] = rng.integers(lo, lo + 60, size=1024)
    tri[::97] = -1  # sprinkle dead lanes
    g = rng.normal(size=(K, R)).astype(np.float32)

    out = np.asarray(
        ps.segment_accumulate_banded(
            jnp.asarray(tri), jnp.asarray(g), T, rank
        )
    )
    expected = _reference(tri, g, T)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-4)


def test_banded_vjp_drops_miss_lanes_exactly(monkeypatch):
    """packed_gather_ranked's VJP band-drops miss lanes (tri = -1).  That
    is exact ONLY if miss-lane cotangents are exactly zero — assert it by
    comparing full render gradients (scene with plenty of background
    pixels) between the interpret-mode banded kernel and the XLA scatter."""
    import functools

    from jax.experimental import pallas as pl

    from crt_tpu import RenderSettings, render_image
    from crt_tpu.scene.procedural import make_test_scene

    scene = make_test_scene(width=32, height=24, num_quads=2)

    def grads():
        def loss(v):
            img = render_image(
                scene.replace(vertices=v), RenderSettings(), jit=False
            )
            return jnp.sum(img ** 2)

        return np.asarray(jax.grad(loss)(scene.vertices))

    monkeypatch.setenv("CRT_SEGSUM", "scatter")
    g_scatter = grads()

    monkeypatch.setenv("CRT_SEGSUM", "matmul")
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(ps, "_pallas_available", lambda: True)
    g_kernel = grads()

    np.testing.assert_allclose(g_kernel, g_scatter, rtol=2e-6, atol=1e-6)


def test_kernel_subtiled_matches_scatter(monkeypatch):
    """Sub-tiled grid blocks (r_sub < r_tile, round 4): every (r_tile,
    r_sub) combination must match the scatter reference — the sub-bands
    gate per-sub one-hot matmuls inside one grid step."""
    rng = np.random.default_rng(11)
    R, K, T = 9000, 7, 1200
    tri = rng.integers(-1, T, size=R).astype(np.int32)
    g = rng.normal(size=(K, R)).astype(np.float32)

    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(ps, "_pallas_available", lambda: True)
    expected = _reference(tri, g, T)
    for r_tile, r_sub in ((4096, 1024), (8192, 2048), (2048, 2048)):
        out = np.asarray(ps.segment_accumulate_matmul(
            jnp.asarray(tri), jnp.asarray(g), T, r_tile, r_sub
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-4,
                                   err_msg=f"{r_tile}/{r_sub}")
