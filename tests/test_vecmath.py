"""Unit tests for batched vector math against scalar reference ports."""

import math

import numpy as np
import jax.numpy as jnp

from crt_tpu.ops import vecmath


def ref_refract(v, n, outside_ior, inside_ior):
    """Pure-python port of crt_vector.cpp:11-27."""
    v = np.array(v, np.float64)
    n = np.array(n, np.float64)
    cos_alpha = -v.dot(n)
    sin_alpha = math.sqrt(max(0.0, 1.0 - cos_alpha * cos_alpha))
    if sin_alpha > inside_ior / outside_ior:
        return None
    sin_beta = sin_alpha * outside_ior / inside_ior
    cos_beta = math.sqrt(1.0 - sin_beta * sin_beta)
    out = v + n * cos_alpha
    out = out / np.linalg.norm(out)
    out = out * sin_beta
    out = out + (-n) * cos_beta
    return out


def test_cross_dot_normalize():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(17, 3)).astype(np.float32)
    b = rng.normal(size=(17, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(vecmath.cross(a, b)), np.cross(a, b), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vecmath.dot(a, b)), np.sum(a * b, -1), rtol=1e-5
    )
    n = np.asarray(vecmath.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_reflect():
    v = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(vecmath.reflect(v, n))
    np.testing.assert_allclose(r, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_refract_matches_reference_port():
    rng = np.random.default_rng(1)
    for _ in range(50):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        if d.dot(n) > 0:
            n = -n
        o_ior, i_ior = 1.0, float(rng.uniform(1.0, 2.5))
        if rng.uniform() < 0.3:
            o_ior, i_ior = i_ior, o_ior  # exiting: TIR possible

        expect = ref_refract(d, n, o_ior, i_ior)
        got, ok = vecmath.refract(
            jnp.asarray(d, jnp.float32)[None],
            jnp.asarray(n, jnp.float32)[None],
            jnp.float32(o_ior),
            jnp.float32(i_ior),
        )
        if expect is None:
            assert not bool(ok[0])
        else:
            assert bool(ok[0])
            np.testing.assert_allclose(
                np.asarray(got[0]), expect, rtol=1e-4, atol=1e-5
            )


def test_rotation_row_vector_convention():
    # (1,0,0) * rotation_y(90 deg) should map +x to -z per the row convention.
    m = vecmath.rotation_y(jnp.float32(math.pi / 2))
    v = jnp.array([1.0, 0.0, 0.0])
    out = np.asarray(vecmath.rotate_rows(v, m))
    np.testing.assert_allclose(out, [0.0, 0.0, -1.0], atol=1e-6)
