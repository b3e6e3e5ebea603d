"""Camera ray generation vs a scalar f64 port of crt_camera.cpp:7-35."""

import math

import numpy as np
import jax.numpy as jnp

from crt_tpu.ops.camera import generate_rays


def ref_generate_ray(x, y, w, h, fov_deg, position, rotation):
    """Scalar port: raster -> NDC -> screen -> world."""
    dx = (x + 0.5) / w
    dy = (y + 0.5) / h
    sx = 2.0 * dx - 1.0
    sy = 1.0 - 2.0 * dy
    sx *= w / h
    t = math.tan(math.radians(fov_deg) * 0.5)
    sx *= t
    sy *= t
    v = np.array([sx, sy, -1.0])
    world = v @ np.asarray(rotation, np.float64)  # row-vector convention
    world /= np.linalg.norm(world)
    return np.asarray(position, np.float64), world


def test_raygen_matches_scalar_port():
    w, h = 64, 36
    fov = 57.0
    rng = np.random.default_rng(5)
    # random orthonormal rotation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    rotation = q.astype(np.float32)
    position = np.array([1.0, -2.0, 3.0], np.float32)

    xs = np.array([0, 31, 63, 10], np.float32)
    ys = np.array([0, 17, 35, 30], np.float32)
    o, d = generate_rays(
        jnp.asarray(position), jnp.asarray(rotation),
        jnp.float32(math.tan(math.radians(fov) / 2)),
        w, h, jnp.asarray(xs), jnp.asarray(ys),
    )
    for i, (x, y) in enumerate(zip(xs, ys)):
        eo, ed = ref_generate_ray(x, y, w, h, fov, position, rotation)
        np.testing.assert_allclose(np.asarray(o[i]), eo, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d[i]), ed, rtol=1e-5, atol=1e-6)


def test_default_fov_is_90(scenes_dir):
    from crt_tpu import load_scene

    s = load_scene(str(scenes_dir / "07-01-scene/scene0.crtscene"))
    np.testing.assert_allclose(float(s.cam_tan_half_fov), 1.0, rtol=1e-6)
