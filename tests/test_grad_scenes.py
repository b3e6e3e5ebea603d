"""Gradient checks on REAL course scenes — where bookkeeping could break.

test_grad_contract.py proves the FD contract on a silhouette-free wall;
these tests take it to production paths (VERDICT r2 item 6):

  1. FD parity on 09-02-scene2 (528-triangle smooth-shaded ball, 1 light,
     shadows ON) with the loss restricted to an interior center crop.
     Smooth parameters only (light intensity/position, albedo, a vertex of
     a crop-interior triangle): visibility/shadow silhouettes are discrete
     (stop-gradient per the contract), so parameters that move silhouettes
     inside the crop are excluded by construction of the crop.
     Tolerances: rtol 2e-2 intensity/albedo (linear), 5e-2 light position
     and vertices (f32 FD noise through normalize/falloff chains).

  2. Iterative bank wavefront vs unrolled recursion gradients on a
     REFRACTIVE scene (branching Whitted tree): same hit ids, same path
     weights, different f32 summation order -> rtol 1e-3.

The scene-sharded (pmin/psum exchange) grad parity lives in
tests/test_scene_sharded.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crt_tpu import RenderSettings, load_scene, render_image
from crt_tpu.scene.procedural import make_test_scene

SCENE_0902 = "09-02-diffuse-smooth-shading/scene2.crtscene"


@pytest.fixture(scope="module")
def ball(scenes_dir):
    scene = load_scene(str(scenes_dir / SCENE_0902))
    # reduced res keeps CPU FD affordable; crop avoids the ball silhouette
    return scene.replace(width=64, height=36)


def _crop_loss(scene, settings=None, **replace):
    s = scene.replace(**replace)
    img = render_image(s, settings or RenderSettings(backend="bruteforce"),
                       jit=False)
    h, w = s.height, s.width
    crop = img[h // 4 : -h // 4, w // 4 : -w // 4]
    # non-uniform weighting so spatially-varying effects register
    wgt = jnp.cos(jnp.arange(crop.size, dtype=jnp.float32)).reshape(crop.shape)
    return jnp.sum(crop * (1.0 + 0.3 * wgt))


def _fd(loss, x0, idx, eps):
    flat = x0.ravel()
    best = None
    an = float(jax.grad(loss)(x0).ravel()[idx])
    for e in (eps, 3 * eps, 10 * eps):
        xp = flat.at[idx].add(e).reshape(x0.shape)
        xm = flat.at[idx].add(-e).reshape(x0.shape)
        fd = (float(loss(xp)) - float(loss(xm))) / (2 * e)
        err = abs(an - fd)
        if best is None or err < best[0]:
            best = (err, fd)
    return an, best[1], best[0]


def test_fd_real_scene_light_intensity(ball):
    loss = lambda x: _crop_loss(ball, light_intensity=x)
    an, fd, err = _fd(loss, ball.light_intensity, 0, eps=0.5)
    assert err <= 2e-2 * max(abs(an), abs(fd), 1e-3), (an, fd)


def test_fd_real_scene_albedo(ball):
    for idx in (0, 1, 2):
        loss = lambda x: _crop_loss(ball, tex_color_a=x)
        an, fd, err = _fd(loss, ball.tex_color_a, idx, eps=1e-3)
        assert err <= 2e-2 * max(abs(an), abs(fd), 1e-3), (idx, an, fd)


def test_fd_real_scene_light_position(ball):
    for idx in (0, 1, 2):
        loss = lambda x: _crop_loss(ball, light_position=x)
        an, fd, err = _fd(loss, ball.light_position, idx, eps=1e-3)
        assert err <= 5e-2 * max(abs(an), abs(fd), 1e-3), (idx, an, fd)


def test_fd_real_scene_interior_vertex(ball):
    """A vertex whose incident triangles all project inside the crop: its
    motion changes smooth normals/shading but no crop-visible silhouette."""
    import numpy as onp

    from crt_tpu.ops import camera as camera_ops
    from crt_tpu.ops.intersect import build_triangle_data, closest_hit_bruteforce
    from crt_tpu.renderer import make_tiler

    s = ball
    h, w = s.height, s.width
    rx, ry, _ = make_tiler(h, w)
    o, d = camera_ops.generate_rays(
        s.cam_position, s.cam_rotation, s.cam_tan_half_fov, w, h, rx, ry
    )
    tri = build_triangle_data(s.vertices, s.tri_vidx,
                              s.mat_backface[s.tri_material])
    hit = closest_hit_bruteforce(tri, o, d)
    # pick the triangle hit at the exact image center ray
    center = int(onp.argmin(
        onp.abs(onp.asarray(rx) - w / 2) + onp.abs(onp.asarray(ry) - h / 2)
    ))
    t_center = int(onp.asarray(hit.tri)[center])
    assert t_center >= 0, "center ray misses — crop premise broken"
    vidx = int(onp.asarray(s.tri_vidx)[t_center, 0])

    for coord in range(3):
        idx = vidx * 3 + coord
        loss = lambda x: _crop_loss(ball, vertices=x)
        an, fd, err = _fd(loss, ball.vertices, idx, eps=1e-3)
        assert err <= 5e-2 * max(abs(an), abs(fd), 1e-3), (coord, an, fd)


def test_iter_vs_recursive_gradients_refractive():
    """Gradients through the bank wavefront == the unrolled recursion on a
    branching refractive scene (same paths, f32 order differs)."""
    scene = make_test_scene(width=32, height=16, num_quads=5,
                            with_refractive=True)
    assert scene.has_refractive

    def loss(v, wavefront):
        s = scene.replace(vertices=v)
        img = render_image(
            s,
            RenderSettings(backend="bruteforce", max_ray_depth=2,
                           wavefront=wavefront),
            jit=False,
        )
        return jnp.sum(img ** 2)

    vi, gi = jax.value_and_grad(lambda v: loss(v, "iter"))(scene.vertices)
    vr, gr = jax.value_and_grad(lambda v: loss(v, "recursive"))(
        scene.vertices
    )
    np.testing.assert_allclose(float(vi), float(vr), rtol=1e-5)
    assert bool(jnp.all(jnp.isfinite(gi)))
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gr),
                               rtol=1e-3, atol=1e-6)
    assert float(jnp.abs(gi).max()) > 0
