"""Any-hit occlusion kernel vs closest-hit reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from crt_tpu import RenderSettings, render_image
from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.pallas_trace import make_pallas_trace_fn
from crt_tpu.scene.procedural import make_test_scene


@pytest.fixture(scope="module")
def scene():
    return make_test_scene(width=64, height=48, num_quads=8,
                           with_reflective=False)


def test_occlusion_matches_closest_hit(scene):
    trace = make_pallas_trace_fn(scene, interpret=True, use_occlusion_kernel=True)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    hit = trace(o, d)
    # follow-up shadow-like query toward a point with varying r2
    rng = np.random.default_rng(0)
    r2 = jnp.asarray(rng.uniform(1.0, 400.0, size=o.shape[0]).astype(np.float32))
    active = hit.valid

    occ = np.asarray(trace.occluded(o, d, r2, active))
    t = np.asarray(hit.t)
    expect = np.asarray(hit.valid) & (t * t <= np.asarray(r2))

    act = np.asarray(active)
    np.testing.assert_array_equal(occ[act], expect[act])
    # inactive lanes report True (resolved) by contract
    assert occ[~act].all()


def test_render_uses_occlusion_path(scene, monkeypatch):
    """Render through the pallas backend (interpret) with the occlusion fast
    path vs with it disabled — identical images."""
    import crt_tpu.renderer as renderer

    orig = renderer.make_trace_fn

    def patched(scn, settings):
        if settings.backend == "pallas":
            return make_pallas_trace_fn(scn, interpret=True,
                                        use_occlusion_kernel=True)
        return orig(scn, settings)

    monkeypatch.setattr(renderer, "make_trace_fn", patched)
    with_occ = np.asarray(
        render_image(scene, RenderSettings(backend="pallas"), jit=False)
    )

    def patched_no_occ(scn, settings):
        if settings.backend == "pallas":
            # default factory: occlusion kernel NOT auto-wired
            return make_pallas_trace_fn(scn, interpret=True)
        return orig(scn, settings)

    monkeypatch.setattr(renderer, "make_trace_fn", patched_no_occ)
    without = np.asarray(
        render_image(scene, RenderSettings(backend="pallas"), jit=False)
    )
    np.testing.assert_allclose(with_occ, without, rtol=1e-6, atol=1e-7)


def test_shadow_apex_w_matches_apex(scene):
    """The w-parameterized occlusion (in-kernel directions, s <= 1) must
    agree with the normalized-direction apex path on every active lane up
    to boundary-rounding flips (the ray is identical; only the hit-test
    arithmetic's rounding differs)."""
    from crt_tpu.ops import vecmath

    trace = make_pallas_trace_fn(scene, interpret=True)
    assert hasattr(trace, "shadow_apex_w")
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    hit = trace(o, d)
    t = jnp.where(jnp.isfinite(hit.t), hit.t, 2.0)
    point = o + d * t[:, None]
    R = point.shape[0]
    lp = scene.light_position
    Ll = lp.shape[0]
    lv = lp[:, None, :] - point[None]
    r2 = jnp.sum(lv * lv, -1)
    ldir = vecmath.safe_normalize(lv)
    act = ((jnp.arange(R) % 6) != 0)[None] & jnp.ones((Ll, R), bool) \
        & (hit.tri >= 0)[None]
    shadow_o = point + 1e-2 * vecmath.safe_normalize(point)

    base = np.asarray(trace.shadow_apex(
        shadow_o, ldir, r2, lp, act, 2e-2
    ))
    w = np.asarray(trace.shadow_apex_w(point, shadow_o, lp, act, 2e-2))
    lanes = np.asarray(act)
    dis = (w != base) & lanes
    assert dis.mean() < 0.005, dis.mean()
