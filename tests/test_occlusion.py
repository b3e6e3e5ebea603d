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

    # Every disagreeing lane must be a BOUNDARY lane: some triangle's f64
    # decision quantity sits at a flip point — either the documented
    # parallel-eps deviation (|n·d̂| below PARALLEL_EPS while |n·w| is
    # above: the w-kernel can register a grazing blocker the d̂-path drops)
    # or a quantity within rounding distance of its boundary (t ≈ 0,
    # t² ≈ r², edge half-space ≈ 0).  A tolerance-only bound would let a
    # real semantics regression hide under the flip-rate budget.
    from crt_tpu.ops.intersect import PARALLEL_EPS

    verts = np.asarray(scene.vertices, np.float64)
    tvi = np.asarray(scene.tri_vidx)
    v0, v1, v2 = verts[tvi[:, 0]], verts[tvi[:, 1]], verts[tvi[:, 2]]
    n_t = np.cross(v1 - v0, v2 - v0)
    n_t /= np.maximum(np.linalg.norm(n_t, axis=-1, keepdims=True), 1e-300)
    m_t = np.stack(
        [np.cross(n_t, v1 - v0), np.cross(n_t, v2 - v1),
         np.cross(n_t, v0 - v2)], axis=1,
    )  # [T, 3edges, 3]
    c_t = np.stack(
        [np.sum(m_t[:, 0] * v0, -1), np.sum(m_t[:, 1] * v1, -1),
         np.sum(m_t[:, 2] * v2, -1)], axis=1,
    )
    point_np = np.asarray(point, np.float64)
    so_np = np.asarray(shadow_o, np.float64)
    lp_np = np.asarray(lp, np.float64)
    REL = 1e-3  # f32 rounding across the two arithmetic orders

    for l, lane in zip(*np.nonzero(dis)):
        P = point_np[lane]
        ob = so_np[lane]
        wv = lp_np[l] - P
        wlen = np.linalg.norm(wv)
        dh = wv / wlen
        r2l = wlen * wlen
        nd_hat = n_t @ dh
        nd_w = n_t @ wv
        opd = np.sum(n_t * v0, -1) - n_t @ ob
        with np.errstate(divide="ignore", invalid="ignore"):
            t_hat = opd / nd_hat  # [T]
        edge = np.einsum("tej,j->te", m_t, ob) - c_t \
            + t_hat[:, None] * np.einsum("tej,j->te", m_t, dh)
        inside = (edge >= -REL * np.abs(c_t).max()).all(-1)
        hits_seg = inside & (t_hat >= -REL) & (t_hat * t_hat <= r2l * (1 + REL))
        eps_flip = hits_seg & (np.abs(nd_hat) < PARALLEL_EPS * (1 + REL)) \
            & (np.abs(nd_w) >= PARALLEL_EPS * (1 - REL))
        margin = np.minimum.reduce([
            np.abs(np.abs(nd_hat) - PARALLEL_EPS) / PARALLEL_EPS,
            np.abs(t_hat * t_hat - r2l) / r2l,
            np.abs(t_hat) / max(wlen, 1e-30),
            np.abs(edge).min(-1) / max(np.abs(c_t).max(), 1e-30),
        ])
        boundary = hits_seg & (margin < REL)
        assert eps_flip.any() or boundary.any(), (
            f"lane ({l},{lane}) disagrees but no triangle is at a decision "
            f"boundary — semantics regression?"
        )


def test_apex_w_parallel_eps_boundary_pinned():
    """Pin the w-kernel's documented parallel-eps deviation with a
    CONSTRUCTED grazing blocker (VERDICT r4 #5).

    The kernel gates the parallel-ray test on |n·w| (unnormalized, w =
    light - point) where the reference and the d̂-path gate on |n·d̂|
    (crt_intersection.cpp:52) — stricter by |w|.  Geometry: a huge
    triangle in z=0, shadow segment grazing it with n·d̂ = 5e-7 (inside
    PARALLEL_EPS=1e-6 -> the d̂-path DROPS the blocker) but |w| = 1e3 so
    n·w = 5e-4 (outside -> the w-kernel REGISTERS it).  This is the
    committed, intended behavior; if a normalization change silently
    shifts the kernel's epsilon semantics, this test fails.
    """
    from crt_tpu.ops import vecmath
    from crt_tpu.ops.pallas_trace import TILE_RAYS
    from crt_tpu.scene.json_loader import scene_from_dict

    data = {
        "settings": {"background_color": [0, 0, 0],
                     "image_settings": {"width": 32, "height": 32}},
        "camera": {"position": [0, 0, 5],
                   "matrix": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
        "lights": [{"position": [0, 0, 10], "intensity": 100}],
        "materials": [{"type": "diffuse", "albedo": [1, 1, 1],
                       "smooth_shading": False}],
        "objects": [{"material_index": 0,
                     "vertices": [-10.0, -10.0, 0.0,
                                  10.0, -10.0, 0.0,
                                  0.0, 10.0, 0.0],
                     "triangles": [0, 1, 2]}],
    }
    s = scene_from_dict(data)
    trace = make_pallas_trace_fn(s, interpret=True)

    R = TILE_RAYS
    P0 = np.array([0.0, 0.0, -1e-9])
    dh = np.array([1.0, 0.0, 5e-7])
    dh /= np.linalg.norm(dh)
    lp = (P0 + 1e3 * dh)[None].astype(np.float32)  # |w| = 1e3

    point = jnp.asarray(np.tile(P0, (R, 1)), jnp.float32)
    shadow_o = point  # zero bias: the geometry is the boundary case itself
    act = jnp.zeros((1, R), bool).at[0, 0].set(True)
    wv = jnp.asarray(lp) - point
    r2 = jnp.sum((jnp.asarray(lp)[:, None, :] - point[None]) ** 2, -1)
    ldir = vecmath.safe_normalize(jnp.asarray(lp)[:, None, :] - point[None])

    # sanity: the construction really straddles PARALLEL_EPS in f32
    n = np.array([0.0, 0.0, 1.0])
    nd_hat = float(np.asarray(ldir, np.float32)[0, 0] @ n)
    nd_w = float(np.asarray(wv, np.float32)[0] @ n)
    assert abs(nd_hat) < 1e-6 * 0.75, nd_hat
    assert abs(nd_w) > 1e-6 * 100, nd_w

    occ_hat = np.asarray(trace.shadow_apex(
        shadow_o, ldir, r2, jnp.asarray(lp), act, 1e-4
    )).reshape(-1)
    occ_w = np.asarray(trace.shadow_apex_w(
        point, shadow_o, jnp.asarray(lp), act, 1e-4
    )).reshape(-1)

    assert not occ_hat[0], "d̂-path must DROP the sub-eps grazing blocker"
    assert occ_w[0], "w-kernel must REGISTER the grazing blocker (n·w > eps)"


def test_apex_w_lane_gate_parity(scene, monkeypatch):
    """The in-kernel per-cluster lane gate (CRT_APEX_LANE_GATE) skips
    member walks no lane can reach — occlusion bits must be IDENTICAL."""
    import crt_tpu.ops.pallas_trace as ptr
    from crt_tpu.ops import vecmath

    trace = make_pallas_trace_fn(scene, interpret=True)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    hit = trace(o, d)
    t = jnp.where(jnp.isfinite(hit.t), hit.t, 2.0)
    point = o + d * t[:, None]
    lp = scene.light_position
    Ll = lp.shape[0]
    act = jnp.ones((Ll, point.shape[0]), bool) & (hit.tri >= 0)[None]
    shadow_o = point + 1e-2 * vecmath.safe_normalize(point)

    monkeypatch.setattr(ptr, "_APEX_LANE_GATE", False)
    base = np.asarray(trace.shadow_apex_w(point, shadow_o, lp, act, 2e-2))
    monkeypatch.setattr(ptr, "_APEX_LANE_GATE", True)
    gated = np.asarray(trace.shadow_apex_w(point, shadow_o, lp, act, 2e-2))
    np.testing.assert_array_equal(base, gated)
