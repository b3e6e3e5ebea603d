"""Occupancy lane compaction (round 5): bit-exact parity + permutation.

The transmissive shadow march and the iter pool's bounce traces permute
active lanes to the front before tracing (shade.lane_partition) so sparse
wavefronts form dead tiles the binned launch skips.  These tests pin:

  - lane_partition is a stable partition (actives first, original order
    kept, pos/perm mutually inverse);
  - a refractive render with transmissive shadows is BIT-IDENTICAL with
    compaction on vs off (both the march compaction and the pool trace
    compaction), through the pallas backend in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crt_tpu import RenderSettings, render_image
from crt_tpu.ops import shade as shade_mod
from crt_tpu.ops import shade_iter as shade_iter_mod
from crt_tpu.ops.shade import lane_partition
from crt_tpu.scene.procedural import make_test_scene


def test_lane_partition_stable_inverse():
    rng = np.random.default_rng(7)
    for n, p_act in ((16, 0.3), (1024, 0.05), (2048, 0.9), (64, 0.0), (64, 1.0)):
        alive = jnp.asarray(rng.uniform(size=n) < p_act)
        pos, perm = jax.jit(lane_partition)(alive)
        pos = np.asarray(pos)
        perm = np.asarray(perm)
        a = np.asarray(alive)
        n_act = int(a.sum())
        # mutually inverse permutations
        assert sorted(pos) == list(range(n))
        np.testing.assert_array_equal(perm[pos], np.arange(n))
        np.testing.assert_array_equal(pos[perm], np.arange(n))
        # actives first, stable (original order preserved within each class)
        np.testing.assert_array_equal(perm[:n_act], np.nonzero(a)[0])
        np.testing.assert_array_equal(perm[n_act:], np.nonzero(~a)[0])


@pytest.mark.parametrize("flag", ["march", "pool"])
def test_refractive_render_bit_identical_with_compaction(flag, monkeypatch):
    """Transmissive-shadow refractive render: compaction on == off, bitwise.

    A/B by patching the module globals (trace-time reads), never by
    reloading (NamedTuple identities).  Pallas backend in interpret mode so
    the binned launch (whose tile skipping the compaction feeds) is the one
    under test.
    """
    import crt_tpu.renderer as renderer
    from crt_tpu.ops.pallas_trace import make_pallas_trace_fn

    orig = renderer.make_trace_fn

    def patched(scn, settings):
        if settings.backend == "pallas":
            return make_pallas_trace_fn(scn, interpret=True)
        return orig(scn, settings)

    monkeypatch.setattr(renderer, "make_trace_fn", patched)

    scene = make_test_scene(width=64, height=32, num_quads=6,
                            with_refractive=True)
    settings = RenderSettings(backend="pallas", max_ray_depth=3,
                              wavefront="iter")

    monkeypatch.setattr(shade_mod, "_SHADOW_COMPACT", flag == "march")
    monkeypatch.setattr(shade_iter_mod, "_POOL_COMPACT", flag == "pool")
    img_on = np.asarray(render_image(scene, settings, jit=False))

    monkeypatch.setattr(shade_mod, "_SHADOW_COMPACT", False)
    monkeypatch.setattr(shade_iter_mod, "_POOL_COMPACT", False)
    img_off = np.asarray(render_image(scene, settings, jit=False))

    assert np.isfinite(img_on).all()
    np.testing.assert_array_equal(img_on, img_off)


def test_march_split_bit_identical(monkeypatch):
    """The transmissive-march SPLIT (glass-gate + w-kernel opaque path +
    narrow march) must reproduce the full-width faithful walk bit-exactly
    on a scene with no grazing-glass boundary lanes."""
    import crt_tpu.renderer as renderer
    from crt_tpu.ops.pallas_trace import make_pallas_trace_fn

    orig = renderer.make_trace_fn

    def patched(scn, settings):
        if settings.backend == "pallas":
            return make_pallas_trace_fn(scn, interpret=True)
        return orig(scn, settings)

    monkeypatch.setattr(renderer, "make_trace_fn", patched)
    monkeypatch.setattr(shade_mod, "_SHADOW_COMPACT", False)
    monkeypatch.setattr(shade_iter_mod, "_POOL_COMPACT", False)

    scene = make_test_scene(width=64, height=32, num_quads=6,
                            with_refractive=True)
    settings = RenderSettings(backend="pallas", max_ray_depth=3,
                              wavefront="iter")

    monkeypatch.setattr(shade_mod, "_MARCH_SPLIT", True)
    img_on = np.asarray(render_image(scene, settings, jit=False))
    monkeypatch.setattr(shade_mod, "_MARCH_SPLIT", False)
    img_off = np.asarray(render_image(scene, settings, jit=False))

    assert np.isfinite(img_on).all()
    np.testing.assert_array_equal(img_on, img_off)


def test_refr_ray_hit_gate_superset():
    """The glass gate must flag every lane whose shadow ray actually hits
    refractive geometry (superset; exactness is the kernel's business)."""
    from crt_tpu.ops import camera as camera_ops
    from crt_tpu.ops.pallas_trace import make_pallas_trace_fn
    from crt_tpu.renderer import make_tiler
    from crt_tpu.scene.types import MATERIAL_REFRACTIVE

    scene = make_test_scene(width=64, height=32, num_quads=6,
                            with_refractive=True)
    trace = make_pallas_trace_fn(scene, interpret=True)
    assert hasattr(trace, "refr_ray_hit_w")

    rx, ry, _ = make_tiler(scene.height, scene.width)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height, rx, ry,
    )
    hit = trace(o, d)
    t = jnp.where(hit.tri >= 0, hit.t, 0.0)
    point = o + d * t[:, None]
    shadow_o = point + 1e-3 * jnp.asarray([0.0, 1.0, 0.0])
    lp = scene.light_position
    act = jnp.broadcast_to((hit.tri >= 0)[None], (lp.shape[0], o.shape[0]))

    gate = np.asarray(trace.refr_ray_hit_w(point, shadow_o, lp, act, 2e-3))

    # brute-force truth: does the (uncapped) shadow ray hit ANY refractive
    # triangle?  march through ALL triangles in f64
    verts = np.asarray(scene.vertices, np.float64)
    tvi = np.asarray(scene.tri_vidx)
    mat = np.asarray(scene.mat_type)[np.asarray(scene.tri_material)]
    glass = mat == MATERIAL_REFRACTIVE
    gv0 = verts[tvi[glass, 0]]
    gv1 = verts[tvi[glass, 1]]
    gv2 = verts[tvi[glass, 2]]
    n_t = np.cross(gv1 - gv0, gv2 - gv0)
    nl = np.linalg.norm(n_t, axis=-1, keepdims=True)
    n_t = n_t / np.maximum(nl, 1e-300)

    so = np.asarray(shadow_o, np.float64)
    pp = np.asarray(point, np.float64)
    lpn = np.asarray(lp, np.float64)
    for l in range(lpn.shape[0]):
        w = lpn[l][None] - pp  # [R, 3]
        nd = w @ n_t.T  # [R, T]
        opd = (n_t * gv0).sum(-1)[None] - so @ n_t.T
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = opd / nd
        hitp = so[:, None, :] + tt[..., None] * w[:, None, :]
        # inside test via edge half-spaces
        ok = (np.abs(nd) >= 2e-6) & (tt >= 1e-6)
        for e, (a, b) in enumerate(((gv0, gv1), (gv1, gv2), (gv2, gv0))):
            m = np.cross(n_t, b - a)
            ok &= ((hitp - a[None]) * m[None]).sum(-1) >= 1e-9
        truth = ok.any(-1) & np.asarray(act)[l]
        flagged = gate[l]
        missed = truth & ~flagged
        assert not missed.any(), f"gate missed {missed.sum()} glass lanes"


def test_march_gate_beyond_light_glass(monkeypatch):
    """Pin the two gate semantics on a CONSTRUCTED tunnel scene: a tilted
    glass pane BEYOND the light bends extended shadow rays into a nearby
    ceiling (last-segment hit within the light distance), so the
    reference's uncapped walk (crt_renderer.cpp:29-44) shades the floor
    as OCCLUDED.  BOTH routers (merged one-pass default and the separate
    uncapped gate) must be bit-identical to the unconditional faithful
    march — beyond-the-light glass bends included."""
    import crt_tpu.renderer as renderer
    from crt_tpu.ops.pallas_trace import make_pallas_trace_fn
    from crt_tpu.scene.json_loader import scene_from_dict

    orig = renderer.make_trace_fn

    def patched(scn, settings):
        if settings.backend == "pallas":
            return make_pallas_trace_fn(scn, interpret=True)
        return orig(scn, settings)

    monkeypatch.setattr(renderer, "make_trace_fn", patched)
    monkeypatch.setattr(shade_mod, "_SHADOW_COMPACT", False)
    monkeypatch.setattr(shade_iter_mod, "_POOL_COMPACT", False)

    big = 20.0
    z_glass = 4.0
    data = {
        "settings": {"background_color": [0, 0, 0],
                     "image_settings": {"width": 32, "height": 32}},
        # camera at z=1 looking straight down -z at the floor
        "camera": {"position": [0, 0, 1.0],
                   "matrix": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
        "lights": [{"position": [0, 0, 2.0], "intensity": 200}],
        "materials": [
            {"type": "diffuse", "albedo": [1, 1, 1],
             "smooth_shading": False},
            {"type": "refractive", "ior": 1.5, "albedo": [1, 1, 1],
             "smooth_shading": False},
        ],
        "objects": [
            # floor at z=0 (two triangles)
            {"material_index": 0,
             "vertices": [-big, -big, 0.0, big, -big, 0.0,
                          big, big, 0.0, -big, big, 0.0],
             "triangles": [0, 1, 2, 0, 2, 3]},
            # glass pane tilted 45 deg in x-z, through (0, 0, z_glass),
            # ABOVE the light -> only extended shadow rays reach it
            {"material_index": 1,
             "vertices": [-big, -big, z_glass - big,
                          big, -big, z_glass + big,
                          big, big, z_glass + big,
                          -big, big, z_glass - big],
             "triangles": [0, 1, 2, 0, 2, 3]},
            # ceiling at z=5.5: the bent continuation hits it within the
            # original light distance (sqrt(r2) = 2 from the floor)
            {"material_index": 0,
             "vertices": [-big, -big, 5.5, big, -big, 5.5,
                          big, big, 5.5, -big, big, 5.5],
             "triangles": [0, 2, 1, 0, 3, 2]},
        ],
    }
    scene = scene_from_dict(data)
    settings = RenderSettings(backend="pallas", max_ray_depth=3,
                              wavefront="iter")

    monkeypatch.setattr(shade_mod, "_MARCH_SPLIT", False)
    faithful = np.asarray(render_image(scene, settings, jit=False))
    # sanity: the tunnel must actually shadow the floor (the bent
    # continuation lands within the light distance) — otherwise this
    # scene stopped exercising beyond-the-light glass
    lit_only = np.asarray(render_image(
        scene, settings.replace(compat_no_shadows=True), jit=False))
    assert (np.abs(lit_only - faithful).max(-1) > 1e-6).any()

    monkeypatch.setattr(shade_mod, "_MARCH_SPLIT", True)
    monkeypatch.setattr(shade_mod, "_MARCH_GATE", "uncapped")
    uncapped = np.asarray(render_image(scene, settings, jit=False))
    np.testing.assert_array_equal(uncapped, faithful)

    monkeypatch.setattr(shade_mod, "_MARCH_GATE", "merged")
    merged = np.asarray(render_image(scene, settings, jit=False))
    np.testing.assert_array_equal(merged, faithful)
