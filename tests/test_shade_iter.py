"""Iterative bank-wavefront shading (crt_tpu.ops.shade_iter).

Contract: identical radiance to the unrolled recursion (crt_tpu.ops.shade)
up to f32 summation order on every non-GI scene, zero dropped children at
the default bank count for depth <= 3 branching, O(1) trace-time program
count, and reverse-mode differentiability through the scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crt_tpu import RenderSettings, render_image
from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.shade import shade_wavefront
from crt_tpu.ops.shade_iter import shade_wavefront_iter_with_stats
from crt_tpu.renderer import make_tiler, make_trace_fn, use_iterative_wavefront
from crt_tpu.scene.procedural import make_test_scene


def _render_both(scene, **settings_kw):
    rec = np.asarray(
        render_image(scene, RenderSettings(wavefront="recursive",
                                           **settings_kw))
    )
    it = np.asarray(
        render_image(scene, RenderSettings(wavefront="iter", **settings_kw))
    )
    return rec, it


def test_matches_recursive_reflective_refractive():
    scene = make_test_scene(
        width=48, height=32, num_quads=8,
        with_reflective=True, with_refractive=True,
    )
    rec, it = _render_both(scene)
    np.testing.assert_allclose(it, rec, atol=2e-6)


def test_matches_recursive_with_head_compat():
    scene = make_test_scene(
        width=32, height=24, num_quads=6,
        with_reflective=True, with_refractive=True,
    )
    rec, it = _render_both(scene, head_compat=True)
    np.testing.assert_allclose(it, rec, atol=2e-6)


def test_matches_recursive_deep_depth():
    scene = make_test_scene(
        width=32, height=24, num_quads=6,
        with_reflective=True, with_refractive=True,
    )
    rec, it = _render_both(scene, max_ray_depth=4)
    np.testing.assert_allclose(it, rec, atol=1e-5)


def test_refractions_off_refractive_is_black():
    scene = make_test_scene(
        width=32, height=24, num_quads=6, with_refractive=True,
    ).replace(refractions_on=False)
    rec, it = _render_both(scene)
    np.testing.assert_allclose(it, rec, atol=2e-6)


def test_zero_drops_at_default_banks():
    scene = make_test_scene(
        width=32, height=32, num_quads=8,
        with_reflective=True, with_refractive=True,
    )
    s = RenderSettings(wavefront="iter")
    trace = make_trace_fn(scene, s)
    rx, ry, _ = make_tiler(scene.height, scene.width)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height, rx, ry,
    )
    _, dropped = shade_wavefront_iter_with_stats(
        scene, s, trace, o, d, rx.astype(jnp.uint32), ry.astype(jnp.uint32)
    )
    assert int(dropped) == 0


def test_trace_program_count_is_constant():
    """The scan body traces once at trace time — program size O(1) in depth
    (the recursion unrolls 2^depth trace programs on refractive scenes)."""
    scene = make_test_scene(
        width=32, height=32, num_quads=4,
        with_reflective=True, with_refractive=True,
    )
    s = RenderSettings(wavefront="iter", max_ray_depth=5)
    base = make_trace_fn(scene, s)
    count = [0]

    def counting(o, d, a=None):
        count[0] += 1
        return base(o, d, a)

    rx, ry, _ = make_tiler(scene.height, scene.width)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height, rx, ry,
    )
    shade_wavefront_iter_with_stats(
        scene, s, counting, o, d, rx.astype(jnp.uint32),
        ry.astype(jnp.uint32),
    )
    # one scan body = 1 bounce trace + (max_ray_depth+1) transmissive-shadow
    # marching traces — linear in depth (vs 2^5 unrolled trace programs)
    assert count[0] <= 2 + (5 + 1)


def test_gi_deterministic_and_matches_recursive_mean():
    scene = make_test_scene(width=32, height=24, num_quads=4, gi_on=True)
    s = RenderSettings(
        wavefront="iter", diffuse_reflection_ray_count=2, max_ray_depth=2
    )
    a = np.asarray(render_image(scene, s))
    b = np.asarray(render_image(scene, s))
    np.testing.assert_array_equal(a, b)
    # forked-stream GI differs per pixel from the DFS draw order but must
    # agree in expectation (same sampling distribution)
    sr = s.replace(wavefront="recursive")
    c = np.asarray(render_image(scene, sr))
    assert abs(a.mean() - c.mean()) / c.mean() < 5e-3


def test_gradient_flows_through_scan():
    scene = make_test_scene(
        width=16, height=16, num_quads=4,
        with_reflective=True, with_refractive=True,
    )

    def loss(v, lights):
        sc = scene.replace(vertices=v, light_intensity=lights)
        img = render_image(sc, RenderSettings(wavefront="iter"), jit=False)
        return jnp.sum(img)

    gv, gl = jax.grad(loss, argnums=(0, 1))(
        scene.vertices, scene.light_intensity
    )
    assert bool(jnp.all(jnp.isfinite(gv)))
    assert float(jnp.linalg.norm(gv)) > 0
    assert bool(jnp.all(gl > 0))  # brighter lights => brighter image


def test_auto_policy():
    refr = make_test_scene(num_quads=2, with_refractive=True)
    assert use_iterative_wavefront(refr, RenderSettings())
    assert not use_iterative_wavefront(refr, RenderSettings(max_ray_depth=1))
    diffuse = make_test_scene(num_quads=2, with_reflective=False)
    assert not use_iterative_wavefront(diffuse, RenderSettings())
    gi = make_test_scene(num_quads=2, gi_on=True)
    assert use_iterative_wavefront(gi, RenderSettings())
    assert not use_iterative_wavefront(
        gi, RenderSettings(wavefront="recursive")
    )


def test_chunked_render_matches_unchunked():
    scene = make_test_scene(
        width=64, height=32, num_quads=6,
        with_reflective=True, with_refractive=True,
    )
    full = np.asarray(render_image(scene, RenderSettings(wavefront="iter")))
    chunked = np.asarray(
        render_image(
            scene,
            RenderSettings(wavefront="iter", chunk_pixels=1024),
        )
    )
    np.testing.assert_allclose(chunked, full, atol=1e-6)


def test_grow_schedule_matches_scan_gi():
    """Bank-growth scheduling matches the scan up to f32 reorder/FMA
    contraction (leaf children fold into acc in a different summation
    order; separately compiled bounce bodies fuse differently)."""
    import numpy as np

    from crt_tpu import RenderSettings, render_image
    from crt_tpu.scene.procedural import make_test_scene

    for refr in (False, True):
        scene = make_test_scene(width=32, height=16, num_quads=5,
                                with_refractive=refr).replace(gi_on=True)
        out = {}
        for sched in ("scan", "grow"):
            out[sched] = np.asarray(render_image(
                scene,
                RenderSettings(backend="bruteforce", wavefront="iter",
                               wavefront_sched=sched, max_ray_depth=2),
                jit=False,
            ))
        np.testing.assert_allclose(out["grow"], out["scan"],
                                   rtol=0, atol=1e-6)


def test_grow_schedule_drop_counts_match_scan():
    """At a starved bank budget the grow schedule drops NO MORE than the
    scan (inline leaf evaluation makes the final tree level immune to bank
    starvation; interior levels follow the same packing bound)."""
    import jax.numpy as jnp

    from crt_tpu import RenderSettings
    from crt_tpu.ops.shade_iter import shade_wavefront_iter_with_stats
    from crt_tpu.renderer import make_tiler, make_trace_fn
    from crt_tpu.ops import camera as camera_ops
    from crt_tpu.scene.procedural import make_test_scene

    scene = make_test_scene(width=32, height=16, num_quads=5,
                            with_refractive=True).replace(gi_on=True)
    rx, ry, _ = make_tiler(scene.height, scene.width)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height, rx, ry,
    )
    drops = {}
    for sched in ("scan", "grow"):
        settings = RenderSettings(backend="bruteforce", max_ray_depth=3,
                                  wavefront_sched=sched)
        trace_fn = make_trace_fn(scene, settings)
        _, dropped = shade_wavefront_iter_with_stats(
            scene, settings, trace_fn, o, d,
            rx.astype(jnp.uint32), ry.astype(jnp.uint32), banks=5,
        )
        drops[sched] = int(dropped)
    assert drops["grow"] <= drops["scan"], drops
    assert drops["scan"] > 0  # starved budget actually drops


def test_gi_default_banks_evaluate_full_tree():
    """The GI bank default is the EXACT Whitted-tree width f^D: zero
    dropped children at defaults (round-3 found the old heuristic dropping
    10.6 M children on the 15-01 showcase = 1-4 % radiance), while a
    starved budget on the same scene does drop."""
    import jax.numpy as jnp

    from crt_tpu.ops import camera as camera_ops
    from crt_tpu.ops.shade_iter import default_banks

    scene = make_test_scene(width=32, height=16, num_quads=5,
                            with_refractive=True).replace(gi_on=True)
    settings = RenderSettings(max_ray_depth=3)
    assert default_banks(scene, settings) == 4**3  # f = max(K=4, refr 2)

    rx, ry, _ = make_tiler(scene.height, scene.width)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height, rx, ry,
    )
    trace_fn = make_trace_fn(scene, settings)
    _, dropped = shade_wavefront_iter_with_stats(
        scene, settings, trace_fn, o, d,
        rx.astype(jnp.uint32), ry.astype(jnp.uint32),
    )
    assert int(dropped) == 0
    _, dropped_starved = shade_wavefront_iter_with_stats(
        scene, settings, trace_fn, o, d,
        rx.astype(jnp.uint32), ry.astype(jnp.uint32), banks=2,
    )
    assert int(dropped_starved) > 0
