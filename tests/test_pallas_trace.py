"""Pallas tile-binning kernel (interpret mode on CPU) vs brute force."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crt_tpu import RenderSettings, render_image
from crt_tpu.ops import intersect
from crt_tpu.ops.pallas_trace import (
    bin_rays,
    build_cluster_tables,
    make_pallas_trace_fn,
)
from crt_tpu.scene.procedural import make_test_scene


@pytest.fixture(scope="module")
def scene():
    return make_test_scene(width=64, height=40, num_quads=12,
                           with_reflective=False)


def test_binning_covers_bruteforce_hits(scene):
    """Every ray's true hit cluster must be in its tile's compacted list."""
    from crt_tpu.ops import camera as camera_ops

    tables = build_cluster_tables(scene)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    from crt_tpu.ops.pallas_trace import TILE_RAYS

    o = np.asarray(o.reshape(-1, 3))
    d = np.asarray(d.reshape(-1, 3))
    R = (len(o) // TILE_RAYS) * TILE_RAYS
    o, d = o[:R], d[:R]

    leaf_list, counts = jax.jit(bin_rays)(tables, jnp.asarray(o), jnp.asarray(d))
    leaf_list, counts = np.asarray(leaf_list)[:, 0], np.asarray(counts)

    # reference: exact per-ray slab test against each cluster AABB
    lmin = np.asarray(tables.cl_min)
    lmax = np.asarray(tables.cl_max)
    inv = 1.0 / np.where(np.abs(d) > 1e-30, d, 1e-30)
    t1 = (lmin[None, :] - o[:, None]) * inv[:, None]
    t2 = (lmax[None, :] - o[:, None]) * inv[:, None]
    tnear = np.minimum(t1, t2).max(-1)
    tfar = np.maximum(t1, t2).min(-1)
    ray_hits = tfar >= np.maximum(tnear, 0)  # [R, L]

    tiles = R // TILE_RAYS
    for ti in range(tiles):
        needed = set(
            np.nonzero(ray_hits[ti * TILE_RAYS : (ti + 1) * TILE_RAYS].any(0))[0]
        )
        got = set(leaf_list[ti, : counts[ti]].tolist())
        assert needed <= got, f"tile {ti}: missing leaves {needed - got}"


def test_pallas_interpret_matches_bruteforce(scene):
    from crt_tpu.ops import camera as camera_ops

    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    td = intersect.build_triangle_data(
        scene.vertices, scene.tri_vidx,
        scene.mat_backface[scene.tri_material],
    )
    brute = intersect.closest_hit_bruteforce(td, o, d)

    trace = make_pallas_trace_fn(scene, interpret=True)
    ph = trace(o, d)

    bt, bi = np.asarray(brute.t), np.asarray(brute.tri)
    pt, pi = np.asarray(ph.t), np.asarray(ph.tri)
    assert ((bi < 0) == (pi < 0)).all()
    hits = bi >= 0
    np.testing.assert_allclose(pt[hits], bt[hits], rtol=1e-5, atol=1e-6)
    # Disagreeing ids are exact-distance ties (shared-edge hits) where the
    # reference's first-wins rule depends on traversal order; verify ties.
    dis = hits & (pi != bi)
    assert dis.mean() < 0.005
    np.testing.assert_allclose(pt[dis], bt[dis], rtol=1e-6, atol=1e-7)


def test_full_render_pallas_interpret(scene):
    brute = np.asarray(render_image(scene, RenderSettings(backend="bruteforce")))
    import crt_tpu.ops.pallas_trace as ptr
    import crt_tpu.renderer as renderer

    # monkeypatch-free: use backend="pallas" with interpret via env? Simplest:
    # construct trace fn directly and call shade path through render with a
    # patched factory.
    orig = renderer.make_trace_fn

    def patched(scn, settings):
        if settings.backend == "pallas":
            return ptr.make_pallas_trace_fn(scn, interpret=True)
        return orig(scn, settings)

    renderer.make_trace_fn = patched
    try:
        pal = np.asarray(
            render_image(scene, RenderSettings(backend="pallas"), jit=False)
        )
    finally:
        renderer.make_trace_fn = orig

    np.testing.assert_allclose(pal, brute, rtol=1e-5, atol=1e-6)


def test_kernel_emitted_rows_match_gather(scene):
    """trace.with_rows emits bit-identical packed rows + slot-rank row."""
    from crt_tpu.ops import camera as camera_ops
    from crt_tpu.ops.pallas_trace import TILE_RAYS
    from crt_tpu.ops.shade import _morton_rank, build_packed

    trace = make_pallas_trace_fn(scene, interpret=True)
    assert hasattr(trace, "with_rows")

    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    R = (o.shape[0] // TILE_RAYS) * TILE_RAYS
    o, d = o[:R], d[:R]

    hit, rows = jax.jit(trace.with_rows)(o, d)
    hit2 = jax.jit(trace)(o, d)
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(hit2.tri))

    packed = np.asarray(build_packed(scene))
    tri = np.asarray(hit.tri)
    valid = tri >= 0
    expect = packed[:, np.maximum(tri, 0)]
    got = np.asarray(rows[:-1])
    # hit lanes: bit-identical to the gather; miss lanes are zero (patched
    # downstream in hit_attributes)
    np.testing.assert_array_equal(got[:, valid], expect[:, valid])
    assert np.all(got[:, ~valid] == 0.0)

    # last row == Morton rank of the hit triangle
    rank = np.asarray(_morton_rank(scene, scene.num_triangles))
    got_rank = np.asarray(rows[-1]).astype(np.int64)
    np.testing.assert_array_equal(got_rank[valid], rank[tri[valid]])


def test_near_exit_matches_default(scene):
    """The near-origin-first early-exit walk (CRT_NEAR_EXIT) returns the
    same hits as the Morton-order full walk: distance lower bounds only
    allow skipping clusters that could at best TIE (first-walked-wins),
    and the consume mask seeds inactive lanes settled."""
    from crt_tpu.ops import camera as camera_ops
    from crt_tpu.ops.pallas_trace import (
        TILE_RAYS,
        build_cluster_tables,
        closest_hit_pallas_flat,
    )

    tables = build_cluster_tables(scene)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    R = (o.shape[0] // TILE_RAYS) * TILE_RAYS
    o, d = o[:R], d[:R]
    # a masked wavefront too: stripes of dead lanes (bounce-like)
    act = (jnp.arange(R) % 3) != 0

    for a in (None, act):
        base = closest_hit_pallas_flat(
            tables, o, d, a, interpret=True, near_exit=False
        )
        fast = closest_hit_pallas_flat(
            tables, o, d, a, interpret=True, near_exit=True
        )
        lanes = np.ones(R, bool) if a is None else np.asarray(a)
        bt, ft = np.asarray(base.t)[lanes], np.asarray(fast.t)[lanes]
        np.testing.assert_array_equal(ft, bt)
        bi, fi = np.asarray(base.tri)[lanes], np.asarray(fast.tri)[lanes]
        dis = bi != fi  # cross-cluster exact-t ties may flip winners
        assert dis.mean() < 0.005
        np.testing.assert_array_equal(ft[dis], bt[dis])


def test_occl_exit_matches_default(scene, monkeypatch):
    """CRT_OCCL_EXIT (all-blocked while-exit + near order + inactive lanes
    seeded blocked) leaves every CONSUMED occlusion bit unchanged."""
    import importlib

    import crt_tpu.ops.pallas_trace as ptr
    from crt_tpu.ops import camera as camera_ops

    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height,
    )
    point = o.reshape(-1, 3) + 2.0 * d.reshape(-1, 3)  # fake hit points
    R = (point.shape[0] // ptr.TILE_RAYS) * ptr.TILE_RAYS
    point = point[:R]
    lp = scene.light_position
    Ll = lp.shape[0]
    lv = lp[:, None, :] - point[None]
    r2 = jnp.sum(lv * lv, -1)
    ldir = lv / jnp.sqrt(r2)[..., None]
    act = ((jnp.arange(R) % 4) != 0)[None] & jnp.ones((Ll, R), bool)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setattr(ptr, "_OCCL_EXIT", flag != "0")
        trace = ptr.make_pallas_trace_fn(scene, interpret=True)
        occ = trace.shadow_apex(point, ldir, r2, lp, act, 0.02)
        outs[flag] = np.asarray(occ)
    lanes = np.asarray(act)
    np.testing.assert_array_equal(outs["1"][lanes], outs["0"][lanes])
