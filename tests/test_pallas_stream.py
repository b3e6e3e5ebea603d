"""HBM-streaming two-level intersection (crt_tpu.ops.pallas_stream).

Kernel correctness in interpret mode vs the brute-force oracle, pair-list
semantics (tile-major grouping, padding, overflow reporting), and the
zero-pair-tile miss path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from crt_tpu.ops import pallas_stream as ps
from crt_tpu.ops.intersect import build_triangle_data, closest_hit_bruteforce
from crt_tpu.ops.pallas_trace import build_cluster_tables
from crt_tpu.renderer import make_tiler
from crt_tpu.ops import camera as camera_ops
from crt_tpu.scene.procedural import make_test_scene

TR = 256  # small tiles keep interpret mode fast


def _scene_rays(num_quads=24, w=32, h=16):
    scene = make_test_scene(width=w, height=h, num_quads=num_quads,
                            with_reflective=False)
    rx, ry, _ = make_tiler(h, w)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )
    return scene, o, d


def test_supercluster_boxes_cover_clusters():
    scene, _, _ = _scene_rays()
    tables = build_cluster_tables(scene)
    padded, sc_min, sc_max = ps.build_supercluster_boxes(tables)
    assert padded.n.shape[0] % ps.SC_CLUSTERS == 0
    L2 = sc_min.shape[0]
    cl_min = np.asarray(padded.cl_min).reshape(L2, ps.SC_CLUSTERS, 3)
    cl_max = np.asarray(padded.cl_max).reshape(L2, ps.SC_CLUSTERS, 3)
    real = cl_min[..., 0] < 1e38  # padded clusters have inverted boxes
    assert (np.where(real[..., None], cl_min, np.inf)
            >= np.asarray(sc_min)[:, None] - 1e-6).all()
    assert (np.where(real[..., None], cl_max, -np.inf)
            <= np.asarray(sc_max)[:, None] + 1e-6).all()


def test_bin_pairs_tile_major_and_padded():
    scene, o, d = _scene_rays()
    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene)
    )
    cap = 64
    pt, psc, valid, total = ps.bin_pairs(sc_min, sc_max, o, d, cap, TR)
    pt, psc, valid = map(np.asarray, (pt, psc, valid))
    total = int(total)
    assert valid.sum() == min(total, cap)
    live = pt[valid > 0]
    assert (np.diff(live) >= 0).all()  # tile-major grouping
    if total < cap:  # padding repeats the last valid pair
        assert (pt[total:] == pt[total - 1]).all()
        assert (psc[total:] == psc[total - 1]).all()


def test_member_runs_live_first_permutation():
    """_member_runs packs each pair's LIVE members first: counts match the
    member mask, packed indices are valid, and padding clusters (inverted
    AABBs) never count as live."""
    scene, o, d = _scene_rays(num_quads=24)
    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene)
    )
    L_real = build_cluster_tables(scene).n.shape[0]
    sc = ps.SC_CLUSTERS
    cap = 1024
    pt, psc, valid, total = ps.bin_pairs(sc_min, sc_max, o, d, cap, TR)
    bounds = ps._tile_bounds(o, d, TR, None)
    count, perm = ps._member_runs(
        bounds, pt, psc, tables.cl_min, tables.cl_max, sc
    )
    member = np.asarray(ps._member_mask(
        bounds, pt, psc, tables.cl_min, tables.cl_max, sc
    ))
    count = np.asarray(count)
    live = np.asarray(valid) > 0
    np.testing.assert_array_equal(count, member.sum(1))
    # a pair only exists because its supercluster box overlapped ->
    # at least one member survives
    assert (count[live] > 0).all()
    # unpack the permutation and check the first `count` entries are
    # exactly the live members
    W = -(-sc // ps._PERM_PER_WORD)
    perm = np.asarray(perm).reshape(-1, W).astype(np.uint64)
    idx = np.arange(sc)
    words = perm[:, idx // ps._PERM_PER_WORD]
    shifts = ((idx % ps._PERM_PER_WORD) * ps._PERM_BITS).astype(np.uint64)
    unpacked = (words >> shifts) & np.uint64(31)
    for p in np.nonzero(live)[0][:32]:
        first = unpacked[p, : count[p]].astype(int)
        assert sorted(first) == sorted(np.nonzero(member[p])[0].tolist())
    # padding clusters never live
    pad = (-L_real) % sc
    if pad:
        last_sc = np.asarray(psc) == sc_min.shape[0] - 1
        sel = live & last_sc
        assert (count[sel] <= sc - pad).all()


def test_stream_layouts_bit_identical():
    """The three streamed-table layouts (rows / fused / lane) are pure
    memory-layout changes — closest hits AND occlusion must be BIT-equal.
    The lane layout additionally exercises the in-kernel dynamic lane
    rotate + [16,18] transpose member extraction."""
    import jax.numpy as jnp

    scene, o, d = _scene_rays(num_quads=40)
    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene), 4
    )
    r2 = jnp.full((o.shape[0],), 1e6, jnp.float32)
    active = jnp.ones((o.shape[0],), bool)
    tiles = o.shape[0] // TR
    apex = jnp.tile(jnp.asarray([[1.5, 2.5, 1.0]], jnp.float32), (tiles, 1))
    outs, occs = [], []
    for layout in ("rows", "fused", "lane"):
        hit, total = ps.closest_hit_stream_flat(
            tables, sc_min, sc_max, o, d, None,
            tile_rays=TR, interpret=True, layout=layout,
        )
        outs.append((np.asarray(hit.t), np.asarray(hit.tri), int(total)))
        occs.append(np.asarray(ps.occluded_stream_flat(
            tables, sc_min, sc_max, o, d, r2, active, apex,
            jnp.float32(0.02), tile_rays=TR, interpret=True, layout=layout,
        )))
    for t, tri, total in outs[1:]:
        np.testing.assert_array_equal(t, outs[0][0])
        np.testing.assert_array_equal(tri, outs[0][1])
        assert total == outs[0][2]
    for occ in occs[1:]:
        np.testing.assert_array_equal(occ, occs[0])


def test_stream_matches_bruteforce_interpret():
    scene, o, d = _scene_rays(num_quads=24)
    trace = ps.make_stream_trace_fn(scene, tile_rays=TR, interpret=True)
    hit = trace(o, d)

    tri = build_triangle_data(
        scene.vertices, scene.tri_vidx,
        scene.mat_backface[scene.tri_material],
    )
    ref = closest_hit_bruteforce(tri, o, d)

    ht, rt = np.asarray(hit.t), np.asarray(ref.t)
    m = np.isfinite(rt)
    np.testing.assert_allclose(ht[m], rt[m], rtol=1e-5, atol=1e-5)
    assert np.isinf(ht[~m]).all()
    # triangle ids must agree except on exact-distance ties, where the two
    # backends' first-wins rules may legitimately pick different winners
    tri_h, tri_r = np.asarray(hit.tri), np.asarray(ref.tri)
    disagree = tri_h != tri_r
    assert (np.abs(ht[disagree] - rt[disagree]) <= 1e-5).all()
    assert disagree.mean() < 0.01


def test_stream_active_mask_and_overflow_report():
    scene, o, d = _scene_rays(num_quads=8)
    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene)
    )
    # overflow: cap of 1 pair must report the true total
    _, _, valid, total = ps.bin_pairs(sc_min, sc_max, o, d, 1, TR)
    assert int(total) >= 1
    assert int(np.asarray(valid).sum()) == 1

    # all-inactive wavefront -> everything is a miss
    active = jnp.zeros(o.shape[0], bool)
    hit, total2 = ps.closest_hit_stream_flat(
        jax.tree.map(jax.lax.stop_gradient, tables), sc_min, sc_max,
        o, d, active, pairs_cap=64, tile_rays=TR, interpret=True,
    )
    assert int(total2) == 0
    assert np.isinf(np.asarray(hit.t)).all()
    assert (np.asarray(hit.tri) == -1).all()


def test_stream_tiered_matches_untier():
    """lax.switch tier selection must be bit-identical to the full-cap
    launch, and must pick the smallest tier that holds the live count."""
    scene, o, d = _scene_rays(num_quads=24)
    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene)
    )
    tables = jax.tree.map(jax.lax.stop_gradient, tables)
    cap = 512
    hit_full, total = ps.closest_hit_stream_flat(
        tables, sc_min, sc_max, o, d, pairs_cap=cap, tile_rays=TR,
        interpret=True, tiered=False,
    )
    hit_tier, total2 = ps.closest_hit_stream_flat(
        tables, sc_min, sc_max, o, d, pairs_cap=cap, tile_rays=TR,
        interpret=True, tiered=True,
    )
    assert int(total) == int(total2)
    # the tiering is only a real test if a smaller tier actually runs
    assert int(total) <= cap // 2
    np.testing.assert_array_equal(np.asarray(hit_full.t),
                                  np.asarray(hit_tier.t))
    np.testing.assert_array_equal(np.asarray(hit_full.tri),
                                  np.asarray(hit_tier.tri))


def test_multilaunch_matches_single_launch():
    """Pair lists beyond one launch block stream through a while_loop of
    block launches whose partial hits min-combine (lowest-id tie-break) —
    results must equal the single-launch path exactly.  This is the path
    that fixes the silent pair-overflow regression (a fixed 32k cap
    dropped ~70% of the 1M-triangle benchmark's pairs)."""
    scene, o, d = _scene_rays(num_quads=48, w=64, h=32)
    tables = build_cluster_tables(scene)
    tables, sc_min, sc_max = ps.build_supercluster_boxes(tables, 4)

    hit_single, total = ps.closest_hit_stream_flat(
        tables, sc_min, sc_max, o, d, None,
        pairs_cap=None, tile_rays=TR, interpret=True, block=1 << 20,
    )
    assert int(total) > 3  # enough pairs to span multiple tiny blocks
    hit_multi, total2 = ps.closest_hit_stream_flat(
        tables, sc_min, sc_max, o, d, None,
        pairs_cap=None, tile_rays=TR, interpret=True, block=3,
    )
    assert int(total) == int(total2)
    np.testing.assert_array_equal(
        np.asarray(hit_multi.tri), np.asarray(hit_single.tri)
    )
    np.testing.assert_array_equal(
        np.asarray(hit_multi.t), np.asarray(hit_single.t)
    )
    # and both match the brute-force oracle on hit DISTANCE (tri ids can
    # legitimately differ on exact-tie lanes: the stream kernel resolves
    # ties first-pair-in-walk-order, the oracle lowest-id)
    tri = build_triangle_data(
        scene.vertices, scene.tri_vidx,
        scene.mat_backface[scene.tri_material],
    )
    ref = closest_hit_bruteforce(tri, o, d)
    np.testing.assert_array_equal(
        np.asarray(hit_multi.t), np.asarray(ref.t)
    )
    agree = (np.asarray(hit_multi.tri) == np.asarray(ref.tri)).mean()
    assert agree > 0.99, agree


def test_stream_shadow_apex_matches_generic():
    """The stream backend's apex shadow binning (shaft + cone vs
    supercluster AND member boxes) must produce IDENTICAL occlusion masks
    to the generic trace-then-compare on active lanes."""
    from crt_tpu.ops import vecmath
    from crt_tpu.ops.intersect import Hit  # noqa: F401 (doc)

    scene, o, d = _scene_rays(num_quads=24, w=32, h=16)
    trace = ps.make_stream_trace_fn(scene, tile_rays=TR, interpret=True,
                                    sc_clusters=4)
    hit = trace(o, d)
    valid = np.asarray(hit.tri) >= 0

    # hit points + shadow wavefront toward the scene light
    t = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
    point = o + d * t[:, None]
    lp = scene.light_position
    light_vec = lp[:, None, :] - point[None]
    r2 = vecmath.length_squared(light_vec)
    ldir = vecmath.safe_normalize(light_vec)
    act = jnp.asarray(valid)[None] & jnp.ones_like(r2, bool)
    shadow_o = point + jnp.asarray([[0.0, 1e-2, 0.0]])

    occ_apex = np.asarray(trace.shadow_apex(
        shadow_o, ldir, r2, lp, act, 2e-2
    ))

    Ll, R = r2.shape
    sh = trace(
        jnp.broadcast_to(shadow_o[None], (Ll, R, 3)).reshape(-1, 3),
        ldir.reshape(-1, 3),
        act.reshape(-1),
    )
    occ_ref = np.asarray(
        (sh.tri >= 0) & (sh.t**2 <= r2.reshape(-1))
    ).reshape(Ll, R)

    a = np.asarray(act)
    np.testing.assert_array_equal(occ_apex[a], occ_ref[a])
    assert occ_ref[a].any()  # some occlusion actually exercised


def test_twophase_shadow_matches_single_phase():
    """occluded_stream_twophase (truncated near walk + compacted survivor
    re-trace) equals the single-phase occlusion on every ACTIVE lane, for
    several phase-1 depths."""
    scene, o, d = _scene_rays(num_quads=40)
    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene), 4
    )
    hit = ps.make_stream_trace_fn(scene, tile_rays=TR, interpret=True)(o, d)
    point = o + d * jnp.where(jnp.isfinite(hit.t), hit.t, 2.0)[:, None]
    R = point.shape[0]
    lp = jnp.asarray([[1.5, 2.5, 1.0], [-2.0, 1.5, 2.0]], jnp.float32)
    Ll = lp.shape[0]
    lv = lp[:, None, :] - point[None]
    r2 = jnp.sum(lv * lv, -1)
    ldir = lv / jnp.sqrt(r2)[..., None]
    act = ((jnp.arange(R) % 5) != 0)[None] & jnp.ones((Ll, R), bool)

    tpl = R // TR
    apex = jnp.repeat(lp, tpl, axis=0)
    base = np.asarray(ps.occluded_stream_flat(
        tables, sc_min, sc_max,
        jnp.broadcast_to(point[None], (Ll, R, 3)).reshape(-1, 3),
        ldir.reshape(-1, 3), r2.reshape(-1), act.reshape(-1),
        apex, jnp.float32(0.02), tile_rays=TR, interpret=True,
    )).reshape(Ll, R)
    lanes = np.asarray(act)
    for k in (1, 3, 64):
        two = np.asarray(ps.occluded_stream_twophase(
            tables, sc_min, sc_max, point, ldir, r2, lp, act,
            jnp.float32(0.02), tile_rays=TR, interpret=True, phase1_k=k,
        ))
        np.testing.assert_array_equal(two[lanes], base[lanes], err_msg=str(k))
