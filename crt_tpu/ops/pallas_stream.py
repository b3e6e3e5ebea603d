"""HBM-streaming Pallas intersection for scenes beyond VMEM capacity.

The resident kernel (crt_tpu.ops.pallas_trace) keeps every cluster constant
in VMEM — ~68 B/triangle, so it caps out around ~200k triangles and the
renderer used to fall back to the (orders-of-magnitude slower) while_loop
tree walk.  This module removes that cliff with a two-level scheme:

  Level 1: the same Morton clusters of 16 triangles (tables unchanged).
  Level 2: SC_CLUSTERS consecutive clusters form a *supercluster* (Morton
  order makes consecutive clusters spatially adjacent, so supercluster
  AABBs stay tight).  Supercluster AABBs are tiny ([L2, 3]) and live in
  plain XLA.

  Phase A (XLA): tile frustums vs supercluster boxes -> a TILE-MAJOR pair
  list (pair_tile[p], pair_sc[p]): every (ray tile, supercluster) pair
  that can interact, grouped by tile.

  Phase B (this kernel): grid = one step per pair.  BlockSpec index_maps
  pull the pair's ray tile and the pair's supercluster table slice — so
  Pallas's own pipeline machinery streams the [SC_CLUSTERS, 16] triangle
  constants HBM->VMEM with automatic double buffering, overlapping each
  pair's DMA with the previous pair's math.  Consecutive pairs of the same
  tile keep the output block resident and accumulate min-hits; the running
  (best_t, best_tri) is initialized on each tile's first pair (detected by
  a pair_tile[p-1] != pair_tile[p] scalar check).  Each pair walks exactly
  its LIVE member clusters through a 5-bit-packed live-first permutation
  (count + clamp, no per-member cond); dead/padding pairs carry count 0.

The pair list defaults to EXACT capacity (tiles x superclusters, cannot
overflow) and the kernel multi-launches over <=16k-pair blocks inside a
lax.while_loop — see closest_hit_stream_flat.  Round 2's fixed 32k cap
silently dropped pairs past it (disclosed in docs/PERFORMANCE.md).

VMEM per step: one [SC_CLUSTERS*16] table slice (~34 KB) + ray planes +
outputs — independent of scene size; HBM traffic = pair count x slice
size, i.e. only geometry near the rays is ever touched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crt_tpu.ops.intersect import PARALLEL_EPS, Hit
from crt_tpu.ops.pallas_trace import (
    TILE_RAYS,
    ClusterTables,
    _apex_cone_mask,
    _apex_wedge_mask,
    _frustum_box_mask,
    build_cluster_tables,
)

SC_CLUSTERS = 32  # default clusters per supercluster (32 x 16 = 512 tris)

import os as _os

# Per-lane exact pair admission for FULL shadow-shaft walks (phase 2 /
# single phase): the hull's interval conservatism admits 2.33x the pairs
# any lane's segment needs (tools/exp_shadow_pairs.py).  A/B flag.
_LANE_EXACT = _os.environ.get("CRT_STREAM_LANE_EXACT", "1") != "0"


def _vma_of(x) -> frozenset:
    """Varying-manual-axes of ``x`` under shard_map (empty outside)."""
    try:
        return frozenset(getattr(jax.typeof(x), "vma", None) or ())
    except TypeError:
        return frozenset()


def _out_vma(*xs) -> frozenset:
    """Union vma over the launch inputs — inside shard_map (the
    scene-partitioned path runs this kernel per table shard) the out_shape
    aval must name the mesh axes the output varies over; a bare
    ShapeDtypeStruct has vma=None, which the manual-axes checker rejects."""
    out = frozenset()
    for x in xs:
        out |= _vma_of(x)
    return out


# Inside shard_map, OUT-ref reads carry the out_shape's vma while values
# computed from INPUT-ref reads come back unvarying — a fori/while carry
# seeded from an out ref then type-errs against the body's outputs, and
# jax.lax.pvary is a no-op in the kernel trace context.  The kernels
# therefore switch to REF-STATE loops when launched with a non-empty vma
# (the loop carry is just the step index; the running (best_t, best_tri)
# or occlusion plane lives in the out refs, which hold the vma) — a few
# KB of extra VMEM read/write per unrolled step, only on the
# scene-partitioned path.


def build_supercluster_boxes(tables: ClusterTables,
                             sc_clusters: int = SC_CLUSTERS):
    """Pad the cluster axis to ``sc_clusters`` and build supercluster AABBs.

    Returns (tables_padded, sc_min [L2, 3], sc_max [L2, 3]).  ``sc_clusters``
    trades DMA-slice size (sc x 16 triangles per grid step) against pair
    count; must be <= 32 (member survival is a uint32 bitmask).
    """
    assert 1 <= sc_clusters <= 32
    L = tables.n.shape[0]
    pad = (-L) % sc_clusters
    if pad:
        INF = jnp.float32(3.4e38)

        def pad0(x, fill):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        tables = ClusterTables(
            n=pad0(tables.n, 0.0),
            nv0=pad0(tables.nv0, 0.0),
            m=pad0(tables.m, 0.0),
            c=pad0(tables.c, 1.0),
            nobf=pad0(tables.nobf, 0.0),
            tri_id=pad0(tables.tri_id, -1),
            cl_min=pad0(tables.cl_min, INF),
            cl_max=pad0(tables.cl_max, -INF),
        )
    L2 = tables.n.shape[0] // sc_clusters
    sc_min = tables.cl_min.reshape(L2, sc_clusters, 3).min(axis=1)
    sc_max = tables.cl_max.reshape(L2, sc_clusters, 3).max(axis=1)
    return tables, sc_min, sc_max


def _tile_bounds(origins, dirs, tile_rays, active):
    """Per-tile (active-masked) origin/direction interval bounds."""
    tiles = origins.shape[0] // tile_rays
    o = origins.reshape(tiles, tile_rays, 3)
    d = dirs.reshape(tiles, tile_rays, 3)
    if active is None:
        return o.min(axis=1), o.max(axis=1), d.min(axis=1), d.max(axis=1), None
    INF = jnp.float32(3.4e38)
    a = active.reshape(tiles, tile_rays, 1)
    o_lo = jnp.where(a, o, INF).min(axis=1)
    o_hi = jnp.where(a, o, -INF).max(axis=1)
    d_lo = jnp.where(a, d, INF).min(axis=1)
    d_hi = jnp.where(a, d, -INF).max(axis=1)
    return o_lo, o_hi, d_lo, d_hi, jnp.any(a[..., 0], axis=1)


def lane_exact_sc_mask(origins, dirs, r2, active, slack, sc_min, sc_max,
                       tile_rays: int = TILE_RAYS,
                       tile_block: int = 128, sc_chunk: int = 256):
    """[tiles, L2] bool — a (tile, supercluster) pair survives iff SOME
    active lane's slack-inflated [origin, light] segment hits the SC box.

    The shipped shaft+cone+wedge hull admits 2.33x more pairs than any
    lane's actual segment requires on the 1M benchmark (213958 vs 91900,
    tools/exp_shadow_pairs.py) — the fat is per-axis INTERVAL conservatism,
    which sub-shaft unions cannot remove (sub=32: 207690).  This computes
    the EXACT per-lane slab test, OR-reduced per tile, in ~tiles*TR*L2*25
    flops (a few ms at 2M lanes x ~2k superclusters) — occlusion-exact: a
    dropped pair has no lane whose segment (inflated by the same 2*slack
    the member tests use, t capped at sqrt(r2)*(1+1e-4)+2*slack) touches
    the box, so no member hit with t^2 <= r2 was possible.

    Memory: double-chunked (tile_block tiles x sc_chunk boxes per scan
    step) so intermediates stay ~tens of MB.
    """
    INF = jnp.float32(3.4e38)
    N = origins.shape[0]
    tiles = N // tile_rays
    L2 = sc_min.shape[0]
    s = jnp.float32(slack)
    tmax = jnp.sqrt(jnp.maximum(r2, 0.0)) * (1.0 + 1e-4) + 2.0 * s
    if active is not None:
        tmax = jnp.where(active, tmax, -1.0)  # inactive: empty segment

    tb_pad = (-tiles) % tile_block
    def padt(x, fill):
        if not tb_pad:
            return x
        p = jnp.full((tb_pad * tile_rays,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, p])
    o_p = padt(origins, 0.0).reshape(-1, tile_block * tile_rays, 3)
    d_p = padt(dirs, 1.0).reshape(-1, tile_block * tile_rays, 3)
    t_p = padt(tmax, -1.0).reshape(-1, tile_block * tile_rays)

    sc_pad = (-L2) % sc_chunk
    bmin = jnp.concatenate(
        [sc_min - 2.0 * s, jnp.full((sc_pad, 3), INF)]
    ) if sc_pad else sc_min - 2.0 * s
    bmax = jnp.concatenate(
        [sc_max + 2.0 * s, jnp.full((sc_pad, 3), -INF)]
    ) if sc_pad else sc_max + 2.0 * s
    bmin_c = bmin.reshape(-1, sc_chunk, 3)
    bmax_c = bmax.reshape(-1, sc_chunk, 3)
    n_sc_chunks = bmin_c.shape[0]

    def tile_block_mask(args):
        o, d, tm = args  # [B*TR, 3], [B*TR, 3], [B*TR]
        small = jnp.abs(d) < 1e-12
        dsafe = jnp.where(small, 1.0, d)

        def sc_step(ci, acc):
            bm, bx = bmin_c[ci], bmax_c[ci]  # [C, 3]
            t1 = (bm[None] - o[:, None]) / dsafe[:, None]  # [B*TR, C, 3]
            t2 = (bx[None] - o[:, None]) / dsafe[:, None]
            tlo = jnp.minimum(t1, t2)
            thi = jnp.maximum(t1, t2)
            inside = (o[:, None] >= bm[None]) & (o[:, None] <= bx[None])
            sm = small[:, None]
            tlo = jnp.where(sm & inside, -INF,
                            jnp.where(sm & ~inside, INF, tlo))
            thi = jnp.where(sm & inside, INF,
                            jnp.where(sm & ~inside, -INF, thi))
            ent = tlo.max(-1)
            ext = thi.min(-1)
            hit = (ent <= ext) & (ext >= 0.0) & (ent <= tm[:, None])
            hit = hit.reshape(tile_block, tile_rays, -1).any(axis=1)
            return acc.at[:, ci].set(hit)

        acc0 = jnp.zeros((tile_block, n_sc_chunks, sc_chunk), bool)
        acc = jax.lax.fori_loop(0, n_sc_chunks, sc_step, acc0)
        return acc.reshape(tile_block, -1)

    out = jax.lax.map(tile_block_mask, (o_p, d_p, t_p))
    return out.reshape(-1, n_sc_chunks * sc_chunk)[:tiles, :L2]


def _member_mask(bounds, pair_tile, pair_sc, cl_min, cl_max, sc,
                 apex=None, apex_slack=0.0):
    """[P, SC] bool: which member clusters of each pair overlap its tile.

    ``apex`` ([tiles, 3]): point-light shadow mode — members are tested
    against the light-side shaft (+ bounding cone), exactly the
    pallas_trace apex semantics (occlusion-exact)."""
    o_lo, o_hi, d_lo, d_hi, _ = bounds
    L2b = cl_min.shape[0] // sc
    mb_min = cl_min.reshape(L2b, sc, 3)[pair_sc]  # [P, SC, 3]
    mb_max = cl_max.reshape(L2b, sc, 3)[pair_sc]
    if apex is None:
        return _frustum_box_mask(
            o_lo[pair_tile], o_hi[pair_tile],
            d_lo[pair_tile], d_hi[pair_tile],
            mb_min, mb_max,
        )
    sl = jnp.float32(apex_slack)
    a = apex[pair_tile]  # [P, 3]
    w_lo = (o_lo[pair_tile] - sl) - a
    w_hi = (o_hi[pair_tile] + sl) - a
    m = _frustum_box_mask(
        a, a, w_lo, w_hi, mb_min - 2.0 * sl, mb_max + 2.0 * sl,
        t_cap=jnp.float32(1.0 + 1e-4),
    )
    m = m & _cone_mask_batched(a, w_lo, w_hi, mb_min, mb_max, sl)
    return m & _wedge_mask_batched(a, w_lo, w_hi, mb_min, mb_max, sl)


def _wedge_mask_batched(apex_p, w_lo, w_hi, b_min, b_max, slack):
    """Projected 2-D wedge test with PER-ROW boxes [P, SC, 3] (see
    pallas_trace._apex_wedge_mask for the shared-box derivation)."""
    P, SC = b_min.shape[0], b_min.shape[1]
    ok = jnp.ones((P, SC), bool)
    b_lo = b_min - 2.0 * slack - apex_p[:, None, :]
    b_hi = b_max + 2.0 * slack - apex_p[:, None, :]
    for i, j in ((0, 1), (0, 2), (1, 2)):
        for num, den in ((i, j), (j, i)):
            d_lo, d_hi = w_lo[:, den], w_hi[:, den]  # [P]
            n_lo, n_hi = w_lo[:, num], w_hi[:, num]
            pos = d_lo > 0.0
            neg = d_hi < 0.0
            definite = pos | neg
            safe_lo = jnp.where(definite, d_lo, 1.0)
            safe_hi = jnp.where(definite, d_hi, 1.0)
            r = jnp.stack(
                [n_lo / safe_lo, n_lo / safe_hi,
                 n_hi / safe_lo, n_hi / safe_hi], axis=-1,
            )
            w_rlo, w_rhi = r.min(-1), r.max(-1)  # [P]
            c_nlo, c_nhi = b_lo[..., num], b_hi[..., num]  # [P, SC]
            c_dlo, c_dhi = b_lo[..., den], b_hi[..., den]
            c_def = jnp.where(pos[:, None], c_dlo > 0.0, c_dhi < 0.0)
            cs_lo = jnp.where(c_def, c_dlo, 1.0)
            cs_hi = jnp.where(c_def, c_dhi, 1.0)
            cr = jnp.stack(
                [c_nlo / cs_lo, c_nlo / cs_hi,
                 c_nhi / cs_lo, c_nhi / cs_hi], axis=-1,
            )
            c_rlo, c_rhi = cr.min(-1), cr.max(-1)
            overlap = (c_rhi >= w_rlo[:, None]) & (c_rlo <= w_rhi[:, None])
            ok = ok & jnp.where(definite[:, None] & c_def, overlap, True)
    return ok


def _cone_mask_batched(apex_p, w_lo, w_hi, b_min, b_max, slack):
    """Sphere-vs-cone shaft refinement with PER-ROW boxes [P, SC, 3]
    (the shared-box case lives in pallas_trace._apex_cone_mask)."""
    tiny = jnp.float32(1e-12)
    c_w = 0.5 * (w_lo + w_hi)  # [P, 3]
    r_w = 0.5 * jnp.sqrt(jnp.sum((w_hi - w_lo) ** 2, axis=-1) + tiny)
    len_w = jnp.sqrt(jnp.sum(c_w**2, axis=-1) + tiny)
    sin_a = jnp.clip(r_w / len_w, 0.0, 1.0)
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
    axis = c_w / len_w[..., None]

    bc = 0.5 * (b_min + b_max) - apex_p[:, None, :]  # [P, SC, 3]
    r_b = 0.5 * jnp.sqrt(
        jnp.sum((b_max - b_min) ** 2, axis=-1)
    ) + 2.0 * slack
    vproj = jnp.sum(bc * axis[:, None, :], axis=-1)
    d_ax = jnp.sqrt(
        jnp.maximum(jnp.sum(bc * bc, axis=-1) - vproj * vproj, 0.0)
    )
    e = cos_a[:, None] * d_ax - sin_a[:, None] * vproj
    return (e <= r_b) | (len_w <= r_w * 1.0001)[:, None]


# live-member permutation packing: 5 bits per member index, 6 per u32 word
_PERM_PER_WORD = 6
_PERM_BITS = 5


def _member_runs(bounds, pair_tile, pair_sc, cl_min, cl_max, sc,
                 apex=None, apex_slack=0.0):
    """(count [P] i32, perm [P * W] u32): live-first member permutation.

    The kernel walks exactly ``count`` member clusters per pair through the
    packed permutation (5-bit indices, 6 per word) with index clamping —
    re-testing the last live member is idempotent under the min-combine —
    so NO per-member scalar cond runs for dead members (the old bitmask
    walk cost one lax.cond per member: 3.5 M conds on the 1M-tri frame).
    """
    assert sc <= 32
    member = _member_mask(bounds, pair_tile, pair_sc, cl_min, cl_max, sc,
                          apex=apex, apex_slack=apex_slack)
    count = jnp.sum(member, axis=1, dtype=jnp.int32)  # [P]
    order = jnp.argsort(~member, axis=1, stable=True).astype(jnp.uint32)
    W = -(-sc // _PERM_PER_WORD)
    pad = W * _PERM_PER_WORD - sc
    if pad:
        order = jnp.concatenate(
            [order, jnp.zeros((order.shape[0], pad), jnp.uint32)], axis=1
        )
    order = order.reshape(order.shape[0], W, _PERM_PER_WORD)
    shifts = (
        jnp.arange(_PERM_PER_WORD, dtype=jnp.uint32) * _PERM_BITS
    )[None, None]
    perm = jnp.sum(order << shifts, axis=2, dtype=jnp.uint32)  # [P, W]
    return count, perm.reshape(-1)


def bin_pairs(sc_min, sc_max, origins, dirs, pairs_cap: int,
              tile_rays: int = TILE_RAYS, active=None,
              apex=None, apex_slack: float = 0.0,
              near_first: bool = False, per_tile_cap: int | None = None,
              extra_mask=None):
    """Phase A: tile-major (tile, supercluster) interaction pairs.

    Returns (pair_tile [P], pair_sc [P], pair_valid [P], total_pairs []).
    Member-cluster survival is computed separately PER LAUNCH BLOCK
    (``_member_runs`` — the [P, SC] intermediates would be GBs at
    exact-capacity pair lists).  ``apex``: light-side shaft + cone + wedge
    binning for point-light shadow wavefronts.  ``near_first``: per-tile
    near-origin-first supercluster order (occlusion early-exit).
    """
    tiles = origins.shape[0] // tile_rays
    o_lo, o_hi, d_lo, d_hi, tile_any = _tile_bounds(
        origins, dirs, tile_rays, active
    )

    if apex is not None:
        # point-light shadow wavefront: light-side shaft + bounding cone
        # against the SUPERCLUSTER boxes (pallas_trace apex semantics)
        sl = jnp.float32(apex_slack)
        w_lo = (o_lo - sl) - apex
        w_hi = (o_hi + sl) - apex
        mask = (
            _frustum_box_mask(
                apex, apex, w_lo, w_hi,
                sc_min - 2.0 * sl, sc_max + 2.0 * sl,
                t_cap=jnp.float32(1.0 + 1e-4),
            )
            & _apex_cone_mask(apex, w_lo, w_hi, sc_min, sc_max, sl)
            & _apex_wedge_mask(apex, w_lo, w_hi, sc_min, sc_max, sl)
        )
    else:
        mask = _frustum_box_mask(o_lo, o_hi, d_lo, d_hi, sc_min, sc_max)
    if tile_any is not None:
        mask = mask & tile_any[:, None]
    if extra_mask is not None:
        # per-lane exact admission (lane_exact_sc_mask): strictly tighter
        # than — and AND-composable with — the hull tests above
        mask = mask & extra_mask

    L2 = sc_min.shape[0]
    if near_first:
        # per-tile NEAR-ORIGIN-FIRST supercluster order: occlusion walks
        # find blockers close to the surface first, so the tile-done
        # early exit fires after a pair or two instead of after the whole
        # (Morton-ordered) shaft.  Hit results are order-independent for
        # occlusion (any blocker suffices).
        o_c = 0.5 * (o_lo + o_hi)  # [tiles, 3]
        sc_c = 0.5 * (sc_min + sc_max)  # [L2, 3]
        dist = jnp.sum(
            (sc_c[None, :, :] - o_c[:, None, :]) ** 2, axis=-1
        )
        INFD = jnp.float32(3.4e38)
        ord_d = jnp.argsort(
            jnp.where(mask, dist, INFD), axis=1
        ).astype(jnp.int32)  # [tiles, L2] live-near-first
        mask = jnp.take_along_axis(mask, ord_d, axis=1)
        if per_tile_cap is not None:
            # TRUNCATED near walk: keep only each tile's per_tile_cap
            # nearest live superclusters (phase 1 of the two-phase shadow
            # resolution — deliberately incomplete; the caller re-traces
            # surviving lanes compacted).
            mask = mask & (
                jnp.arange(mask.shape[1], dtype=jnp.int32)[None]
                < per_tile_cap
            )
    flat = mask.reshape(-1)
    # stable argsort of ~mask: True entries first, in row-major order
    # == grouped by tile (essential: same-tile pairs must be consecutive
    # so the kernel's output block stays resident between them)
    n = min(pairs_cap, flat.shape[0])
    order = jnp.argsort(~flat, stable=True).astype(jnp.int32)[:n]
    if n < pairs_cap:
        order = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1:], (pairs_cap - n,))]
        )
    total = jnp.sum(flat, dtype=jnp.int32)
    p = jnp.arange(pairs_cap, dtype=jnp.int32)
    valid = p < total
    pair_tile = jnp.where(valid, order // L2, 0)
    rank = order % L2
    if near_first:
        pair_sc = jnp.where(valid, ord_d[pair_tile, rank], 0)
    else:
        pair_sc = jnp.where(valid, rank, 0)
    # dead padding pairs repeat the LAST valid pair's indices, so the
    # pipeline re-fetches nothing and the output block never moves
    last_tile = pair_tile[jnp.maximum(total - 1, 0)]
    last_sc = pair_sc[jnp.maximum(total - 1, 0)]
    pair_tile = jnp.where(valid, pair_tile, last_tile)
    pair_sc = jnp.where(valid, pair_sc, last_sc)

    return pair_tile, pair_sc, valid.astype(jnp.int32), total


_STREAM_UNROLL = 4  # member clusters tested per loop iteration

# Streamed-table memory layout (CRT_STREAM_LAYOUT, measured on TPU):
#   "rows"  — six arrays, per-cluster [16, X] tiles (X = 3/9/1): every
#             16-sublane row carries 12-72 real bytes into 512-byte lanes,
#             so the per-step DMA writes ~816 KB of VMEM for 34 KB of data
#             in thousands of sub-burst rows (the round-3 shadow wall).
#   "fused" — ONE [L, 16, 18] array (n|nv0|m|c|nobf|tri_id columns): same
#             kernel math (static column slices of a [16, 128]-padded
#             tile), one contiguous HBM read, ~262 KB VMEM writes/step.
#   "lane"  — [L2, 18, sc*16] supercluster slabs, triangle slots on LANES:
#             18 rows x 2 KB proper DMA bursts (~49 KB/step, the designed
#             ~17x cut); members are extracted in-kernel by a dynamic
#             lane rotate + [16, 18] transpose per live member.
_F_COLS = 18  # n xyz | nv0 | m (9) | c (3) | nobf | tri_id


def stream_layout() -> str:
    import os

    # "fused" measured −11 % on the 1M-tri primary stream trace (317.5 →
    # 281.8 ms; frame flat within relay variance), bit-identical results.
    # "lane" (the designed [L2, 18, sc*16] repack) measured WORSE — the
    # per-member dynamic lane rotate + [16, 18] transpose costs more than
    # the padded DMA it saves (Pallas double buffering was already hiding
    # the ~30x write inflation).  Full numbers: docs/PERFORMANCE.md round 4.
    return os.environ.get("CRT_STREAM_LAYOUT", "fused")


def build_fused_table(tables: ClusterTables) -> jnp.ndarray:
    """[L, 16, 18] f32 fused per-triangle constants (column map above).
    tri_id rides as f32 — exact for ids < 2^24 (asserted)."""
    L = tables.n.shape[0]
    assert L * 16 < (1 << 24), "tri ids not exact in f32"
    return jnp.concatenate(
        [
            tables.n,
            tables.nv0[..., None],
            tables.m,
            tables.c,
            tables.nobf[..., None],
            tables.tri_id.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )


def _f_test_closest(f, o3, d3, carry):
    """Closest-hit test of one 16-triangle cluster from a fused [16, 18]
    block against the tile's rays.  Same math as _stream_kernel's
    _test_cluster, reading static column slices."""
    INF = jnp.float32(jnp.inf)
    BIGID = jnp.int32(2**30)
    ox, oy, oz = o3
    dx, dy, dz = d3
    best_t, best_tri = carry
    nd = f[:, 0:1] * dx + f[:, 1:2] * dy + f[:, 2:3] * dz
    no = f[:, 0:1] * ox + f[:, 1:2] * oy + f[:, 2:3] * oz
    opd = f[:, 3:4] - no
    not_parallel = jnp.abs(nd) >= PARALLEL_EPS
    face_ok = (opd < 0.0) | (f[:, 16:17] > 0.5)
    t = opd / jnp.where(not_parallel, nd, 1.0)
    valid = not_parallel & face_ok & (t >= 0.0)
    for e in range(3):
        md = (
            f[:, 4 + 3 * e : 5 + 3 * e] * dx
            + f[:, 5 + 3 * e : 6 + 3 * e] * dy
            + f[:, 6 + 3 * e : 7 + 3 * e] * dz
        )
        mo = (
            f[:, 4 + 3 * e : 5 + 3 * e] * ox
            + f[:, 5 + 3 * e : 6 + 3 * e] * oy
            + f[:, 6 + 3 * e : 7 + 3 * e] * oz
        )
        valid = valid & ((mo - f[:, 13 + e : 14 + e]) + t * md >= 0.0)
    t = jnp.where(valid, t, INF)
    cl_best = jnp.min(t, axis=0, keepdims=True)
    tid = f[:, 17:18].astype(jnp.int32)
    cand = jnp.where(t <= cl_best, tid, BIGID)
    cl_tri = jnp.min(cand, axis=0, keepdims=True)
    better = cl_best < best_t
    return (
        jnp.where(better, cl_best, best_t),
        jnp.where(better, cl_tri, best_tri),
    )


def _f_test_occl(f, o3, d3, r2, blocked):
    """Any-hit (occlusion) variant of _f_test_closest."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    nd = f[:, 0:1] * dx + f[:, 1:2] * dy + f[:, 2:3] * dz
    no = f[:, 0:1] * ox + f[:, 1:2] * oy + f[:, 2:3] * oz
    opd = f[:, 3:4] - no
    not_parallel = jnp.abs(nd) >= PARALLEL_EPS
    face_ok = (opd < 0.0) | (f[:, 16:17] > 0.5)
    t = opd / jnp.where(not_parallel, nd, 1.0)
    valid = not_parallel & face_ok & (t >= 0.0) & (t * t <= r2)
    for e in range(3):
        md = (
            f[:, 4 + 3 * e : 5 + 3 * e] * dx
            + f[:, 5 + 3 * e : 6 + 3 * e] * dy
            + f[:, 6 + 3 * e : 7 + 3 * e] * dz
        )
        mo = (
            f[:, 4 + 3 * e : 5 + 3 * e] * ox
            + f[:, 5 + 3 * e : 6 + 3 * e] * oy
            + f[:, 6 + 3 * e : 7 + 3 * e] * oz
        )
        valid = valid & ((mo - f[:, 13 + e : 14 + e]) + t * md >= 0.0)
    return blocked | jnp.any(valid, axis=0, keepdims=True).astype(jnp.int32)


def _member_at_fn(pair_perm_ref, p, W, count):
    """idx -> cluster index from the 5-bit-packed live-first permutation
    (clamped past ``count``; re-tests are idempotent)."""

    def member_at(idx):
        idx = jnp.minimum(idx, count - 1)
        word = pair_perm_ref[p * W + idx // _PERM_PER_WORD]
        sh = (idx % _PERM_PER_WORD).astype(jnp.uint32) * _PERM_BITS
        return (
            jax.lax.shift_right_logical(word, sh) & jnp.uint32(31)
        ).astype(jnp.int32)

    return member_at


def _make_f_kernel(occl: bool, vma: tuple = (), lane_sc: int | None = None):
    """Kernel factory over the FUSED-column table layouts.

    ``lane_sc`` is None for the "fused" layout (one [SC, 16, 18] streamed
    block; member f-blocks are direct leading-dim reads) or SC_CLUSTERS
    for the "lane" layout (one [1, 18, sc*16] slab — triangle slots on
    lanes for proper 2 KB DMA bursts; each live member's [18, 16] lane
    window is extracted with a dynamic lane rotate and transposed to the
    [16, 18] shape the burst math wants)."""

    def kernel(pair_tile_ref, pair_sc_ref, pair_count_ref, pair_perm_ref,
               *refs):
        if occl:
            o_ref, d_ref, r2_ref, prev_ref, f_ref, occ_ref = refs
        else:
            o_ref, d_ref, f_ref, best_t_ref, best_tri_ref = refs
        p = pl.program_id(0)
        W = pair_perm_ref.shape[0] // pair_tile_ref.shape[0]
        first_of_tile = jnp.logical_or(
            p == 0, pair_tile_ref[p] != pair_tile_ref[jnp.maximum(p - 1, 0)]
        )

        if occl:
            @pl.when(first_of_tile)
            def _init():
                occ_ref[...] = prev_ref[...]

            count = pair_count_ref[p]
            done = jnp.all(occ_ref[0, 0:1, :] > 0)
            run = (count > 0) & jnp.logical_not(done)
        else:
            @pl.when(first_of_tile)
            def _init():
                best_t_ref[...] = jnp.full_like(best_t_ref, jnp.inf)
                best_tri_ref[...] = jnp.full_like(best_tri_ref, -1)

            count = pair_count_ref[p]
            run = count > 0

        @pl.when(run)
        def _work():
            o3 = (o_ref[0, 0:1, :], o_ref[0, 1:2, :], o_ref[0, 2:3, :])
            d3 = (d_ref[0, 0:1, :], d_ref[0, 1:2, :], d_ref[0, 2:3, :])
            member_at = _member_at_fn(pair_perm_ref, p, W, count)
            if lane_sc is None:
                member_f = lambda ci: f_ref[ci]
            else:
                slab = f_ref[0]  # [18, S]

                def member_f(ci):
                    # member ci occupies lanes [ci*16, ci*16+16)
                    rolled = pltpu.roll(slab, -ci * 16, axis=1)
                    return rolled[:, :16].T  # [16, 18]

            def step(k, carry):
                base = k * _STREAM_UNROLL
                for u in range(_STREAM_UNROLL):
                    f = member_f(member_at(base + u))
                    if occl:
                        carry = _f_test_occl(f, o3, d3, r2_ref[0, 0:1, :],
                                             carry)
                    else:
                        carry = _f_test_closest(f, o3, d3, carry)
                return carry

            steps = (count + _STREAM_UNROLL - 1) // _STREAM_UNROLL
            if vma:
                # ref-state loop (see module note on vma): index-only carry
                def body_ref(k, _):
                    if occl:
                        occ_ref[0, 0, :] = step(k, occ_ref[0, 0:1, :])[0]
                    else:
                        out = step(k, (best_t_ref[0], best_tri_ref[0]))
                        best_t_ref[0] = out[0]
                        best_tri_ref[0] = out[1]
                    return jnp.int32(0)

                jax.lax.fori_loop(0, steps, body_ref, jnp.int32(0))
            elif occl:
                blocked = jax.lax.fori_loop(
                    0, steps, step, occ_ref[0, 0:1, :]
                )
                occ_ref[0, 0, :] = blocked[0]
            else:
                out = jax.lax.fori_loop(
                    0, steps, step, (best_t_ref[0], best_tri_ref[0])
                )
                best_t_ref[0] = out[0]
                best_tri_ref[0] = out[1]

    return kernel


def _stream_kernel(
    pair_tile_ref,  # [P] SMEM (scalar prefetch)
    pair_sc_ref,  # [P] SMEM
    pair_count_ref,  # [P] SMEM i32 — live member-cluster count
    pair_perm_ref,  # [P * W] SMEM u32 — packed live-first member perm
    o_ref,  # [1, 3, TR] VMEM — the pair's ray tile
    d_ref,  # [1, 3, TR] VMEM
    n_ref,  # [SC_CLUSTERS, 16, 3] VMEM — streamed supercluster slice
    nv0_ref,  # [SC_CLUSTERS, 16]
    m_ref,  # [SC_CLUSTERS, 16, 9]
    c_ref,  # [SC_CLUSTERS, 16, 3]
    nobf_ref,  # [SC_CLUSTERS, 16]
    tid_ref,  # [SC_CLUSTERS, 16] i32
    best_t_ref,  # [1, 1, TR] out (revisited across same-tile pairs)
    best_tri_ref,  # [1, 1, TR] out i32
    *,
    vma: tuple = (),
):
    p = pl.program_id(0)
    INF = jnp.float32(jnp.inf)
    BIGID = jnp.int32(2**30)
    W = pair_perm_ref.shape[0] // pair_tile_ref.shape[0]

    first_of_tile = jnp.logical_or(
        p == 0, pair_tile_ref[p] != pair_tile_ref[jnp.maximum(p - 1, 0)]
    )

    @pl.when(first_of_tile)
    def _init():
        best_t_ref[...] = jnp.full_like(best_t_ref, INF)
        best_tri_ref[...] = jnp.full_like(best_tri_ref, -1)

    count = pair_count_ref[p]

    @pl.when(count > 0)
    def _work():
        ox, oy, oz = o_ref[0, 0:1, :], o_ref[0, 1:2, :], o_ref[0, 2:3, :]
        dx, dy, dz = d_ref[0, 0:1, :], d_ref[0, 1:2, :], d_ref[0, 2:3, :]

        def member_at(idx):
            # the idx-th LIVE member\'s cluster index from the 5-bit-packed
            # permutation; indices past count clamp to the last live member
            # (re-testing is idempotent under the strict-< min-combine), so
            # no per-member cond runs — the old bitmask walk paid one
            # lax.cond per member (3.5 M scalar conds on the 1M-tri frame).
            idx = jnp.minimum(idx, count - 1)
            word = pair_perm_ref[p * W + idx // _PERM_PER_WORD]
            sh = (idx % _PERM_PER_WORD).astype(jnp.uint32) * _PERM_BITS
            return (
                jax.lax.shift_right_logical(word, sh) & jnp.uint32(31)
            ).astype(jnp.int32)

        def body(k, carry):
            base = k * _STREAM_UNROLL
            for u in range(_STREAM_UNROLL):
                carry = _test_cluster(member_at(base + u), carry)
            return carry

        def _test_cluster(ci, carry):
            best_t, best_tri = carry
            n = n_ref[ci]  # [16, 3]
            nd = n[:, 0:1] * dx + n[:, 1:2] * dy + n[:, 2:3] * dz
            no = n[:, 0:1] * ox + n[:, 1:2] * oy + n[:, 2:3] * oz
            opd = nv0_ref[ci][:, None] - no

            not_parallel = jnp.abs(nd) >= PARALLEL_EPS
            front = opd < 0.0
            face_ok = front | (nobf_ref[ci][:, None] > 0.5)
            t = opd / jnp.where(not_parallel, nd, 1.0)
            valid = not_parallel & face_ok & (t >= 0.0)

            m = m_ref[ci]
            c = c_ref[ci]
            for e in range(3):
                md = (
                    m[:, 3 * e + 0 : 3 * e + 1] * dx
                    + m[:, 3 * e + 1 : 3 * e + 2] * dy
                    + m[:, 3 * e + 2 : 3 * e + 3] * dz
                )
                mo = (
                    m[:, 3 * e + 0 : 3 * e + 1] * ox
                    + m[:, 3 * e + 1 : 3 * e + 2] * oy
                    + m[:, 3 * e + 2 : 3 * e + 3] * oz
                )
                valid = valid & ((mo - c[:, e : e + 1]) + t * md >= 0.0)

            t = jnp.where(valid, t, INF)
            cl_best = jnp.min(t, axis=0, keepdims=True)
            tid = tid_ref[ci][:, None]
            cand = jnp.where(t <= cl_best, tid, BIGID)
            cl_tri = jnp.min(cand, axis=0, keepdims=True)
            better = cl_best < best_t
            return (
                jnp.where(better, cl_best, best_t),
                jnp.where(better, cl_tri, best_tri),
            )

        steps = (count + _STREAM_UNROLL - 1) // _STREAM_UNROLL
        if vma:
            # ref-state loop (see module note on vma): index-only carry
            def body_ref(k, _):
                out = body(k, (best_t_ref[0], best_tri_ref[0]))
                best_t_ref[0] = out[0]
                best_tri_ref[0] = out[1]
                return jnp.int32(0)

            jax.lax.fori_loop(0, steps, body_ref, jnp.int32(0))
        else:
            init = (best_t_ref[0], best_tri_ref[0])
            best_t, best_tri = jax.lax.fori_loop(0, steps, body, init)
            best_t_ref[0] = best_t
            best_tri_ref[0] = best_tri


def _stream_occl_kernel(
    pair_tile_ref,  # [P] SMEM
    pair_sc_ref,  # [P] SMEM
    pair_count_ref,  # [P] SMEM i32
    pair_perm_ref,  # [P * W] SMEM u32
    o_ref,  # [1, 3, TR] VMEM
    d_ref,  # [1, 3, TR] VMEM
    r2_ref,  # [1, 1, TR] VMEM — squared max occlusion distance
    prev_ref,  # [1, 1, TR] VMEM i32 — prior-launch occlusion carry
    n_ref, nv0_ref, m_ref, c_ref, nobf_ref,
    occ_ref,  # [1, 1, TR] i32 out
    *,
    vma: tuple = (),
):
    """Occlusion-specialized stream kernel with TILE-DONE early exit.

    Shadow wavefronts through dense large scenes occlude almost every
    lane within the first pair or two, but a tile can have dozens of
    pairs — before walking a pair\'s members the kernel checks whether
    the (output-resident) occlusion plane is already all-blocked and
    skips the whole pair (one [1, TR] reduction vs ~count bursts).
    ``prev_ref`` carries occlusion across multi-launch blocks so later
    blocks early-exit on tiles finished by earlier ones."""
    p = pl.program_id(0)
    W = pair_perm_ref.shape[0] // pair_tile_ref.shape[0]

    first_of_tile = jnp.logical_or(
        p == 0, pair_tile_ref[p] != pair_tile_ref[jnp.maximum(p - 1, 0)]
    )

    @pl.when(first_of_tile)
    def _init():
        occ_ref[...] = prev_ref[...]

    count = pair_count_ref[p]
    done = jnp.all(occ_ref[0, 0:1, :] > 0)

    @pl.when((count > 0) & jnp.logical_not(done))
    def _work():
        ox, oy, oz = o_ref[0, 0:1, :], o_ref[0, 1:2, :], o_ref[0, 2:3, :]
        dx, dy, dz = d_ref[0, 0:1, :], d_ref[0, 1:2, :], d_ref[0, 2:3, :]
        r2 = r2_ref[0, 0:1, :]

        def member_at(idx):
            idx = jnp.minimum(idx, count - 1)
            word = pair_perm_ref[p * W + idx // _PERM_PER_WORD]
            sh = (idx % _PERM_PER_WORD).astype(jnp.uint32) * _PERM_BITS
            return (
                jax.lax.shift_right_logical(word, sh) & jnp.uint32(31)
            ).astype(jnp.int32)

        def one(ci, blocked):
            n = n_ref[ci]
            nd = n[:, 0:1] * dx + n[:, 1:2] * dy + n[:, 2:3] * dz
            no = n[:, 0:1] * ox + n[:, 1:2] * oy + n[:, 2:3] * oz
            opd = nv0_ref[ci][:, None] - no
            not_parallel = jnp.abs(nd) >= PARALLEL_EPS
            face_ok = (opd < 0.0) | (nobf_ref[ci][:, None] > 0.5)
            t = opd / jnp.where(not_parallel, nd, 1.0)
            valid = not_parallel & face_ok & (t >= 0.0) & (t * t <= r2)
            m = m_ref[ci]
            c = c_ref[ci]
            for e in range(3):
                md = (
                    m[:, 3 * e + 0 : 3 * e + 1] * dx
                    + m[:, 3 * e + 1 : 3 * e + 2] * dy
                    + m[:, 3 * e + 2 : 3 * e + 3] * dz
                )
                mo = (
                    m[:, 3 * e + 0 : 3 * e + 1] * ox
                    + m[:, 3 * e + 1 : 3 * e + 2] * oy
                    + m[:, 3 * e + 2 : 3 * e + 3] * oz
                )
                valid = valid & ((mo - c[:, e : e + 1]) + t * md >= 0.0)
            return blocked | jnp.any(
                valid, axis=0, keepdims=True
            ).astype(jnp.int32)

        def body(k, blocked):
            base = k * _STREAM_UNROLL
            for u in range(_STREAM_UNROLL):
                blocked = one(member_at(base + u), blocked)
            return blocked

        steps = (count + _STREAM_UNROLL - 1) // _STREAM_UNROLL
        if vma:
            def body_ref(k, _):
                occ_ref[0, 0, :] = body(k, occ_ref[0, 0:1, :])[0]
                return jnp.int32(0)

            jax.lax.fori_loop(0, steps, body_ref, jnp.int32(0))
        else:
            blocked = jax.lax.fori_loop(
                0, steps, body, occ_ref[0, 0:1, :]
            )
            occ_ref[0, 0, :] = blocked[0]


def _table_operands_and_specs(tables, fused, sc: int, layout: str):
    """(streamed table operands, their BlockSpecs) per layout (closest-hit
    set; the occlusion set drops tri_id in "rows")."""
    if layout == "rows":
        specs = [
            pl.BlockSpec((sc, 16, 3), lambda p, pt, ps, pc, pm: (ps[p], 0, 0)),
            pl.BlockSpec((sc, 16), lambda p, pt, ps, pc, pm: (ps[p], 0)),
            pl.BlockSpec((sc, 16, 9), lambda p, pt, ps, pc, pm: (ps[p], 0, 0)),
            pl.BlockSpec((sc, 16, 3), lambda p, pt, ps, pc, pm: (ps[p], 0, 0)),
            pl.BlockSpec((sc, 16), lambda p, pt, ps, pc, pm: (ps[p], 0)),
            pl.BlockSpec((sc, 16), lambda p, pt, ps, pc, pm: (ps[p], 0)),
        ]
        ops = [tables.n, tables.nv0, tables.m, tables.c, tables.nobf,
               tables.tri_id]
        return ops, specs
    if layout == "fused":
        return [fused], [
            pl.BlockSpec((sc, 16, _F_COLS),
                         lambda p, pt, ps, pc, pm: (ps[p], 0, 0)),
        ]
    if layout == "lane":
        S = sc * 16
        lane = fused.reshape(-1, S, _F_COLS).transpose(0, 2, 1)  # [L2,18,S]
        return [lane], [
            pl.BlockSpec((1, _F_COLS, S),
                         lambda p, pt, ps, pc, pm: (ps[p], 0, 0)),
        ]
    raise ValueError(f"unknown stream layout {layout!r}")


def _launch_stream_occl(tables, fused, sc, o_t, d_t, r2_t, prev_occ,
                        pair_tile, pair_sc, pair_count, pair_perm, cap: int,
                        tile_rays: int, interpret: bool, layout: str):
    """Occlusion launch at static grid ``cap`` -> occ [tiles, 1, TR] i32."""
    tiles = o_t.shape[0]
    W = -(-sc // _PERM_PER_WORD)
    vma = _out_vma(o_t, d_t, r2_t, prev_occ, pair_tile, *tables)
    vma_t = tuple(sorted(vma))
    tab_ops, tab_specs = _table_operands_and_specs(tables, fused, sc, layout)
    if layout == "rows":
        tab_ops, tab_specs = tab_ops[:-1], tab_specs[:-1]  # no tri_id
        kernel = functools.partial(_stream_occl_kernel, vma=vma_t)
    elif layout == "fused":
        kernel = _make_f_kernel(occl=True, vma=vma_t)
    else:
        kernel = _make_f_kernel(occl=True, vma=vma_t, lane_sc=sc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, 3, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
            pl.BlockSpec((1, 3, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
            pl.BlockSpec((1, 1, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
            pl.BlockSpec((1, 1, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
            *tab_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
        ],
    )
    (occ,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, tile_rays), jnp.int32, vma=vma)
        ],
        interpret=interpret,
    )(
        pair_tile[:cap], pair_sc[:cap], pair_count[:cap],
        pair_perm[: cap * W],
        o_t, d_t, r2_t, prev_occ,
        *tab_ops,
    )
    return occ


def _launch_stream_kernel(tables, fused, sc, o_t, d_t, pair_tile, pair_sc,
                          pair_count, pair_perm, cap: int, tile_rays: int,
                          interpret: bool, layout: str):
    """One pallas_call at a STATIC grid size ``cap`` over the first ``cap``
    entries of the (tile-major) pair arrays."""
    tiles = o_t.shape[0]
    W = -(-sc // _PERM_PER_WORD)
    vma = _out_vma(o_t, d_t, pair_tile, *tables)
    vma_t = tuple(sorted(vma))
    tab_ops, tab_specs = _table_operands_and_specs(tables, fused, sc, layout)
    if layout == "rows":
        kernel = functools.partial(_stream_kernel, vma=vma_t)
    elif layout == "fused":
        kernel = _make_f_kernel(occl=False, vma=vma_t)
    else:
        kernel = _make_f_kernel(occl=False, vma=vma_t, lane_sc=sc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # pair_tile, pair_sc, pair_count, pair_perm
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, 3, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
            pl.BlockSpec((1, 3, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
            *tab_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
            pl.BlockSpec((1, 1, tile_rays),
                         lambda p, pt, ps, pc, pm: (pt[p], 0, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, tile_rays), jnp.float32,
                                 vma=vma),
            jax.ShapeDtypeStruct((tiles, 1, tile_rays), jnp.int32, vma=vma),
        ],
        interpret=interpret,
    )(
        pair_tile[:cap], pair_sc[:cap], pair_count[:cap],
        pair_perm[: cap * W],
        o_t, d_t,
        *tab_ops,
    )


@functools.partial(
    jax.jit,
    static_argnames=("pairs_cap", "tile_rays", "interpret", "tiered",
                     "block", "layout"),
)
def closest_hit_stream_flat(
    tables: ClusterTables,  # cluster axis padded to SC_CLUSTERS
    sc_min,
    sc_max,
    origins,  # [R, 3], R % tile_rays == 0
    dirs,
    active=None,
    pairs_cap: int | None = None,
    tile_rays: int = TILE_RAYS,
    interpret: bool = False,
    tiered: bool = True,
    block: int = 16384,
    apex=None,  # [tiles, 3]: point-light shadow shaft binning
    apex_slack=0.0,
    layout: str | None = None,  # streamed-table layout (see stream_layout)
):
    """Streaming closest hit.  Returns (Hit, total_pairs).

    The pair list defaults to EXACT capacity (tiles x superclusters) —
    overflow-free for any scene.  Grid sizes must be static and the SMEM
    scalar-prefetch budget bounds one launch to ~``block`` pairs, so the
    kernel runs as a ``lax.while_loop`` over ceil(total/block) launches
    (block=16384 keeps tile ids + member counts + the 5-bit-packed member
    permutations within the 1 MB SMEM scalar-prefetch budget)
    (only LIVE blocks execute; per-launch partial hits min-combine with
    the reference's lowest-id tie-break).  Single-block pair lists keep
    the tiered lax.switch fast path: four kernels at caps {cap/8 .. cap}
    and only the smallest that holds the live count runs.

    Round-2 regression disclosed: the old fixed pairs_cap=32768 silently
    DROPPED pairs past the cap (the 1M-triangle benchmark needs ~111k) —
    the published 572.6 ms big-scene number was rendering incomplete
    geometry.  The multi-launch path removes the failure mode entirely.
    """
    R = origins.shape[0]
    tiles = R // tile_rays
    L2 = sc_min.shape[0]
    if pairs_cap is None:
        pairs_cap = tiles * L2  # exact upper bound — cannot overflow
    pairs_cap = min(pairs_cap, tiles * L2)

    o_t = origins.reshape(tiles, tile_rays, 3).swapaxes(1, 2)
    d_t = dirs.reshape(tiles, tile_rays, 3).swapaxes(1, 2)
    sc = tables.n.shape[0] // L2
    layout = layout or stream_layout()
    fused = build_fused_table(tables) if layout != "rows" else None

    bounds = _tile_bounds(origins, dirs, tile_rays, active)

    if pairs_cap <= block:
        # single-launch fast path (small scenes / tests): tiered switch
        pair_tile, pair_sc, pair_valid, total = bin_pairs(
            sc_min, sc_max, origins, dirs, pairs_cap, tile_rays, active,
            apex=apex, apex_slack=apex_slack,
        )
        pair_count, pair_perm = _member_runs(
            bounds, pair_tile, pair_sc, tables.cl_min, tables.cl_max, sc,
            apex=apex, apex_slack=apex_slack,
        )
        pair_count = jnp.where(pair_valid > 0, pair_count, 0)
        caps = [pairs_cap]
        if tiered:
            caps = sorted({max(1, pairs_cap >> s) for s in (3, 2, 1, 0)})

        def make_branch(cap):
            def branch(args):
                return _launch_stream_kernel(
                    tables, fused, sc, *args, cap=cap, tile_rays=tile_rays,
                    interpret=interpret, layout=layout,
                )
            return branch

        args = (o_t, d_t, pair_tile, pair_sc, pair_count, pair_perm)
        if len(caps) == 1:
            best_t, best_tri = make_branch(caps[0])(args)
        else:
            tier = jnp.searchsorted(
                jnp.asarray(caps, jnp.int32), total, side="left"
            )
            tier = jnp.minimum(tier, len(caps) - 1)
            best_t, best_tri = jax.lax.switch(
                tier, [make_branch(c) for c in caps], args
            )
        touched = (
            jnp.zeros((tiles,), jnp.int32).at[pair_tile].max(pair_valid) > 0
        )
        best_t = jnp.where(touched[:, None, None], best_t, jnp.inf)
        best_tri = jnp.where(touched[:, None, None], best_tri, -1)
        return Hit(t=best_t.reshape(-1), tri=best_tri.reshape(-1)), total

    # ---- multi-launch: while_loop over live pair blocks -------------------
    pair_tile, pair_sc, pair_valid, total = bin_pairs(
        sc_min, sc_max, origins, dirs, pairs_cap, tile_rays, active,
        apex=apex, apex_slack=apex_slack,
    )
    nblocks = -(-pairs_cap // block)
    pad = nblocks * block - pairs_cap
    if pad:
        # repeat-last padding: no tile change, no re-DMA (see the
        # occlusion path for why zero-padding is a correctness hazard)
        pair_tile = jnp.concatenate(
            [pair_tile, jnp.broadcast_to(pair_tile[-1:], (pad,))]
        )
        pair_sc = jnp.concatenate(
            [pair_sc, jnp.broadcast_to(pair_sc[-1:], (pad,))]
        )
        pair_valid = jnp.concatenate(
            [pair_valid, jnp.zeros((pad,), jnp.int32)]
        )

    INF = jnp.float32(jnp.inf)
    init = (
        jnp.int32(0),
        jnp.full((tiles, 1, tile_rays), INF, jnp.float32),
        jnp.full((tiles, 1, tile_rays), -1, jnp.int32),
    )

    def cond(state):
        i, *_ = state
        return i * block < total

    def body(state):
        i, best_t, best_tri = state
        start = i * block
        blk_tile = jax.lax.dynamic_slice_in_dim(pair_tile, start, block)
        blk_sc = jax.lax.dynamic_slice_in_dim(pair_sc, start, block)
        blk_valid = jax.lax.dynamic_slice_in_dim(pair_valid, start, block)
        blk_count, blk_perm = _member_runs(
            bounds, blk_tile, blk_sc, tables.cl_min, tables.cl_max, sc,
            apex=apex, apex_slack=apex_slack,
        )
        blk_count = jnp.where(blk_valid > 0, blk_count, 0)
        out_t, out_tri = _launch_stream_kernel(
            tables, fused, sc, o_t, d_t, blk_tile, blk_sc, blk_count,
            blk_perm, cap=block, tile_rays=tile_rays, interpret=interpret,
            layout=layout,
        )
        touched = (
            jnp.zeros((tiles,), jnp.int32).at[blk_tile].max(blk_valid) > 0
        )[:, None, None]
        out_t = jnp.where(touched, out_t, INF)
        out_tri = jnp.where(touched, out_tri, -1)
        # strict < combine: at equal t the EARLIER pair wins — exactly the
        # in-launch sequential rule (`cl_best < best_t` in _stream_kernel),
        # so splitting the pair list across launches is invisible.
        better = out_t < best_t
        return (
            i + 1,
            jnp.where(better, out_t, best_t),
            jnp.where(better, out_tri, best_tri),
        )

    _, best_t, best_tri = jax.lax.while_loop(cond, body, init)
    return Hit(t=best_t.reshape(-1), tri=best_tri.reshape(-1)), total


@functools.partial(
    jax.jit,
    static_argnames=("pairs_cap", "tile_rays", "interpret", "block",
                     "layout", "per_tile_cap", "lane_exact"),
)
def occluded_stream_flat(
    tables: ClusterTables,
    sc_min,
    sc_max,
    origins,  # [R, 3], R % tile_rays == 0
    dirs,
    r2,  # [R] squared max occlusion distance
    active,
    apex,  # [tiles, 3] light positions per tile
    apex_slack,
    pairs_cap: int | None = None,
    tile_rays: int = TILE_RAYS,
    interpret: bool = False,
    block: int = 16384,
    layout: str | None = None,
    per_tile_cap: int | None = None,
    lane_exact: bool | None = None,  # None -> CRT_STREAM_LANE_EXACT
):
    """Streaming any-hit occlusion -> [R] bool (apex shadow binning).

    Same pair machinery as closest_hit_stream_flat but through the
    occlusion kernel with TILE-DONE early exit — dense scenes block most
    lanes within a pair or two while a tile can have dozens of pairs."""
    R = origins.shape[0]
    tiles = R // tile_rays
    L2 = sc_min.shape[0]
    if pairs_cap is None:
        pairs_cap = tiles * L2
    pairs_cap = min(pairs_cap, tiles * L2)

    o_t = origins.reshape(tiles, tile_rays, 3).swapaxes(1, 2)
    d_t = dirs.reshape(tiles, tile_rays, 3).swapaxes(1, 2)
    r2_t = r2.reshape(tiles, 1, tile_rays)
    sc = tables.n.shape[0] // L2
    layout = layout or stream_layout()
    fused = build_fused_table(tables) if layout != "rows" else None

    bounds = _tile_bounds(origins, dirs, tile_rays, active)
    extra = None
    if lane_exact is None:
        # NOTE: this function is jitted — the module flag is baked into
        # the trace cache, so same-process A/Bs must pass the STATIC
        # lane_exact argument (a global patch silently no-ops on the
        # second call with equal avals; measured round 5).
        lane_exact = _LANE_EXACT
    if per_tile_cap is None and lane_exact:
        # FULL shaft walks (single-phase or phase 2): per-lane exact pair
        # admission — 2.33x fewer pairs than the hull on the 1M benchmark
        # for a few ms of slab tests (see lane_exact_sc_mask).  Truncated
        # phase-1 walks (per_tile_cap) skip it: their pair count is capped
        # anyway.
        extra = lane_exact_sc_mask(
            origins, dirs, r2, active, apex_slack, sc_min, sc_max,
            tile_rays,
        )
    pair_tile, pair_sc, pair_valid, total = bin_pairs(
        sc_min, sc_max, origins, dirs, pairs_cap, tile_rays, active,
        apex=apex, apex_slack=apex_slack, near_first=True,
        per_tile_cap=per_tile_cap, extra_mask=extra,
    )
    nblocks = -(-pairs_cap // block)
    pad = nblocks * block - pairs_cap
    if pad:
        # pad by REPEATING the last pair's indices (count/valid 0): a
        # zero-pad would flip first_of_tile at the valid->padding boundary
        # and re-initialize tile 0's live occlusion state mid-launch
        pair_tile = jnp.concatenate(
            [pair_tile, jnp.broadcast_to(pair_tile[-1:], (pad,))]
        )
        pair_sc = jnp.concatenate(
            [pair_sc, jnp.broadcast_to(pair_sc[-1:], (pad,))]
        )
        pair_valid = jnp.concatenate(
            [pair_valid, jnp.zeros((pad,), jnp.int32)]
        )

    # inactive lanes seed as "blocked": their occlusion is never consumed
    # (shading masks by activity), and without this a single inactive lane
    # keeps the tile-done early exit from ever firing
    if active is not None:
        init_occ = (
            jnp.logical_not(active).astype(jnp.int32)
            .reshape(tiles, 1, tile_rays)
        )
    else:
        init_occ = jnp.zeros((tiles, 1, tile_rays), jnp.int32)

    def one_block(start, occ, cap=block):
        blk_tile = jax.lax.dynamic_slice_in_dim(pair_tile, start, cap)
        blk_sc = jax.lax.dynamic_slice_in_dim(pair_sc, start, cap)
        blk_valid = jax.lax.dynamic_slice_in_dim(pair_valid, start, cap)
        blk_count, blk_perm = _member_runs(
            bounds, blk_tile, blk_sc, tables.cl_min, tables.cl_max, sc,
            apex=apex, apex_slack=apex_slack,
        )
        blk_count = jnp.where(blk_valid > 0, blk_count, 0)
        out = _launch_stream_occl(
            tables, fused, sc, o_t, d_t, r2_t, occ, blk_tile, blk_sc,
            blk_count, blk_perm, cap=cap, tile_rays=tile_rays,
            interpret=interpret, layout=layout,
        )
        touched = (
            jnp.zeros((tiles,), jnp.int32).at[blk_tile].max(blk_valid) > 0
        )[:, None, None]
        return jnp.where(touched, out, occ)

    if nblocks == 1:
        # single block: grid sized to the pair list, not the block quantum
        occ = one_block(jnp.int32(0), init_occ, cap=pairs_cap)
    else:
        def cond(state):
            i, _ = state
            return i * block < total

        def body(state):
            i, occ = state
            return (i + 1, one_block(i * block, occ))

        _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), init_occ))
    return occ.reshape(-1) > 0


def occluded_stream_twophase(
    tables, sc_min, sc_max,
    shadow_o,  # [R, 3] per-pixel biased origins (shared by every light)
    light_dirs,  # [Ll, R, 3]
    r2,  # [Ll, R]
    light_positions,  # [Ll, 3]
    active,  # [Ll, R] bool
    origin_slack,
    tile_rays: int = TILE_RAYS,
    interpret: bool = False,
    layout: str | None = None,
    phase1_k: int = 8,
):
    """Two-phase streaming shadow occlusion -> [Ll, R] bool.

    The single-phase shadow wall (round 3/4 measurements): dense scenes
    block ~85 % of lanes within the first near pairs, but the remaining
    lanes hold their tiles' FULL shaft walks open — pair-steps, not DMA,
    are the cost (the fused-layout sweep proved the padded DMA was hidden
    by double buffering).  So: phase 1 walks only each tile's ``phase1_k``
    nearest live superclusters (near-first truncated pair list — most
    lanes block); phase 2 COMPACTS the surviving lanes per light (stable
    sort keeps them pixel-tile-coherent) and re-traces the full shaft for
    ~(1 - blocked) of the wavefront — tiles, and therefore pair-steps,
    shrink by the survival factor.  Exact: phase 2 is a complete walk for
    every lane phase 1 left unresolved."""
    Ll, R = r2.shape
    tpl = R // tile_rays
    o_flat = jnp.broadcast_to(shadow_o[None], (Ll, R, 3)).reshape(-1, 3)
    d_flat = light_dirs.reshape(-1, 3)
    apex = jnp.repeat(light_positions, tpl, axis=0)
    occ1 = occluded_stream_flat(
        tables, sc_min, sc_max, o_flat, d_flat, r2.reshape(-1),
        active.reshape(-1), apex, origin_slack,
        tile_rays=tile_rays, interpret=interpret, layout=layout,
        per_tile_cap=phase1_k,
    ).reshape(Ll, R)

    surv = active & jnp.logical_not(occ1)
    # per-light stable compaction: survivors to the front, original
    # (pixel-tile-major) order preserved — origins stay coherent and the
    # per-tile apex (one light per R-lane segment) stays valid
    perm = jnp.argsort(jnp.logical_not(surv), axis=1, stable=True)
    o2 = jnp.take_along_axis(
        jnp.broadcast_to(shadow_o[None], (Ll, R, 3)), perm[..., None], axis=1
    )
    d2 = jnp.take_along_axis(light_dirs, perm[..., None], axis=1)
    r2_2 = jnp.take_along_axis(r2, perm, axis=1)
    a2 = jnp.take_along_axis(surv, perm, axis=1)
    occ2 = occluded_stream_flat(
        tables, sc_min, sc_max, o2.reshape(-1, 3), d2.reshape(-1, 3),
        r2_2.reshape(-1), a2.reshape(-1), apex, origin_slack,
        tile_rays=tile_rays, interpret=interpret, layout=layout,
    ).reshape(Ll, R)
    inv = jnp.argsort(perm, axis=1)
    occ2_back = jnp.take_along_axis(occ2, inv, axis=1)
    return occ1 | (occ2_back & surv)


def make_stream_trace_fn(scene, pairs_cap: int | None = None,
                         tile_rays: int | None = None,
                         interpret: bool = False,
                         sc_clusters: int = SC_CLUSTERS,
                         tiered: bool = True,
                         layout: str | None = None,
                         shadow_k: int = 2):
    """trace_fn factory for the HBM-streaming backend ("pallas_stream").

    ``shadow_k``: phase-1 depth of the two-phase shadow resolution
    (RenderSettings.stream_shadow_k; 0 = single phase)."""
    tile_rays = tile_rays or TILE_RAYS
    layout = layout or stream_layout()
    tables = build_cluster_tables(scene)
    tables, sc_min, sc_max = build_supercluster_boxes(tables, sc_clusters)
    tables = jax.tree.map(jax.lax.stop_gradient, tables)
    # pairs_cap=None -> exact capacity (tiles x superclusters) inside
    # closest_hit_stream_flat: overflow-free; the kernel multi-launches
    # over <=32k-pair blocks as needed.

    def trace(origins, dirs, active=None):
        batch_shape = origins.shape[:-1]
        o = origins.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        R = o.shape[0]
        pad = (-R) % tile_rays
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            dpad = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], d.dtype), (pad, 1))
            d = jnp.concatenate([d, dpad])
        if active is not None:
            a = active.reshape(-1)
            if pad:
                a = jnp.concatenate([a, jnp.zeros((pad,), bool)])
            a = jax.lax.stop_gradient(a)
        else:
            a = jnp.concatenate(
                [jnp.ones((R,), bool), jnp.zeros((pad,), bool)]
            ) if pad else None
        hit, _ = closest_hit_stream_flat(
            tables, sc_min, sc_max,
            jax.lax.stop_gradient(o), jax.lax.stop_gradient(d), a,
            pairs_cap=pairs_cap, tile_rays=tile_rays, interpret=interpret,
            tiered=tiered, layout=layout,
        )
        return Hit(
            t=hit.t[:R].reshape(batch_shape),
            tri=hit.tri[:R].reshape(batch_shape),
        )

    def shadow_apex(shadow_o, light_dirs, r2, light_positions, active,
                    origin_slack):
        """Occlusion masks for a point-light shadow wavefront -> [Ll, R]
        bool, binned with the light-side shaft + cone against SUPERCLUSTER
        and member boxes (the generic o/d-interval binning degenerates on
        shadow shafts — measured multi-second frames at 1M triangles).
        Occlusion-exact, same kernel."""
        Ll, R = r2.shape
        if R % tile_rays:
            sh = trace(
                jnp.broadcast_to(shadow_o[None], (Ll, R, 3)).reshape(-1, 3),
                light_dirs.reshape(-1, 3),
                jax.lax.stop_gradient(active).reshape(-1),
            )
            sh_t = jax.lax.stop_gradient(sh.t)
            occ = (sh.tri >= 0) & (sh_t * sh_t <= r2.reshape(-1))
            return occ.reshape(Ll, R)
        import os

        # Two-phase (round-4 sweep: 1M-tri frame 3693 -> 2278 ms, flat
        # across K in 2..8, bit-identical sums); K=0 disables.
        # Attribution (tools/exp_stream7.py): the win is mostly PHASE-2
        # COMPACTION of the ~63 % inactive shadow lanes (miss/facing-away
        # pixels) — phase 1 itself blocks only ~2.5 % of active lanes at
        # K=4 — so the cheapest phase-1 depth wins.
        k = int(os.environ.get("CRT_STREAM_SHADOW_K", str(shadow_k)))
        if k > 0:
            return occluded_stream_twophase(
                tables, sc_min, sc_max,
                jax.lax.stop_gradient(shadow_o),
                jax.lax.stop_gradient(light_dirs),
                jax.lax.stop_gradient(r2),
                jax.lax.stop_gradient(light_positions),
                jax.lax.stop_gradient(active),
                jnp.float32(origin_slack),
                tile_rays=tile_rays, interpret=interpret, layout=layout,
                phase1_k=k,
            )
        o_flat = jnp.broadcast_to(
            jax.lax.stop_gradient(shadow_o)[None], (Ll, R, 3)
        ).reshape(-1, 3)
        d_flat = jax.lax.stop_gradient(light_dirs).reshape(-1, 3)
        a_flat = jax.lax.stop_gradient(active).reshape(-1)
        apex = jnp.repeat(
            jax.lax.stop_gradient(light_positions), R // tile_rays, axis=0
        )
        r2_flat = jax.lax.stop_gradient(r2).reshape(-1)
        occ = occluded_stream_flat(
            tables, sc_min, sc_max, o_flat, d_flat, r2_flat, a_flat,
            apex, jnp.float32(origin_slack),
            pairs_cap=pairs_cap, tile_rays=tile_rays, interpret=interpret,
            layout=layout,
        )
        return occ.reshape(Ll, R)

    trace.shadow_apex = shadow_apex

    return trace
