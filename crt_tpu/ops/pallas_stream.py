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
  a pair_tile[p-1] != pair_tile[p] scalar check).  Padding pairs repeat
  the previous indices: no new DMA, no work (masked off via pair_valid).

The pair list is bounded by the static ``pairs_cap``; bin_pairs also
returns the true pair count so callers can detect overflow (overflowing
pairs would silently lose geometry — make_stream_trace_fn asserts via
debug callback in tests and sizes the cap generously).

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
    _frustum_box_mask,
    build_cluster_tables,
)

SC_CLUSTERS = 32  # default clusters per supercluster (32 x 16 = 512 tris)


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


def bin_pairs(sc_min, sc_max, origins, dirs, pairs_cap: int,
              tile_rays: int = TILE_RAYS, active=None, cl_min=None,
              cl_max=None):
    """Phase A: tile-major (tile, supercluster) interaction pairs.

    Returns (pair_tile [P], pair_sc [P], pair_valid [P], total_pairs [],
    pair_bits [P] uint32).  ``pair_bits`` (when cl_min/cl_max given, the
    [L2*SC, 3] member-cluster boxes) flags which of the pair's SC_CLUSTERS
    member clusters actually overlap the tile frustum — superclusters are
    coarse, so typically only a fraction of members survive; the kernel
    skips the rest (and the cluster-axis padding, whose inverted boxes
    never overlap) per bit.  Without boxes, all bits set.
    """
    tiles = origins.shape[0] // tile_rays
    o = origins.reshape(tiles, tile_rays, 3)
    d = dirs.reshape(tiles, tile_rays, 3)
    if active is None:
        o_lo, o_hi = o.min(axis=1), o.max(axis=1)
        d_lo, d_hi = d.min(axis=1), d.max(axis=1)
        tile_any = None
    else:
        INF = jnp.float32(3.4e38)
        a = active.reshape(tiles, tile_rays, 1)
        o_lo = jnp.where(a, o, INF).min(axis=1)
        o_hi = jnp.where(a, o, -INF).max(axis=1)
        d_lo = jnp.where(a, d, INF).min(axis=1)
        d_hi = jnp.where(a, d, -INF).max(axis=1)
        tile_any = jnp.any(a[..., 0], axis=1)

    mask = _frustum_box_mask(o_lo, o_hi, d_lo, d_hi, sc_min, sc_max)
    if tile_any is not None:
        mask = mask & tile_any[:, None]

    L2 = sc_min.shape[0]
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
    pair_sc = jnp.where(valid, order % L2, 0)
    # dead padding pairs repeat the LAST valid pair's indices, so the
    # pipeline re-fetches nothing and the output block never moves
    last_tile = pair_tile[jnp.maximum(total - 1, 0)]
    last_sc = pair_sc[jnp.maximum(total - 1, 0)]
    pair_tile = jnp.where(valid, pair_tile, last_tile)
    pair_sc = jnp.where(valid, pair_sc, last_sc)

    if cl_min is None:
        pair_bits = jnp.full((pairs_cap,), 0xFFFFFFFF, jnp.uint32)
    else:
        sc = cl_min.shape[0] // sc_min.shape[0]
        L2b = cl_min.shape[0] // sc
        mb_min = cl_min.reshape(L2b, sc, 3)[pair_sc]  # [P, SC, 3]
        mb_max = cl_max.reshape(L2b, sc, 3)[pair_sc]
        member = _frustum_box_mask(
            o_lo[pair_tile], o_hi[pair_tile],
            d_lo[pair_tile], d_hi[pair_tile],
            mb_min, mb_max,
        )  # [P, SC] (bmin/bmax carry the leading P batch dim)
        weights = (jnp.uint32(1) << jnp.arange(sc, dtype=jnp.uint32))[None]
        pair_bits = jnp.sum(
            jnp.where(member, weights, jnp.uint32(0)), axis=1,
            dtype=jnp.uint32,
        )
    return pair_tile, pair_sc, valid.astype(jnp.int32), total, pair_bits


def _stream_kernel(
    pair_tile_ref,  # [P] SMEM (scalar prefetch)
    pair_sc_ref,  # [P] SMEM
    pair_valid_ref,  # [P] SMEM
    pair_bits_ref,  # [P] SMEM uint32 — member-cluster survival bitmask
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
):
    p = pl.program_id(0)
    INF = jnp.float32(jnp.inf)
    BIGID = jnp.int32(2**30)

    first_of_tile = jnp.logical_or(
        p == 0, pair_tile_ref[p] != pair_tile_ref[jnp.maximum(p - 1, 0)]
    )

    @pl.when(first_of_tile)
    def _init():
        best_t_ref[...] = jnp.full_like(best_t_ref, INF)
        best_tri_ref[...] = jnp.full_like(best_tri_ref, -1)

    @pl.when(pair_valid_ref[p] > 0)
    def _work():
        ox, oy, oz = o_ref[0, 0:1, :], o_ref[0, 1:2, :], o_ref[0, 2:3, :]
        dx, dy, dz = d_ref[0, 0:1, :], d_ref[0, 1:2, :], d_ref[0, 2:3, :]
        bits = pair_bits_ref[p]

        def body(ci, carry):
            # Phase A flags which member clusters can touch this tile's
            # frustum (superclusters are coarse — often only a fraction
            # survive); the scalar core branches past the 16-triangle test
            # burst for culled members.  Padding clusters (inverted AABBs)
            # are culled for free the same way.
            bit_on = (
                jax.lax.shift_right_logical(bits, ci.astype(jnp.uint32))
                & jnp.uint32(1)
            ) > 0
            return jax.lax.cond(
                bit_on, lambda c: _test_cluster(ci, c), lambda c: c, carry
            )

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

        init = (best_t_ref[0], best_tri_ref[0])
        best_t, best_tri = jax.lax.fori_loop(0, n_ref.shape[0], body, init)
        best_t_ref[0] = best_t
        best_tri_ref[0] = best_tri


def _launch_stream_kernel(tables, sc, o_t, d_t, pair_tile, pair_sc,
                          pair_valid, pair_bits, cap: int, tile_rays: int,
                          interpret: bool):
    """One pallas_call at a STATIC grid size ``cap`` over the first ``cap``
    entries of the (tile-major) pair arrays."""
    tiles = o_t.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # pair_tile, pair_sc, pair_valid, pair_bits
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, 3, tile_rays),
                         lambda p, pt, ps, pv, pb: (pt[p], 0, 0)),
            pl.BlockSpec((1, 3, tile_rays),
                         lambda p, pt, ps, pv, pb: (pt[p], 0, 0)),
            pl.BlockSpec((sc, 16, 3), lambda p, pt, ps, pv, pb: (ps[p], 0, 0)),
            pl.BlockSpec((sc, 16), lambda p, pt, ps, pv, pb: (ps[p], 0)),
            pl.BlockSpec((sc, 16, 9), lambda p, pt, ps, pv, pb: (ps[p], 0, 0)),
            pl.BlockSpec((sc, 16, 3), lambda p, pt, ps, pv, pb: (ps[p], 0, 0)),
            pl.BlockSpec((sc, 16), lambda p, pt, ps, pv, pb: (ps[p], 0)),
            pl.BlockSpec((sc, 16), lambda p, pt, ps, pv, pb: (ps[p], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_rays),
                         lambda p, pt, ps, pv, pb: (pt[p], 0, 0)),
            pl.BlockSpec((1, 1, tile_rays),
                         lambda p, pt, ps, pv, pb: (pt[p], 0, 0)),
        ],
    )
    return pl.pallas_call(
        _stream_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, tile_rays), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, tile_rays), jnp.int32),
        ],
        interpret=interpret,
    )(
        pair_tile[:cap], pair_sc[:cap], pair_valid[:cap], pair_bits[:cap],
        o_t, d_t,
        tables.n, tables.nv0, tables.m, tables.c, tables.nobf,
        tables.tri_id,
    )


@functools.partial(
    jax.jit,
    static_argnames=("pairs_cap", "tile_rays", "interpret", "tiered"),
)
def closest_hit_stream_flat(
    tables: ClusterTables,  # cluster axis padded to SC_CLUSTERS
    sc_min,
    sc_max,
    origins,  # [R, 3], R % tile_rays == 0
    dirs,
    active=None,
    pairs_cap: int = 32768,
    tile_rays: int = TILE_RAYS,
    interpret: bool = False,
    tiered: bool = True,
):
    """Streaming closest hit.  Returns (Hit, total_pairs).

    ``tiered``: the grid size must be static, but the LIVE pair count is
    data-dependent and usually far below ``pairs_cap`` (sized for the worst
    frame) — dead padding pairs still pay per-grid-step sequencing.  With
    tiering, four kernels at caps {cap/8, cap/4, cap/2, cap} are compiled
    and ``lax.switch`` executes only the smallest one that holds the live
    count, all inside the jit (pair arrays are statically sliced per
    branch; the binning itself is shared).  Bit-identical output: dead
    pairs do no work in any tier.
    """
    R = origins.shape[0]
    tiles = R // tile_rays
    L2 = sc_min.shape[0]

    pair_tile, pair_sc, pair_valid, total, pair_bits = bin_pairs(
        sc_min, sc_max, origins, dirs, pairs_cap, tile_rays, active,
        cl_min=tables.cl_min, cl_max=tables.cl_max,
    )

    o_t = origins.reshape(tiles, tile_rays, 3).swapaxes(1, 2)
    d_t = dirs.reshape(tiles, tile_rays, 3).swapaxes(1, 2)

    sc = tables.n.shape[0] // L2
    caps = [pairs_cap]
    if tiered:
        caps = sorted(
            {max(1, pairs_cap >> s) for s in (3, 2, 1, 0)}
        )

    def make_branch(cap):
        def branch(args):
            return _launch_stream_kernel(
                tables, sc, *args, cap=cap, tile_rays=tile_rays,
                interpret=interpret,
            )
        return branch

    args = (o_t, d_t, pair_tile, pair_sc, pair_valid, pair_bits)
    if len(caps) == 1:
        best_t, best_tri = make_branch(caps[0])(args)
    else:
        # smallest tier that holds every live pair (total > pairs_cap
        # would overflow in ANY tier — callers size the cap, tests assert)
        tier = jnp.searchsorted(
            jnp.asarray(caps, jnp.int32), total, side="left"
        )
        tier = jnp.minimum(tier, len(caps) - 1)
        best_t, best_tri = jax.lax.switch(
            tier, [make_branch(c) for c in caps], args
        )
    # tiles with zero pairs never get initialized by the kernel — their
    # frustum intersected nothing, so they are misses by construction;
    # mask them explicitly.
    touched = (
        jnp.zeros((tiles,), jnp.int32).at[pair_tile].max(pair_valid) > 0
    )
    best_t = jnp.where(touched[:, None, None], best_t, jnp.inf)
    best_tri = jnp.where(touched[:, None, None], best_tri, -1)
    return Hit(t=best_t.reshape(-1), tri=best_tri.reshape(-1)), total


def make_stream_trace_fn(scene, pairs_cap: int | None = None,
                         tile_rays: int | None = None,
                         interpret: bool = False,
                         sc_clusters: int = SC_CLUSTERS,
                         tiered: bool = True):
    """trace_fn factory for the HBM-streaming backend ("pallas_stream")."""
    tile_rays = tile_rays or TILE_RAYS
    tables = build_cluster_tables(scene)
    tables, sc_min, sc_max = build_supercluster_boxes(tables, sc_clusters)
    tables = jax.tree.map(jax.lax.stop_gradient, tables)
    if pairs_cap is None:
        # generous default: every tile of a 2 M-ray frame touching 16
        # superclusters; overflow loses geometry, so size up for safety
        pairs_cap = 32768

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
            tiered=tiered,
        )
        return Hit(
            t=hit.t[:R].reshape(batch_shape),
            tri=hit.tri[:R].reshape(batch_shape),
        )

    return trace
