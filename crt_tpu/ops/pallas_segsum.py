"""Pallas TPU kernel: per-triangle gradient accumulation (segment matmul).

The differentiable hit-attribute path gathers one packed [K, T] row table at
the per-ray hit-triangle ids (crt_tpu.ops.shade.hit_attributes).  Its VJP is
a scatter-add of [K, R] cotangents into [K, T] — XLA lowers TPU scatter-adds
to a serialized update loop, which round-1 profiling found to dominate the
backward pass (fwd+bwd 49 ms vs 29 ms fwd on the 14-01 benchmark scene,
docs/ROADMAP.md).

TPU-native replacement: the scatter IS a matmul.  For one-hot selection
H[r, t] = (tri[r] == t),

    grad_packed[k, t] = sum_r g[k, r] * H[r, t]  =  (g @ H)[k, t]

so each grid step builds H for a (ray-tile x segment-tile) block *in VMEM*
(broadcasted-iota compare — H never touches HBM) and feeds the MXU,
accumulating into the [K, T_BLK] output block across the sequential ray
grid axis.  HBM traffic is the cotangents ([K, R] f32, rays on lanes,
re-read once per segment tile) + ids + the [K, T] output — tens of MB for
a 2 M-ray frame vs a serialized 2 M-update scatter loop.

Exactness: H is 0/1 in f32 and accumulation is f32, so the result equals
the XLA scatter-add up to f32 summation order — gradcheck-safe (validated
against the scatter path in tests/test_segsum.py).

Scope: used for T <= MAX_SEGMENTS (covers every course scene; bigger
scenes fall back to XLA scatter until a sort-based variant exists).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (platform dep)

R_TILE = 8192  # rays per grid step (large: ~1 us/step overhead floor;
#   the [r_sub, T_BLK] bf16 one-hot must stay within VMEM).  Round-4
#   sweep (tools/exp_r4_segsum.py): (8192, 1024) best — 14-01 fwd+bwd
#   28.35 -> 27.95 ms vs the round-3 (4096, 4096).
R_SUB = 1024  # rays per in-kernel sub-tile (see segment_accumulate_matmul)
T_BLK = 1024  # segment columns per grid step ([R_TILE, T_BLK] f32 = 4 MB)
MAX_SEGMENTS = 65536  # beyond this the g re-reads outweigh the scatter


def _vma_of(x) -> frozenset:
    """Varying-manual-axes of ``x`` under shard_map (empty outside)."""
    try:
        return frozenset(getattr(jax.typeof(x), "vma", None) or ())
    except TypeError:  # non-array (e.g. Python int)
        return frozenset()


def _match_varying(x, target_vma: frozenset):
    """Promote ``x`` to vary over every mesh axis in ``target_vma``.

    Inside shard_map the packed scene tables arrive *replicated* (unvarying)
    while the per-ray ids/cotangents vary over the rays mesh axes.  A custom
    VJP must hand back a cotangent whose varying axes MATCH its primal
    input's, so a per-device partial table gradient (varying — semantically
    what the segment-sum produces) is rejected against a replicated table.
    Casting the table to varying *before* the custom_vjp boundary makes the
    types line up, and the transpose of the cast is the psum that all-reduces
    the per-device partials — exactly the gradient semantics the sharded
    training step wants (parallel/sharded.py inverse_render_step).
    """
    extra = tuple(sorted(target_vma - _vma_of(x)))
    if extra:
        x = jax.lax.pcast(x, extra, to="varying")
    return x


def _kernel(band_lo_ref, band_hi_ref, tri_ref, g_ref, out_ref, *, t_blk,
            r_tile, r_sub):
    """out[K, T_BLK] += g[K, R_TILE] @ onehot(tri)[R_TILE, T_BLK].

    Precision: the one-hot is EXACT in bf16 (entries are 0/1), so instead
    of 6-pass HIGHEST (Mosaic lacks HIGH in-kernel) the cotangents are
    split g = hi + lo into two bf16 halves and accumulated through two
    1-pass MXU matmuls — ~1e-6 relative error at ~1 extra matmul, vs
    1.6e-3 for plain bf16 (measured).

    Banding: (band_lo, band_hi) bound each R_SUB-ray SUB-tile's segment
    ids.  With Morton-rank-remapped ids (segment_accumulate_banded) a
    pixel tile's hits span a narrow band, so most sub-tiles prove empty
    from SMEM and skip both the one-hot construction (the R x T_pad
    dominant cost) and the matmuls.  Sub-tiling (r_sub < r_tile, round 4)
    keeps the VMEM-bound [r_sub, t_blk] one-hot small while the GRID step
    covers r_tile rays — the ~1 us/step sequencing floor amortizes over
    r_tile/r_sub sub-tiles, and the finer bands skip MORE work.
    """
    j = pl.program_id(0)  # segment-tile index (outer)
    i = pl.program_id(1)  # ray-tile index (inner, accumulating)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    S = r_tile // r_sub
    dn = (((1,), (0,)), ((), ()))
    for s in range(S):
        overlaps = jnp.logical_and(
            band_lo_ref[i * S + s] < (j + 1) * t_blk,
            band_hi_ref[i * S + s] >= j * t_blk,
        )

        @pl.when(overlaps)
        def _work(s=s):
            tri = tri_ref[0, s * r_sub:(s + 1) * r_sub]  # [r_sub] i32
            g = g_ref[:, s * r_sub:(s + 1) * r_sub]  # [K, r_sub] f32

            cols = jax.lax.broadcasted_iota(jnp.int32, (r_sub, t_blk), 1)
            onehot = (tri[:, None] == cols + j * t_blk).astype(jnp.bfloat16)

            g_hi = g.astype(jnp.bfloat16)
            g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                g_hi, onehot, dn, preferred_element_type=jnp.float32
            )
            acc += jax.lax.dot_general(
                g_lo, onehot, dn, preferred_element_type=jnp.float32
            )
            out_ref[...] += acc


def _pallas_available() -> bool:
    """Whether the Mosaic kernel can lower on this backend.  Kernel parity
    tests monkeypatch this to True together with interpret=True."""
    return jax.default_backend() in ("tpu", "axon")


def _segment_accumulate_xla(tri, g, num_segments: int) -> jnp.ndarray:
    """Pure-XLA one-hot-matmul segment-sum, used off-TPU (e.g. when
    CRT_SEGSUM=matmul is forced on the CPU test mesh): same math as the
    Pallas kernel but f32 HIGHEST (exact) and shard_map/vma-transparent —
    the Pallas HLO interpreter cannot eval kernels whose operands carry
    varying manual axes.  Materializes the [R, T] one-hot: fine at test
    scale, which is the only place this path runs."""
    cols = jnp.arange(num_segments, dtype=jnp.int32)
    onehot = (tri[:, None] == cols[None, :]).astype(jnp.float32)  # [R, T]
    return jax.lax.dot_general(
        g.astype(jnp.float32),
        onehot,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def segment_accumulate_matmul(
    tri: jnp.ndarray,  # [R] i32 segment ids, -1 (or any out-of-range) = skip
    g: jnp.ndarray,  # [K, R] f32 cotangents
    num_segments: int,
    r_tile: int = R_TILE,
    r_sub: int | None = None,
) -> jnp.ndarray:
    """MXU segment-sum: returns [K, num_segments] f32.

    ``r_tile`` sets the rays-per-GRID-step; ``r_sub`` (default R_SUB) the
    rays per in-kernel sub-tile: each grid step statically unrolls
    r_tile/r_sub band-gated one-hot matmuls, so the ~1 us/step grid
    sequencing floor amortizes while the [r_sub, T_BLK] one-hot stays
    within VMEM and the finer sub-bands skip more work (round-4 sweep
    winner, shipped as the defaults: r_tile=8192 / r_sub=1024 — fwd+bwd
    28.35 -> 27.95 ms on 14-01 vs the prior 4096/4096).
    """
    if not _pallas_available():
        return _segment_accumulate_xla(
            tri.astype(jnp.int32), g, num_segments
        )
    K, R = g.shape
    r_sub = r_sub or min(R_SUB, r_tile)
    assert r_tile % r_sub == 0
    t_pad = max(-(-num_segments // T_BLK) * T_BLK, T_BLK)
    r_pad = (-R) % r_tile
    if r_pad:
        tri = jnp.concatenate([tri, jnp.full((r_pad,), -1, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((K, r_pad), g.dtype)], axis=1)
    steps_r = (R + r_pad) // r_tile
    steps_t = t_pad // T_BLK

    tri = tri.astype(jnp.int32)
    tiles = tri.reshape(-1, r_sub)  # [steps_r * (r_tile // r_sub), r_sub]
    live = tiles >= 0
    band_lo = jnp.where(live, tiles, jnp.int32(2**30)).min(axis=1)
    band_hi = jnp.where(live, tiles, -1).max(axis=1)

    # Inside shard_map the output varies over whatever mesh axes the ray
    # inputs vary over — the out_shape aval must say so (a bare
    # ShapeDtypeStruct has vma=None, which the manual-axes checker rejects).
    out_vma = _vma_of(tri) | _vma_of(g)
    out = pl.pallas_call(
        functools.partial(_kernel, t_blk=T_BLK, r_tile=r_tile, r_sub=r_sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # band_lo, band_hi
            grid=(steps_t, steps_r),  # ray axis innermost: out block stays
            in_specs=[
                pl.BlockSpec((1, r_tile), lambda j, i, lo, hi: (0, i)),
                pl.BlockSpec((K, r_tile), lambda j, i, lo, hi: (0, i)),
            ],
            out_specs=pl.BlockSpec((K, T_BLK), lambda j, i, lo, hi: (0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (K, t_pad), jnp.float32, vma=out_vma
        ),
    )(band_lo, band_hi, tri[None], g.astype(jnp.float32))
    return out[:, :num_segments]


def segment_accumulate_banded(
    tri, g, num_segments: int, rank: jnp.ndarray, r_tile: int = R_TILE
) -> jnp.ndarray:
    """Segment-sum with Morton-rank remapping: ``rank[t]`` is a permutation
    of segment ids ordering them by spatial (cluster) locality, so each
    pixel-coherent ray tile hits a narrow rank band and the kernel's band
    test skips most grid steps.  Returns [K, num_segments] in ORIGINAL ids.
    """
    ranked = jnp.where(tri >= 0, rank[jnp.maximum(tri, 0)], -1)
    out_ranked = segment_accumulate_matmul(ranked, g, num_segments, r_tile)
    return out_ranked[:, rank]


def use_matmul_segsum(num_segments: int) -> bool:
    import os

    force = os.environ.get("CRT_SEGSUM")  # A/B knob: "matmul" | "scatter"
    if force == "scatter":
        return False
    if force == "matmul":
        return True
    return (
        jax.default_backend() in ("tpu", "axon")
        and num_segments <= MAX_SEGMENTS
    )


@jax.custom_vjp
def _packed_gather(packed: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    return packed[:, tri]


def _pg_fwd(packed, tri):
    return packed[:, tri], (tri, packed.shape[1])


def _pg_bwd(res, g):
    tri, T = res
    if use_matmul_segsum(T) and g.ndim == 2 and tri.ndim == 1:
        grad = segment_accumulate_matmul(tri, g, T)
    else:
        grad = jnp.zeros((g.shape[0], T), g.dtype).at[:, tri].add(g)
    return grad, None


_packed_gather.defvjp(_pg_fwd, _pg_bwd)


def packed_gather(packed: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """``packed[:, tri]`` with a TPU-optimized VJP.

    packed: [K, T]; tri: [R] i32 (callers pass clamped-to-valid ids).
    shard_map-safe: the table is cast to vary over the ray mesh axes so
    the per-device partial gradient type-checks; the cast's transpose is
    the cross-device psum (see _match_varying).
    """
    return _packed_gather(_match_varying(packed, _vma_of(tri)), tri)


@jax.custom_vjp
def _packed_gather_ranked_fused(packed_aug, tri, rank):
    """Like packed_gather_ranked, but the LAST row of ``packed_aug`` is
    ``rank.astype(f32)`` so the per-ray ranked ids ride the one efficient
    multi-row gather.  Motivation (measured, 14-01 scene, 2.07 M rays): a
    standalone ``rank[tri]`` int gather from the [T] table costs ~15 ms —
    XLA lowers the 1-row dynamic gather pathologically — while adding one
    row to the existing [K, T] f32 column gather is free.  Ranks are < 2^24
    so the f32 round-trip is exact.

    Returns the data rows only ([K, R]); the rank row is consumed by the
    VJP (banded segment-matmul in rank space, unpermuted via ``rank``).
    """
    # Gather all K+1 rows, then drop the rank row from the RESULT: slicing
    # the operand first (packed_aug[:-1, idx]) lowers to a gather XLA:TPU
    # executes ~150x slower (measured 5 s vs 30 ms full-frame fwd).
    return packed_aug[:, jnp.maximum(tri, 0)][:-1]


def _pgf_fwd(packed_aug, tri, rank):
    rows_aug = packed_aug[:, jnp.maximum(tri, 0)]
    ranked = jnp.where(tri >= 0, rows_aug[-1].astype(jnp.int32), -1)
    return rows_aug[:-1], (ranked, rank, packed_aug.shape[1])


def _pgf_bwd(res, g):
    ranked, rank, T = res
    if use_matmul_segsum(T) and g.ndim == 2 and ranked.ndim == 1:
        out_ranked = segment_accumulate_matmul(ranked, g, T)
    else:
        # scatter fallback in rank space (miss lanes dropped via the T pad
        # column, then trimmed)
        out_ranked = (
            jnp.zeros((g.shape[0], T + 1), g.dtype)
            .at[:, jnp.where(ranked >= 0, ranked, T)]
            .add(g)[:, :T]
        )
    grad = out_ranked[:, rank]  # rank space -> original segment ids
    grad_aug = jnp.concatenate(
        [grad, jnp.zeros((1, T), grad.dtype)], axis=0
    )
    return grad_aug, None, None


_packed_gather_ranked_fused.defvjp(_pgf_fwd, _pgf_bwd)


def packed_gather_ranked_fused(packed_aug, tri, rank):
    """shard_map-safe wrapper (see packed_gather)."""
    return _packed_gather_ranked_fused(
        _match_varying(packed_aug, _vma_of(tri)), tri, rank
    )


@jax.custom_vjp
def _packed_rows_from_kernel(packed, data, ranked, rank):
    """AD adapter for trace-kernel-emitted packed rows.

    ``data`` [K, R] are the rows the Pallas trace kernel emitted
    (bit-identical to ``packed[:, tri]`` — no XLA gather runs); ``ranked``
    [R] are the kernel's slot indices (== Morton rank, -1 on miss).  The
    primal returns ``data`` untouched; the VJP routes the cotangents into
    ``packed``'s [K, T] layout through the banded segment-matmul, exactly
    like packed_gather_ranked_fused, keeping the gradient path identical
    while the forward skips the ~6 ms 2 M-index gather.
    """
    del packed, ranked, rank
    return data


def _prk_fwd(packed, data, ranked, rank):
    return data, (ranked, rank, packed.shape[1])


def _prk_bwd(res, g):
    ranked, rank, T = res
    if use_matmul_segsum(T) and g.ndim == 2 and ranked.ndim == 1:
        out_ranked = segment_accumulate_matmul(ranked, g, T)
    else:
        out_ranked = (
            jnp.zeros((g.shape[0], T + 1), g.dtype)
            .at[:, jnp.where(ranked >= 0, ranked, T)]
            .add(g)[:, :T]
        )
    return out_ranked[:, rank], None, None, None


_packed_rows_from_kernel.defvjp(_prk_fwd, _prk_bwd)


def packed_rows_from_kernel(packed, data, ranked, rank):
    """shard_map-safe wrapper (see packed_gather)."""
    return _packed_rows_from_kernel(
        _match_varying(packed, _vma_of(data) | _vma_of(ranked)),
        data,
        ranked,
        rank,
    )


@jax.custom_vjp
def _packed_gather_ranked(packed, tri, rank):
    """``packed[:, max(tri, 0)]`` whose VJP uses the banded segment-matmul.

    ``tri`` may carry -1 for miss lanes: the forward clamps them to id 0
    (their outputs are masked downstream and their cotangents are exactly
    zero — asserted by tests/test_segsum.py's end-to-end parity on a
    scene with background pixels), and the backward DROPS them so they
    cannot widen a ray tile's segment band.  ``rank`` is a [T]
    spatial-locality permutation (Morton cluster rank) of the segment
    ids; see segment_accumulate_banded.
    """
    return packed[:, jnp.maximum(tri, 0)]


def _pgr_fwd(packed, tri, rank):
    return packed[:, jnp.maximum(tri, 0)], (tri, rank, packed.shape[1])


def _pgr_bwd(res, g):
    tri, rank, T = res
    if use_matmul_segsum(T) and g.ndim == 2 and tri.ndim == 1:
        grad = segment_accumulate_banded(tri, g, T, rank)
    else:
        grad = jnp.zeros((g.shape[0], T), g.dtype).at[:, tri].add(g)
    return grad, None, None


_packed_gather_ranked.defvjp(_pgr_fwd, _pgr_bwd)


def packed_gather_ranked(packed, tri, rank):
    """shard_map-safe wrapper (see packed_gather)."""
    return _packed_gather_ranked(
        _match_varying(packed, _vma_of(tri)), tri, rank
    )
