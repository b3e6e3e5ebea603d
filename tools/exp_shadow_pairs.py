"""Phase-2 shadow pair-count decomposition: is the 1M-tri floor real?

The two-phase floor analysis (docs/PERFORMANCE.md round 4) pinned the
remaining ~1.4 s of the 1M-tri frame on the LIT survivors' full-shaft
proof: ~212k (tile, supercluster) pairs at ~6.8 us/pair.  Those pairs are
admitted by the per-TILE apex hull — but phase-2 tiles hold COMPACTED
survivors from scattered pixels, so the hull can overshoot the union of
the lanes' actual segments.  This measures how many pairs each admission
rule keeps on the real phase-2 wavefront:

  hull         — the shipped per-tile shaft+cone+wedge (bin_pairs)
  sub=N        — union of N sub-shafts per tile (tighter hulls, cheap)
  lane-exact   — a pair survives iff SOME active lane's [origin, light]
                 segment (slack-inflated) hits the supercluster box: the
                 irreducible pair count for this decomposition

If lane-exact ~= hull, the floor is real (dossier entry, done).  A big
gap at some sub=N says sub-shaft unions buy that fraction of the 1.4 s.

Usage: python tools/exp_shadow_pairs.py [num_tris] [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops import pallas_stream as ps
from crt_tpu.ops import vecmath
from crt_tpu.ops.pallas_trace import (
    TILE_RAYS,
    _apex_cone_mask,
    _apex_wedge_mask,
    _frustum_box_mask,
    build_cluster_tables,
)
from crt_tpu.renderer import make_tiler, make_trace_fn
from crt_tpu.scene.procedural import make_big_scene
from crt_tpu import RenderSettings

INF = jnp.float32(3.4e38)


def apex_mask_sub(o_flat, act_flat, apex, slack, sc_min, sc_max, sub):
    """bin_pairs' apex admission with ``sub`` sub-shafts per tile."""
    N = o_flat.shape[0]
    tiles = N // TILE_RAYS
    o = o_flat.reshape(tiles * sub, TILE_RAYS // sub, 3)
    a = act_flat.reshape(tiles * sub, TILE_RAYS // sub, 1)
    o_lo = jnp.where(a, o, INF).min(axis=1)
    o_hi = jnp.where(a, o, -INF).max(axis=1)
    apex_sub = jnp.repeat(apex, sub, axis=0)
    s = jnp.float32(slack)
    w_lo = (o_lo - s) - apex_sub
    w_hi = (o_hi + s) - apex_sub
    mask = _frustum_box_mask(
        apex_sub, apex_sub, w_lo, w_hi,
        sc_min - 2.0 * s, sc_max + 2.0 * s,
        t_cap=jnp.float32(1.0 + 1e-4),
    )
    mask = mask & _apex_cone_mask(apex_sub, w_lo, w_hi, sc_min, sc_max, s)
    mask = mask & _apex_wedge_mask(apex_sub, w_lo, w_hi, sc_min, sc_max, s)
    mask = mask & jnp.any(a[..., 0], axis=1)[:, None]
    return mask.reshape(tiles, sub, -1).any(axis=1)


def lane_exact_mask(o_flat, d_flat, r2_flat, act_flat, slack, sc_min, sc_max,
                    tile_chunk=32):
    """[tiles, L2] — pair survives iff some active lane's segment hits."""
    N = o_flat.shape[0]
    tiles = N // TILE_RAYS
    L2 = sc_min.shape[0]
    s = jnp.float32(slack)
    bmin = sc_min - 2.0 * s
    bmax = sc_max + 2.0 * s
    tmax_all = jnp.sqrt(jnp.maximum(r2_flat, 0.0)) * (1.0 + 1e-4) + 2.0 * s

    oc = o_flat.reshape(tiles, TILE_RAYS, 3)
    dc = d_flat.reshape(tiles, TILE_RAYS, 3)
    ac = act_flat.reshape(tiles, TILE_RAYS)
    tm = tmax_all.reshape(tiles, TILE_RAYS)

    @jax.jit
    def chunk_mask(o, d, a, t_max):
        # o,d [TC*TR, 3]; returns [TC, L2]
        small = jnp.abs(d) < 1e-12
        dsafe = jnp.where(small, 1.0, d)
        t1 = (bmin[None] - o[:, None]) / dsafe[:, None]  # [N, L2, 3]
        t2 = (bmax[None] - o[:, None]) / dsafe[:, None]
        tlo = jnp.minimum(t1, t2)
        thi = jnp.maximum(t1, t2)
        inside = (o[:, None] >= bmin[None]) & (o[:, None] <= bmax[None])
        sm = small[:, None]
        tlo = jnp.where(sm & inside, -INF, jnp.where(sm & ~inside, INF, tlo))
        thi = jnp.where(sm & inside, INF, jnp.where(sm & ~inside, -INF, thi))
        ent = tlo.max(-1)
        ext = thi.min(-1)
        hit = (ent <= ext) & (ext >= 0.0) & (ent <= t_max[:, None])
        hit = hit & a[:, None]
        TC = o.shape[0] // TILE_RAYS
        return hit.reshape(TC, TILE_RAYS, L2).any(axis=1)

    outs = []
    for t0 in range(0, tiles, tile_chunk):
        tc = min(tile_chunk, tiles - t0)
        outs.append(chunk_mask(
            oc[t0:t0 + tc].reshape(-1, 3), dc[t0:t0 + tc].reshape(-1, 3),
            ac[t0:t0 + tc].reshape(-1), tm[t0:t0 + tc].reshape(-1),
        ))
    return jnp.concatenate(outs, axis=0)


def main(argv):
    num_tris = int(argv[0]) if argv else 1_000_000
    K = int(argv[1]) if len(argv) > 1 else 2
    print(f"building {num_tris}-tri scene...", flush=True)
    scene = make_big_scene(num_tris, width=1920, height=1080)
    h, w = scene.height, scene.width
    rx, ry, _ = make_tiler(h, w)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )
    trace = make_trace_fn(scene, RenderSettings(backend="pallas_stream"))
    hit = trace(o, d)
    t = jax.lax.stop_gradient(hit.t)
    valid = hit.tri >= 0
    point = o + d * jnp.where(valid, t, 0.0)[:, None]

    lp = scene.light_position
    Ll = lp.shape[0]
    R = point.shape[0]
    lv = lp[:, None, :] - point[None]
    r2 = jnp.sum(lv * lv, -1)
    ldir = vecmath.safe_normalize(lv)
    verts = scene.vertices
    tv = scene.tri_vidx[jnp.maximum(hit.tri, 0)]
    fn = vecmath.safe_normalize(vecmath.cross(
        verts[tv[:, 1]] - verts[tv[:, 0]], verts[tv[:, 2]] - verts[tv[:, 0]]
    ))
    act = valid[None] & (jnp.sum(ldir * fn[None], -1) > 0.0)

    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene)
    )
    tables = jax.tree.map(jax.lax.stop_gradient, tables)
    shadow_o = point + fn * 1e-2
    o_flat = jnp.broadcast_to(shadow_o[None], (Ll, R, 3)).reshape(-1, 3)
    apex = jnp.repeat(lp, R // TILE_RAYS, axis=0)
    slack = 2e-2

    occ1 = ps.occluded_stream_flat(
        tables, sc_min, sc_max, o_flat, ldir.reshape(-1, 3),
        r2.reshape(-1), act.reshape(-1), apex, jnp.float32(slack),
        per_tile_cap=K,
    ).reshape(Ll, R)
    surv = act & jnp.logical_not(occ1)
    perm = jnp.argsort(jnp.logical_not(surv), axis=1, stable=True)
    o2 = jnp.take_along_axis(
        jnp.broadcast_to(shadow_o[None], (Ll, R, 3)), perm[..., None], axis=1
    ).reshape(-1, 3)
    d2 = jnp.take_along_axis(ldir, perm[..., None], axis=1).reshape(-1, 3)
    r2_2 = jnp.take_along_axis(r2, perm, axis=1).reshape(-1)
    a2 = jnp.take_along_axis(surv, perm, axis=1).reshape(-1)
    print(f"K={K}: survivors {float(surv.sum()):.0f} "
          f"({float(surv.sum() / jnp.maximum(act.sum(), 1)):.3f} of active)",
          flush=True)

    _, _, _, hull_total = ps.bin_pairs(
        sc_min, sc_max, o2, d2,
        (Ll * R // TILE_RAYS) * sc_min.shape[0], TILE_RAYS, a2,
        apex=apex, apex_slack=jnp.float32(slack), near_first=True,
    )
    print(f"phase-2 pairs, shipped hull: {int(hull_total)}", flush=True)

    for sub in (4, 16, 32):
        m = apex_mask_sub(o2, a2, apex, slack, sc_min, sc_max, sub)
        print(f"phase-2 pairs, sub={sub:3d} union: {int(m.sum())}",
              flush=True)

    m = lane_exact_mask(o2, d2, r2_2, a2, slack, sc_min, sc_max)
    print(f"phase-2 pairs, LANE-EXACT:    {int(m.sum())}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
