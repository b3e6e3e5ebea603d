"""1M-tri shadow-phase statistics: how much does phase 1 resolve, and
what bounds the two-phase floor?

Reports, for the benchmark shadow wavefront: active-lane fraction,
phase-1 blocked fraction (K sweep), final blocked fraction (= the LIT
fraction that must pay a full-shaft proof), and live pair counts for
each phase — the quantities that decide whether a third phase or more
culling could reach <= 2.0 s (docs/PERFORMANCE.md round 4).

Usage: python tools/exp_stream7.py [num_tris]
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
from crt_tpu.ops.pallas_trace import TILE_RAYS, build_cluster_tables
from crt_tpu.renderer import make_tiler, make_trace_fn
from crt_tpu.scene.procedural import make_big_scene
from crt_tpu import RenderSettings


def main(argv):
    num_tris = int(argv[0]) if argv else 1_000_000
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

    # reproduce the shadow wavefront the shade path builds
    lp = scene.light_position
    Ll = lp.shape[0]
    R = point.shape[0]
    lv = lp[:, None, :] - point[None]
    r2 = jnp.sum(lv * lv, -1)
    ldir = vecmath.safe_normalize(lv)
    # facing cull needs the shading normal; use the geometric face normal
    verts = scene.vertices
    tv = scene.tri_vidx[jnp.maximum(hit.tri, 0)]
    fn = vecmath.safe_normalize(vecmath.cross(
        verts[tv[:, 1]] - verts[tv[:, 0]], verts[tv[:, 2]] - verts[tv[:, 0]]
    ))
    act = valid[None] & (jnp.sum(ldir * fn[None], -1) > 0.0)
    print(f"lanes {Ll}x{R}, active {float(act.mean()):.3f}", flush=True)

    tables, sc_min, sc_max = ps.build_supercluster_boxes(
        build_cluster_tables(scene)
    )
    tables = jax.tree.map(jax.lax.stop_gradient, tables)
    shadow_o = point + fn * 1e-2
    o_flat = jnp.broadcast_to(shadow_o[None], (Ll, R, 3)).reshape(-1, 3)
    apex = jnp.repeat(lp, R // TILE_RAYS, axis=0)

    for k in (2, 4, 8, 16, None):
        occ = ps.occluded_stream_flat(
            tables, sc_min, sc_max, o_flat, ldir.reshape(-1, 3),
            r2.reshape(-1), act.reshape(-1), apex, jnp.float32(2e-2),
            per_tile_cap=k,
        ).reshape(Ll, R)
        blocked = float(jnp.sum(occ & act) / jnp.maximum(jnp.sum(act), 1))
        print(f"K={k}: blocked {blocked:.4f} of active", flush=True)

    # pair volumes per phase (K=4)
    bounds = None
    _, _, pv, total1 = ps.bin_pairs(
        sc_min, sc_max, o_flat, ldir.reshape(-1, 3),
        (Ll * R // TILE_RAYS) * sc_min.shape[0], TILE_RAYS,
        act.reshape(-1), apex=apex, apex_slack=jnp.float32(2e-2),
        near_first=True, per_tile_cap=4,
    )
    occ1 = ps.occluded_stream_flat(
        tables, sc_min, sc_max, o_flat, ldir.reshape(-1, 3),
        r2.reshape(-1), act.reshape(-1), apex, jnp.float32(2e-2),
        per_tile_cap=4,
    ).reshape(Ll, R)
    surv = act & jnp.logical_not(occ1)
    perm = jnp.argsort(jnp.logical_not(surv), axis=1, stable=True)
    o2 = jnp.take_along_axis(
        jnp.broadcast_to(shadow_o[None], (Ll, R, 3)), perm[..., None], axis=1
    )
    d2 = jnp.take_along_axis(ldir, perm[..., None], axis=1)
    a2 = jnp.take_along_axis(surv, perm, axis=1)
    _, _, _, total2 = ps.bin_pairs(
        sc_min, sc_max, o2.reshape(-1, 3), d2.reshape(-1, 3),
        (Ll * R // TILE_RAYS) * sc_min.shape[0], TILE_RAYS,
        a2.reshape(-1), apex=apex, apex_slack=jnp.float32(2e-2),
        near_first=True,
    )
    print(f"phase-1 pairs {int(total1)}, phase-2 pairs {int(total2)}, "
          f"survivors {float(surv.sum() / jnp.maximum(act.sum(), 1)):.4f}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
