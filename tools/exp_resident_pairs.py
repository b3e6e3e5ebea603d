"""Resident (14-01) shadow binning: hull pair count vs per-lane exact.

The stream path's lane-exact admission cut 1M-frame pairs 2.33x (round
5).  This measures the same decomposition for the RESIDENT w-kernel's
cluster-level apex binning on the course benchmark scene — if the hull
is already near-exact here, the ~8.6 ms shadow kernel is pair-floor-bound
and the in-kernel lane gate's measured regression (cond overhead >
skippable work) closes the lever.

Usage: python tools/exp_resident_pairs.py [scene.crtscene]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from crt_tpu import RenderSettings, load_scene
from crt_tpu.ops import camera as camera_ops, vecmath
from crt_tpu.ops.pallas_trace import (
    TILE_RAYS, bin_apex_shared, build_cluster_tables,
)
from crt_tpu.ops.pallas_stream import lane_exact_sc_mask
from crt_tpu.ops.shade import hit_attributes
from crt_tpu.renderer import make_tiler, make_trace_fn
from crt_tpu.scene.types import MATERIAL_DIFFUSE


def main(argv):
    path = argv[0] if argv else (
        "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
    )
    scene = load_scene(path)
    settings = RenderSettings()
    trace = make_trace_fn(scene, settings)
    rx, ry, _ = make_tiler(scene.height, scene.width)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        scene.width, scene.height, rx, ry,
    )
    hit = trace(o, d)
    attrs = hit_attributes(scene, o, d, hit)
    is_diffuse = attrs.valid & (attrs.mat_type == MATERIAL_DIFFUSE)
    lp = scene.light_position
    Ll = lp.shape[0]
    lv = lp[:, None, :] - attrs.point[None]
    r2 = jnp.sum(lv * lv, -1)
    ldir = vecmath.safe_normalize(lv)
    act = is_diffuse[None] & (jnp.sum(ldir * attrs.normal[None], -1) > 0)
    shadow_o = attrs.point + attrs.normal * settings.shadow_bias
    slack = 2.0 * settings.shadow_bias

    tables = build_cluster_tables(scene)
    L = tables.n.shape[0]
    R = o.shape[0]
    print(f"tris {scene.num_triangles}, clusters {L}, lanes {Ll}x{R}, "
          f"active {float(act.mean()):.3f}", flush=True)

    _, counts = bin_apex_shared(tables, shadow_o, lp, act, TILE_RAYS, slack)
    hull = int(jnp.sum(counts))
    print(f"hull pairs (shipped apex binning): {hull}", flush=True)

    # per-lane exact over the light-major flat wavefront
    o_flat = jnp.broadcast_to(shadow_o[None], (Ll, R, 3)).reshape(-1, 3)
    d_flat = ldir.reshape(-1, 3)
    m = lane_exact_sc_mask(
        o_flat, d_flat, r2.reshape(-1), act.reshape(-1), slack,
        tables.cl_min, tables.cl_max, TILE_RAYS,
    )
    exact = int(jnp.sum(m))
    print(f"lane-exact pairs:                  {exact}  "
          f"(hull/exact = {hull / max(exact, 1):.2f}x)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
