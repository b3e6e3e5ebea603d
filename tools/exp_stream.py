"""pallas_stream attribution on the 1M-triangle scene (TPU).

Reports live pair count, tier, member-cluster survival, and in-graph
frame times for SC_CLUSTERS variants and pairs_cap tiers.

Usage: python tools/exp_stream.py [num_tris]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from crt_tpu import RenderSettings
from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.pallas_stream import (
    bin_pairs,
    build_supercluster_boxes,
    make_stream_trace_fn,
)
from crt_tpu.ops.pallas_trace import TILE_RAYS, build_cluster_tables
from crt_tpu.renderer import _render_flat, make_tiler
from crt_tpu.scene.procedural import make_big_scene

N = 4


def bench(name, fn):
    def run(eps0):
        def body(i, acc):
            return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / N * 1e3:.1f} ms/pass (compile {c:.0f}s)",
          flush=True)


def main(argv):
    num_tris = int(argv[0]) if argv else 1_000_000
    print(f"building {num_tris}-tri scene...", flush=True)
    scene = make_big_scene(num_tris, width=1920, height=1080)

    h, w = scene.height, scene.width
    rx, ry, _ = make_tiler(h, w)
    origins, dirs = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )

    # --- pair stats at SC_CLUSTERS in {32, 16} ---------------------------
    for sc in (32, 16):
        tables = build_cluster_tables(scene)
        tables, sc_min, sc_max = build_supercluster_boxes(tables, sc)

        @jax.jit
        def stats():
            from crt_tpu.ops.pallas_stream import _member_runs, _tile_bounds

            pt_, ps_, pv_, total = bin_pairs(
                sc_min, sc_max, origins, dirs, 65536, TILE_RAYS, None,
            )
            bounds = _tile_bounds(origins, dirs, TILE_RAYS, None)
            pop, _ = _member_runs(
                bounds, pt_, ps_, tables.cl_min, tables.cl_max, sc
            )
            live = pv_ > 0
            return total, jnp.sum(jnp.where(live, pop, 0)), jnp.sum(live)

        total, live_members, live_pairs = map(int, stats())
        print(f"SC={sc}: pairs={total} live member-clusters={live_members} "
              f"(avg {live_members / max(live_pairs, 1):.1f}/{sc} per pair)",
              flush=True)

    # --- frame times ------------------------------------------------------
    for sc, cap in ((32, 32768), (16, 65536), (16, 32768)):
        trace = make_stream_trace_fn(scene, pairs_cap=cap, sc_clusters=sc)

        def frame(eps, trace=trace):
            hit = trace(origins + eps, dirs)
            return jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))

        bench(f"stream trace SC={sc} cap={cap}", frame)

    def full(eps):
        s = scene.replace(cam_position=scene.cam_position + eps)
        return jnp.sum(_render_flat(s, RenderSettings()))

    bench("full frame (auto backend)", full)


if __name__ == "__main__":
    main(sys.argv[1:])
