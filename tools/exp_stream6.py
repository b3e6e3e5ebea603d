"""1M-tri frame: supercluster/tile-size sweep UNDER two-phase shadows.

SC_CLUSTERS=16 and tile_rays=512 were measured dead for the single-phase
structure; the two-phase compaction changes the trade (shadow pairs now
dominate differently), so re-sweep at the new baseline.

Usage: python tools/exp_stream6.py [num_tris]
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

from crt_tpu import RenderSettings
from crt_tpu.ops.pallas_stream import make_stream_trace_fn
from crt_tpu.renderer import _render_flat
from crt_tpu.scene.procedural import make_big_scene

N = 3


def bench(name, fn, reps=N):
    def run(eps0):
        def body(i, acc):
            return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    t0 = time.perf_counter()
    s0 = float(jfn(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / reps * 1e3:.1f} ms (compile {c:.0f}s, "
          f"sum {s0 / reps:.2f})", flush=True)


def main(argv):
    num_tris = int(argv[0]) if argv else 1_000_000
    print(f"building {num_tris}-tri scene...", flush=True)
    scene = make_big_scene(num_tris, width=1920, height=1080)

    import crt_tpu.renderer as renderer

    orig = renderer.make_trace_fn

    for sc, tr in ((32, 1024), (16, 1024), (32, 512), (16, 512)):
        def patched(scn, settings, sc=sc, tr=tr):
            return make_stream_trace_fn(scn, sc_clusters=sc, tile_rays=tr)

        renderer.make_trace_fn = patched
        try:
            def frame(eps):
                s = scene.replace(cam_position=scene.cam_position + eps)
                return jnp.sum(_render_flat(
                    s, RenderSettings(backend="pallas_stream")))

            bench(f"frame [SC={sc} TR={tr} K=4]", frame)
        finally:
            renderer.make_trace_fn = orig


if __name__ == "__main__":
    main(sys.argv[1:])
