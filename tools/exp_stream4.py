"""Streamed-table LAYOUT sweep on the 1M-tri scene (round-4 verdict #2).

Measures the three CRT_STREAM_LAYOUT variants (rows / fused / lane — see
crt_tpu.ops.pallas_stream) on the primary stream trace, the shadow-heavy
full frame, and checks cross-layout hit parity on device.

Usage: python tools/exp_stream4.py [num_tris] [layouts...]
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
from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.pallas_stream import make_stream_trace_fn
from crt_tpu.renderer import _render_flat, make_tiler
from crt_tpu.scene.procedural import make_big_scene

N = 4


def bench(name, fn, reps=N):
    def run(eps0):
        def body(i, acc):
            return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / reps * 1e3:.1f} ms (compile {c:.0f}s)",
          flush=True)
    return best / reps


def main(argv):
    num_tris = int(argv[0]) if argv and argv[0].isdigit() else 1_000_000
    layouts = [a for a in argv if not a.isdigit()] or ["rows", "fused",
                                                       "lane"]
    print(f"building {num_tris}-tri scene...", flush=True)
    scene = make_big_scene(num_tris, width=1920, height=1080)
    h, w = scene.height, scene.width
    rx, ry, _ = make_tiler(h, w)
    origins, dirs = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )

    sums = {}
    for layout in layouts:
        trace = make_stream_trace_fn(scene, layout=layout)

        def primary(eps, trace=trace):
            hit = trace(origins + eps, dirs)
            return jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))

        bench(f"primary [{layout}]", primary)
        # device-side parity probe at eps=0 (layouts are pure layout)
        sums[layout] = float(jax.jit(primary)(jnp.float32(0.0)))

        def frame(eps, layout=layout):
            os.environ["CRT_STREAM_LAYOUT"] = layout
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(
                s, RenderSettings(backend="pallas_stream")))

        os.environ["CRT_STREAM_LAYOUT"] = layout
        bench(f"full frame [{layout}]", frame)

    print("parity sums:", sums, flush=True)
    vals = list(sums.values())
    assert all(v == vals[0] for v in vals), "LAYOUT PARITY MISMATCH"
    print("parity ok", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
