"""1M-tri frame attribution: primary trace / shadow / shading + SC sweep.

Usage: python tools/exp_stream3.py [num_tris]
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

    for sc in (32, 16):
        trace = make_stream_trace_fn(scene, sc_clusters=sc)

        def primary(eps, trace=trace):
            hit = trace(origins + eps, dirs)
            return jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))

        bench(f"primary stream trace SC={sc}", primary)

    def frame(eps):
        s = scene.replace(cam_position=scene.cam_position + eps)
        return jnp.sum(_render_flat(s, RenderSettings()))

    bench("full frame (SC=32, apex shadows)", frame)

    def frame_nosh(eps):
        s = scene.replace(cam_position=scene.cam_position + eps)
        return jnp.sum(_render_flat(
            s, RenderSettings(compat_no_shadows=True)))

    bench("frame no_shadows", frame_nosh)


if __name__ == "__main__":
    main(sys.argv[1:])
