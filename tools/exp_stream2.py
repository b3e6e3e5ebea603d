"""Corrected (overflow-free) pallas_stream: parity + 1M-tri frame time.

1. Pixel parity stream-vs-tree at 320x180 (the old fixed 32k pairs_cap
   silently dropped geometry — this check would have caught it).
2. In-graph 1920x1080 frame time with the exact-capacity multi-launch.

Usage: python tools/exp_stream2.py [num_tris]
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
from crt_tpu.renderer import _render_flat, render_image
from crt_tpu.scene.procedural import make_big_scene

N = 4


def main(argv):
    num_tris = int(argv[0]) if argv else 1_000_000
    print(f"building {num_tris}-tri scene...", flush=True)
    scene = make_big_scene(num_tris, width=1920, height=1080)

    # --- full-res frame times ----------------------------------------------
    def bench(name, settings):
        def frame(eps):
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        def run(eps0):
            def body(i, acc):
                return acc + frame(eps0 + 1e-7 * i.astype(jnp.float32))

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
        print(f"{name}: {best / N * 1e3:.1f} ms/frame (compile {c:.0f}s)",
              flush=True)

    bench("1080p stream (exact cap, multi-launch)",
          RenderSettings(backend="pallas_stream"))

    # --- parity vs tree on a smaller >VMEM scene (tree at 1M tris crashes
    # the worker; 250k is beyond the resident kernel's VMEM switch) -------
    if "--no-parity" not in argv:
        sc2 = make_big_scene(250_000, width=256, height=128)
        a = np.asarray(render_image(
            sc2, RenderSettings(backend="pallas_stream")))
        b = np.asarray(render_image(sc2, RenderSettings(backend="tree")))
        diff = np.abs(a - b)
        frac = (diff.max(-1) <= 1e-5).mean()
        print(f"stream-vs-tree parity 250k@256x128: {frac * 100:.4f}% "
              f"(max|d|={diff.max():.2e})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
