"""1M-tri frame: two-phase shadow sweep (CRT_STREAM_SHADOW_K) + parity.

Usage: python tools/exp_stream5.py [num_tris] [k values...]
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
    nums = [a for a in argv if a.isdigit()]
    num_tris = int(nums[0]) if nums else 1_000_000
    ks = [int(a) for a in nums[1:]] or [0, 4, 8, 16]
    print(f"building {num_tris}-tri scene...", flush=True)
    scene = make_big_scene(num_tris, width=1920, height=1080)
    settings = RenderSettings(backend="pallas_stream")

    for k in ks:
        os.environ["CRT_STREAM_SHADOW_K"] = str(k)

        def frame(eps, k=k):
            os.environ["CRT_STREAM_SHADOW_K"] = str(k)
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        bench(f"frame [K={k}]", frame)


if __name__ == "__main__":
    main(sys.argv[1:])
