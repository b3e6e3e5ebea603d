"""Large-scene intersection bench: HBM-streaming kernel vs tree walk (TPU).

VERDICT r1 item 7 criterion: a ~1M-triangle procedural scene must render
>= 10x faster through the two-level streaming Pallas path than through the
while_loop tree walk (the old >VMEM fallback).

Usage: python tools/bench_bigscene.py [num_tris] [backends...]
Defaults: 1000000 pallas_stream tree
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


def timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def main(argv):
    num_tris = int(argv[0]) if argv else 1_000_000
    backends = argv[1:] or ["pallas_stream", "tree"]

    print(f"building {num_tris}-triangle scene...", flush=True)
    t0 = time.perf_counter()
    scene = make_big_scene(num_tris, width=1920, height=1080)
    print(f"built in {time.perf_counter() - t0:.1f}s "
          f"(accel nodes: {scene.accel.num_nodes})", flush=True)

    null = jax.jit(lambda eps: jnp.sum(eps))
    float(null(jnp.zeros(3)))
    overhead = min(
        timed(lambda e: float(null(e)), jnp.asarray([0.0, 0.0, 1e-6 * i]))
        for i in range(5)
    )
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    px = scene.width * scene.height
    results = {}
    for backend in backends:
        settings = RenderSettings(backend=backend)
        fn = jax.jit(
            lambda s, eps, st=settings: jnp.sum(
                _render_flat(
                    s.replace(cam_position=s.cam_position + eps), st
                )
            )
        )
        print(f"[{backend}] compiling...", flush=True)
        t0 = time.perf_counter()
        float(fn(scene, jnp.zeros(3)))
        print(f"[{backend}] compile+first run {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = float("inf")
        for i in range(5):
            eps = jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)], jnp.float32)
            best = min(best, timed(lambda: float(fn(scene, eps))))
        best = max(best - overhead, 1e-9)
        results[backend] = best
        print(f"[{backend}] frame {best*1e3:.1f} ms "
              f"({px / best / 1e6:.1f} Mrays/s primary)", flush=True)

    if "pallas_stream" in results and "tree" in results:
        ratio = results["tree"] / results["pallas_stream"]
        print(f"\nstream vs tree speedup: {ratio:.1f}x", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
