"""A/B bounce-scene frame times: live-tile compaction for masked traces.

Bounce wavefronts (reflection/refraction/GI) thin out with depth, so most
pixel tiles carry zero live lanes; ``RenderSettings(compact_bounces=True)``
routes masked traces through the live-tile compacted Pallas launch.  This
measures whether the skipped grid steps beat the added compaction overhead
on the course bounce scenes (in-graph repetition, same methodology as
tools/bench_remat.py).

Usage: python tools/bench_bounce.py [N_passes] [scene filters...]
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

from crt_tpu import RenderSettings, load_scene
from crt_tpu.renderer import _render_flat

SCENES = {
    "09-03-scene5": "/root/reference/scenes/09-03-reflective/scene5.crtscene",
    "11-01-scene8": "/root/reference/scenes/11-01-refractive/scene8.crtscene",
}

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
FILTERS = sys.argv[2:]


def bench(name, scene, settings):
    px = scene.width * scene.height

    def f(eps):
        s = scene.replace(cam_position=scene.cam_position + eps)
        return jnp.sum(_render_flat(s, settings))

    def run(eps0):
        def body(i, acc):
            return acc + f(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(0.0)))  # compile
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    ms = best / N * 1e3
    print(
        f"{name}: {ms:.1f} ms/frame ({px / ms / 1e3:.1f} Mrays/s primary)"
        f"  [compile {compile_s:.0f} s]",
        flush=True,
    )


def main():
    for tag, path in SCENES.items():
        if FILTERS and not any(f in tag for f in FILTERS):
            continue
        scene = load_scene(path)
        bench(f"{tag}  base   ", scene, RenderSettings())
        bench(f"{tag}  compact", scene, RenderSettings(compact_bounces=True))


if __name__ == "__main__":
    main()
