"""GI showcase chunk-size sweep (exact tree, 15-01-scene2).

Round-3 measured 2x-finer-than-auto chunking at the OLD lossy bank width
as 1030 -> 716 ms; this sweeps chunk_pixels on the EXACT tree (grow
schedule + inline leaves) at the current baseline.

Usage: python tools/exp_gi_chunk.py [--res N] [chunk values...]
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

SCENE = "/root/reference/scenes/15-01-conclusion/scene2.crtscene"


def main(argv):
    res = 540
    if "--res" in argv:
        i = argv.index("--res")
        res = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    chunks = [int(a) for a in argv if a.isdigit()] or [
        0, 1 << 22, 1 << 21, 1 << 20, 1 << 19, 1 << 18,
    ]
    reps = 3

    base = load_scene(SCENE)
    scene = base.replace(width=res, height=res)

    for ch in chunks:
        settings = RenderSettings(compat_no_shadows=True,
                                  compat_hadamard_y=True,
                                  chunk_pixels=ch)

        def one(eps):
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        def run(eps0):
            def body(i, acc):
                return acc + one(eps0 + 1e-7 * i.astype(jnp.float32))

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
        print(f"chunk={ch}: {best / reps * 1e3:.0f} ms/frame "
              f"(compile {c:.0f}s, sum {s0:.1f})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
