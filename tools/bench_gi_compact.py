"""A/B compact_bounces on the 15-01 GI showcase scene (TPU).

Live-tile compaction was a wash on the reflective scene (09-03: bounce
wavefronts stay ~full-width), but GI banks carry per-sample active masks
that thin out with depth — this measures whether the GI showcase profits.

Usage: python tools/bench_gi_compact.py [scene] [N_passes]
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


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else SCENE
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    scene = load_scene(scene_path)

    def bench(compact):
        settings = RenderSettings(compact_bounces=compact)

        def fwd(eps):
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        def run(eps0):
            def body(i, acc):
                return acc + fwd(eps0 + 1e-7 * i.astype(jnp.float32))

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        jfn = jax.jit(run)
        t0 = time.perf_counter()
        float(jfn(jnp.float32(0.0)))  # compile + first run
        print(f"compact_bounces={compact}: compile+first "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(jfn(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        print(f"compact_bounces={compact}: {best / N * 1e3:.1f} ms/frame",
              flush=True)

    bench(False)
    bench(True)


if __name__ == "__main__":
    main()
