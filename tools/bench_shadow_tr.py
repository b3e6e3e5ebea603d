"""A/B the shadow-trace tile size (RenderSettings.shadow_tile_rays) on TPU.

The apex-binned shadow path runs under the live-tile compacted launch, so
dead tiles are nearly free — smaller shadow tiles tighten the shaft
frustums (fewer clusters per live tile) at the cost of more grid steps and
narrower VPU bursts.  TR=1024 was tuned for the DENSE primary trace; this
measures whether the sparse shadow wavefront (85 % dead tiles on 14-01)
prefers something smaller.

In-graph repetition timing (see bench.py methodology).

Usage: python tools/bench_shadow_tr.py [tile sizes...]   (default 0 512 256;
0 = the primary TILE_RAYS, i.e. today's behavior)
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

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
N = 8


def main():
    trs = [int(a) for a in sys.argv[1:]] or [0, 512, 256]
    scene = load_scene(SCENE)

    def bench(tr):
        settings = RenderSettings(shadow_tile_rays=tr)

        def fwd(eps):
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        def run(eps0):
            def body(i, acc):
                return acc + fwd(eps0 + 1e-7 * i.astype(jnp.float32))

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        jfn = jax.jit(run)
        float(jfn(jnp.float32(0.0)))  # compile
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            float(jfn(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        print(f"shadow_tile_rays={tr or 'default'}: "
              f"{best / N * 1e3:.2f} ms/frame", flush=True)

    for tr in trs:
        bench(tr)


if __name__ == "__main__":
    main()
