"""Primary trace tile-size sweep (TPU): TR in {1024, 2048, 4096}.

The dense primary wavefront pays per-grid-step fixed cost on ~2k steps;
bigger tiles halve/quarter the steps if the 64x32 / 64x64 pixel-block
frustums stay tight (cluster pairs grow sublinearly).  Shadow TR>1024 was
measured dead (looser shafts); this sweeps the PRIMARY + full frame with
the shadow tile pinned at 1024 via shadow_tile_rays.

Usage: python tools/exp_tile_rays.py
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

import crt_tpu.renderer as renderer
import crt_tpu.ops.pallas_trace as pt
from crt_tpu import RenderSettings, load_scene

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
N = 8


def bench(name, fn):
    def run(eps0):
        def body(i, acc):
            return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    float(jfn(jnp.float32(0.0)))
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / N * 1e3:.2f} ms/pass", flush=True)


def main():
    scene = load_scene(SCENE)

    for tr, th, tw in [(1024, 32, 32), (2048, 32, 64), (4096, 64, 64)]:
        pt.TILE_RAYS = tr
        renderer.TILE_H, renderer.TILE_W = th, tw
        settings = RenderSettings(shadow_tile_rays=1024)

        def frame(eps, s=scene, st=settings):
            sc = s.replace(cam_position=s.cam_position + eps)
            return jnp.sum(renderer._render_flat(sc, st))

        bench(f"fwd frame TR={tr} ({th}x{tw}), shadow TR=1024", frame)

        def fb(eps, s=scene, st=settings):
            def loss(v, e):
                sc = s.replace(vertices=v, cam_position=s.cam_position + e)
                return jnp.sum(renderer._render_flat(sc, st))

            val, g = jax.value_and_grad(loss)(s.vertices, eps)
            return val + jnp.sum(g)

        bench(f"fwd+bwd TR={tr} ({th}x{tw}), shadow TR=1024", fb)


if __name__ == "__main__":
    main()
