"""A/B the remat-shading and bench knobs for fwd and fwd+bwd (TPU).

In-graph repetition (fori_loop, perturbed inputs) divides out the relay's
~±10 ms dispatch noise — same methodology as tools/bench_bwd2.py.

Usage: python tools/bench_remat.py [N_passes]
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
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PX = 1920 * 1080


def main():
    scene = load_scene(SCENE)

    def repeat(fn):
        def run(eps0):
            def body(i, acc):
                return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        return jax.jit(run)

    def bench(name, fn):
        jfn = repeat(fn)
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
            f"{name}: {ms:.2f} ms/pass ({PX / ms / 1e3:.1f} Mrays/s)"
            f"  [compile {compile_s:.0f} s]",
            flush=True,
        )

    def fwd(settings):
        def f(eps):
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        return f

    def fwdbwd(settings):
        def loss(vertices, lights, cam, eps):
            s = scene.replace(
                vertices=vertices,
                light_intensity=lights,
                cam_position=cam + eps,
            )
            return jnp.sum(_render_flat(s, settings))

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

        def f(eps):
            v, grads = vg(
                scene.vertices, scene.light_intensity, scene.cam_position,
                eps,
            )
            return v + sum(jnp.sum(g) for g in grads)

        return f

    base = RenderSettings()
    remat = RenderSettings(remat_shading=True)

    bench("fwd       base ", fwd(base))
    bench("fwd+bwd   base ", fwdbwd(base))
    bench("fwd       remat", fwd(remat))
    bench("fwd+bwd   remat", fwdbwd(remat))


if __name__ == "__main__":
    main()
