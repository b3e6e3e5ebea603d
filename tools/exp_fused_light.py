"""A/B the fused direct-lighting VJP on the headline 14-01 workload (TPU).

Same in-graph repetition methodology as bench.py (N passes inside one jit,
perturbed inputs, scalar readback).  Measures fwd and fwd+bwd with
fused_light_vjp on/off.

Usage: python tools/exp_fused_light.py
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
REPS = 4


def main():
    scene = load_scene(SCENE)

    def repeat(fn):
        def run(eps0):
            def body(i, acc):
                return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        return jax.jit(run)

    def best_ms(fn):
        jfn = repeat(fn)
        float(jfn(jnp.float32(0.0)))
        best = float("inf")
        for i in range(REPS):
            t0 = time.perf_counter()
            float(jfn(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        return best / N * 1e3

    for fused in (True, False):
        settings = RenderSettings(fused_light_vjp=fused)

        def fwd(eps):
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        def loss(vertices, lights, cam, eps):
            s = scene.replace(
                vertices=vertices, light_intensity=lights,
                cam_position=cam + eps,
            )
            return jnp.sum(_render_flat(s, settings))

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

        def fwdbwd(eps):
            v, grads = vg(
                scene.vertices, scene.light_intensity, scene.cam_position,
                eps,
            )
            return v + sum(jnp.sum(g) for g in grads)

        ms_f = best_ms(fwd)
        ms_b = best_ms(fwdbwd)
        rays = scene.width * scene.height
        print(
            f"fused={fused}: fwd {ms_f:.2f} ms ({rays / ms_f / 1e3:.1f} "
            f"Mrays/s), fwd+bwd {ms_b:.2f} ms ({rays / ms_b / 1e3:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
