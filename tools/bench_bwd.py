"""Backward-pass attribution bench (TPU): segsum kernel A/B + fwd/bwd split.

Times, with the relay-safe perturb-and-readback method:
  1. the segment-matmul VJP kernel alone vs the XLA scatter-add it replaces
  2. forward render
  3. forward+backward with the kernel and with the scatter

Usage: python tools/bench_bwd.py
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

from crt_tpu import RenderSettings, load_scene
from crt_tpu.ops import pallas_segsum as ps
from crt_tpu.renderer import _render_flat

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"


def timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def best_of(fn, make_args, reps=5, overhead=0.0):
    vals = []
    for i in range(reps):
        vals.append(timed(fn, *make_args(i)))
    return max(min(vals) - overhead, 0.0)


def main():
    scene = load_scene(SCENE)
    R = 1920 * 1088  # padded frame rays
    T = scene.num_triangles
    K = 9
    print(f"scene: T={T} R={R}", flush=True)

    null = jax.jit(lambda eps: jnp.sum(eps))
    float(null(jnp.zeros(3)))
    overhead = min(
        timed(lambda e: float(null(e)), jnp.asarray([0.0, 0.0, 1e-6 * i]))
        for i in range(5)
    )
    print(f"dispatch overhead: {overhead*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    tri = jnp.asarray(rng.integers(0, T, size=R).astype(np.int32))
    g0 = jnp.asarray(rng.normal(size=(K, R)).astype(np.float32))

    mm = jax.jit(
        lambda g: jnp.sum(ps.segment_accumulate_matmul(tri, g, T))
    )
    sc = jax.jit(
        lambda g: jnp.sum(
            jnp.zeros((K, T), jnp.float32).at[:, tri].add(g)
        )
    )
    for name, fn in [("segsum matmul kernel", mm), ("segsum XLA scatter", sc)]:
        float(fn(g0))
        t = best_of(
            lambda g: float(fn(g)),
            lambda i: (g0 + jnp.float32(1e-6 * i),),
            overhead=overhead,
        )
        print(f"{name}: {t*1e3:.2f} ms", flush=True)

    settings = RenderSettings()
    fwd = jax.jit(
        lambda s, eps: jnp.sum(
            _render_flat(s.replace(cam_position=s.cam_position + eps), settings)
        )
    )

    def loss(vertices, lights, cam, eps):
        s = scene.replace(
            vertices=vertices, light_intensity=lights, cam_position=cam + eps
        )
        return jnp.sum(_render_flat(s, settings))

    grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    grad_v = jax.jit(jax.value_and_grad(loss, argnums=(0,)))

    float(fwd(scene, jnp.zeros(3)))
    t = best_of(
        lambda eps: float(fwd(scene, eps)),
        lambda i: (jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)]),),
        overhead=overhead,
    )
    print(f"forward: {t*1e3:.2f} ms", flush=True)

    def run_grad(fn, eps):
        v, gs = fn(scene.vertices, scene.light_intensity, scene.cam_position,
                   eps)
        return float(v) + float(jax.tree.leaves(gs)[0].ravel()[0])

    for name, fn in [("fwd+bwd (v,l,c)", grad), ("fwd+bwd (v only)", grad_v)]:
        run_grad(fn, jnp.zeros(3))
        t = best_of(
            lambda eps: run_grad(fn, eps),
            lambda i: (jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)]),),
            overhead=overhead,
        )
        print(f"{name} [CRT_SEGSUM={os.environ.get('CRT_SEGSUM', 'auto')}]: "
              f"{t*1e3:.2f} ms", flush=True)

    # ---- staged backward bisection --------------------------------------
    from crt_tpu.ops import camera as camera_ops
    from crt_tpu.ops.shade import hit_attributes, shade_wavefront
    from crt_tpu.ops.texture import sample_textures
    from crt_tpu.renderer import make_tiler, make_trace_fn

    rx, ry, _ = make_tiler(scene.height, scene.width)
    trace_fn = make_trace_fn(scene, settings)

    def stage_loss(stage, vertices, eps):
        s = scene.replace(vertices=vertices)
        o, d = camera_ops.generate_rays(
            s.cam_position + eps, s.cam_rotation, s.cam_tan_half_fov,
            s.width, s.height, rx, ry,
        )
        hit = trace_fn(o, d, None)
        attrs = hit_attributes(s, o, d, hit)
        if stage == "attrs":
            return jnp.sum(attrs.point) + jnp.sum(attrs.normal) + jnp.sum(attrs.t)
        albedo = sample_textures(s, attrs.albedo_tex, attrs.uv,
                                 attrs.bary_u, attrs.bary_v)
        if stage == "albedo":
            return jnp.sum(albedo * attrs.normal)
        col = shade_wavefront(s, settings, trace_fn, o, d,
                              rx.astype(jnp.uint32), ry.astype(jnp.uint32))
        return jnp.sum(col)

    for stage in ("attrs", "albedo", "full"):
        f = jax.jit(jax.value_and_grad(
            lambda v, eps, stage=stage: stage_loss(stage, v, eps)
        ))

        def rg(eps):
            v, g = f(scene.vertices, eps)
            return float(v) + float(g.ravel()[0])

        rg(jnp.zeros(3))
        t = best_of(
            lambda eps: rg(eps),
            lambda i: (jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)]),),
            overhead=overhead,
        )
        print(f"stage fwd+bwd {stage}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
