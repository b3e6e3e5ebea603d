"""Fine-grained backward attribution with in-graph repetition (TPU).

The relay's ~±10 ms dispatch noise swamps single-execution timings, so each
measured computation is repeated N times INSIDE one jitted program (inputs
perturbed per iteration via fori_loop so the relay cannot cache) and the
wall time is divided by N — per-pass resolution well under a millisecond.

Usage: python tools/bench_bwd2.py
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
from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.shade import hit_attributes, shade_wavefront
from crt_tpu.ops.texture import sample_textures
from crt_tpu.renderer import _render_flat, make_tiler, make_trace_fn

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
N = 8  # in-graph repetitions


def main():
    scene = load_scene(SCENE)
    settings = RenderSettings()
    h, w = scene.height, scene.width
    rx, ry, _ = make_tiler(h, w)
    origins, dirs = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )
    trace_fn = make_trace_fn(scene, settings)
    rxu, ryu = rx.astype(jnp.uint32), ry.astype(jnp.uint32)

    def repeat(fn):
        """Sum fn(eps_i) over N in-graph iterations with distinct eps."""

        def run(eps0):
            def body(i, acc):
                return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        return jax.jit(run)

    def bench(name, fn):
        jfn = repeat(fn)
        float(jfn(jnp.float32(0.0)))  # compile
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            float(jfn(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / N * 1e3:.2f} ms/pass", flush=True)

    def attrs_of(eps):
        o = origins + eps
        hit = trace_fn(o, dirs, None)
        return o, hit

    # ---- forward pieces ---------------------------------------------------
    def f_trace(eps):
        o, hit = attrs_of(eps)
        return jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))

    def f_attrs(eps):
        o, hit = attrs_of(eps)
        a = hit_attributes(scene, o, dirs, hit)
        return jnp.sum(a.point) + jnp.sum(a.normal) + jnp.sum(a.t)

    def f_full(eps):
        return jnp.sum(
            _render_flat(
                scene.replace(cam_position=scene.cam_position + eps),
                settings,
            )
        )

    bench("fwd trace", f_trace)
    bench("fwd trace+attrs", f_attrs)
    bench("fwd full frame", f_full)

    # ---- backward pieces --------------------------------------------------
    def g_of(loss_of_v):
        def fn(eps):
            val, g = jax.value_and_grad(loss_of_v)(scene.vertices, eps)
            return val + jnp.sum(g[0])

        return fn

    def l_t(v, eps):
        o = origins + eps
        hit = trace_fn(o, dirs, None)
        a = hit_attributes(scene.replace(vertices=v), o, dirs, hit)
        return jnp.sum(a.t)

    def l_point(v, eps):
        o = origins + eps
        hit = trace_fn(o, dirs, None)
        a = hit_attributes(scene.replace(vertices=v), o, dirs, hit)
        return jnp.sum(a.point)

    def l_normal(v, eps):
        o = origins + eps
        hit = trace_fn(o, dirs, None)
        a = hit_attributes(scene.replace(vertices=v), o, dirs, hit)
        return jnp.sum(a.normal)

    def l_attrs(v, eps):
        o = origins + eps
        hit = trace_fn(o, dirs, None)
        a = hit_attributes(scene.replace(vertices=v), o, dirs, hit)
        return jnp.sum(a.point) + jnp.sum(a.normal) + jnp.sum(a.t)

    def l_albedo(v, eps):
        o = origins + eps
        s = scene.replace(vertices=v)
        hit = trace_fn(o, dirs, None)
        a = hit_attributes(s, o, dirs, hit)
        alb = sample_textures(s, a.albedo_tex, a.uv, a.bary_u, a.bary_v)
        return jnp.sum(alb * a.normal)

    def l_full(v, eps):
        s = scene.replace(
            vertices=v, cam_position=scene.cam_position + eps
        )
        return jnp.sum(_render_flat(s, settings))

    for name, l in [
        ("fwd+bwd t only", l_t),
        ("fwd+bwd point only", l_point),
        ("fwd+bwd normal only", l_normal),
        ("fwd+bwd all attrs", l_attrs),
        ("fwd+bwd attrs+albedo", l_albedo),
        ("fwd+bwd full frame", l_full),
    ]:
        bench(name, g_of(l))


if __name__ == "__main__":
    main()
