"""Shadow-trace attribution bench (TPU): split the 14-01 frame by phase.

Times, with perturbed-input scalar readback:
  - primary trace alone (bin + kernel), and its bin_rays phase alone
  - the merged 4-light shadow trace alone, and its bin_rays phase alone
  - shading-only (primary trace + attrs + albedo + light math, shadows off)
  - full frame

Usage: python tools/bench_shadow.py
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
from crt_tpu.ops import vecmath
from crt_tpu.ops.pallas_trace import bin_rays, build_cluster_tables
from crt_tpu.renderer import _render_flat, make_tiler, make_trace_fn

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"


def timed(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


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
    tables = build_cluster_tables(scene)

    null = jax.jit(lambda eps: jnp.sum(eps))
    float(null(jnp.zeros(3)))
    overhead = min(
        timed(lambda e: float(null(e)), jnp.asarray([0.0, 0.0, 1e-6 * i]))
        for i in range(5)
    )
    print(f"overhead {overhead*1e3:.1f} ms", flush=True)

    def bench(name, fn):
        jfn = jax.jit(fn)
        float(jfn(jnp.zeros(3)))
        best = min(
            timed(lambda e: float(jfn(e)),
                  jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)]))
            for i in range(5)
        )
        print(f"{name}: {(best - overhead)*1e3:.2f} ms", flush=True)

    def primary_trace(eps):
        hit = trace_fn(origins + eps, dirs, None)
        return jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))

    bench("primary trace", primary_trace)

    bench("primary bin_rays only", lambda eps: jnp.sum(
        bin_rays(tables, origins + eps, dirs)[1]
    ))

    # shadow wavefront: build from real primary hits once
    hit = jax.jit(lambda: trace_fn(origins, dirs, None))()
    from crt_tpu.ops.shade import hit_attributes

    attrs = jax.jit(lambda: hit_attributes(scene, origins, dirs, hit))()
    point = jax.lax.stop_gradient(attrs.point)
    normal = jax.lax.stop_gradient(attrs.normal)
    valid = jax.lax.stop_gradient(attrs.valid)
    Ll = scene.num_lights

    def shadow_wavefront(eps):
        light_vec = scene.light_position[:, None, :] - (point + eps)[None]
        light_dir = vecmath.safe_normalize(light_vec)
        o = jnp.broadcast_to(
            point + normal * settings.shadow_bias + eps, light_vec.shape
        ).reshape(-1, 3)
        d = light_dir.reshape(-1, 3)
        facing = vecmath.dot(
            light_dir, jnp.broadcast_to(normal[None], light_vec.shape)
        ) > 0.0
        act = (valid[None] & facing).reshape(-1)
        return o, d, act

    def shadow_trace(eps):
        o, d, act = shadow_wavefront(eps)
        sh = trace_fn(o, d, act)
        return jnp.sum(jnp.where(jnp.isfinite(sh.t), sh.t, 0.0))

    bench(f"shadow trace ({Ll} lights merged)", shadow_trace)

    def shadow_bin(eps):
        o, d, act = shadow_wavefront(eps)
        return jnp.sum(bin_rays(tables, o, d, active=act)[1])

    bench("shadow bin_rays only", shadow_bin)

    bench("full frame", lambda eps: jnp.sum(
        _render_flat(scene.replace(cam_position=scene.cam_position + eps),
                     settings)
    ))

    no_shadow = settings.replace(compat_no_shadows=True)
    bench("frame without shadows", lambda eps: jnp.sum(
        _render_flat(scene.replace(cam_position=scene.cam_position + eps),
                     no_shadow)
    ))


if __name__ == "__main__":
    main()
