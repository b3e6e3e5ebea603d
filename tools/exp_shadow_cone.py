"""A/B the apex-cone shadow-binning refinement on the 14-01 frame (TPU).

Reports shadow (tile x cluster) pair counts with the slab-only vs
slab+cone masks, occlusion equality, and in-graph full-frame times.

Usage: CRT_SHADOW_CONE=... python tools/exp_shadow_cone.py
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
from crt_tpu.ops import camera as camera_ops, vecmath
from crt_tpu.ops import pallas_trace as pt
from crt_tpu.renderer import _render_flat, make_tiler, make_trace_fn

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
N = 8


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
    tables = pt.build_cluster_tables(scene)

    # --- reproduce the shadow wavefront (as shade._occlusion_masks) -------
    @jax.jit
    def shadow_stats():
        hit = trace_fn(origins, dirs, None)
        from crt_tpu.ops.shade import hit_attributes

        attrs = hit_attributes(scene, origins, dirs, hit, force_all=True)
        point, normal = attrs.point, attrs.normal
        lp = scene.light_position
        light_vec = lp[:, None, :] - point[None]
        r2 = vecmath.length_squared(light_vec)
        light_dir = vecmath.safe_normalize(light_vec)
        facing = vecmath.dot(
            light_dir, jnp.broadcast_to(normal[None], light_vec.shape)
        ) > 0.0
        act = (attrs.valid[None] & facing).reshape(-1)
        shadow_o = point + normal * settings.shadow_bias
        o_flat = jnp.broadcast_to(
            shadow_o[None], light_vec.shape
        ).reshape(-1, 3)
        d_flat = light_dir.reshape(-1, 3)

        TR = pt.TILE_RAYS
        R = point.shape[0]
        apex = jnp.repeat(lp, R // TR, axis=0)
        _, counts = pt.bin_rays(
            tables, o_flat, d_flat, TR, act, apex=apex,
            apex_slack=float(settings.shadow_bias),
        )
        return jnp.sum(counts), jnp.sum(counts > 0)

    pairs, live = map(int, shadow_stats())
    tag0 = (f"cone={int(pt._SHADOW_CONE)} sub={pt._SHADOW_SUBF}")
    print(f"shadow pairs [{tag0}]: {pairs} (live tiles {live})", flush=True)

    # --- full-frame in-graph A/B ------------------------------------------
    def frame(eps):
        s = scene.replace(cam_position=scene.cam_position + eps)
        return jnp.sum(_render_flat(s, settings))

    def run(eps0):
        def body(i, acc):
            return acc + frame(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    float(jfn(jnp.float32(0.0)))
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    tag = "cone" if pt._SHADOW_CONE else "slab-only"
    print(f"fwd frame [{tag}]: {best / N * 1e3:.2f} ms/pass", flush=True)

    def loss(v, eps):
        s = scene.replace(vertices=v,
                          cam_position=scene.cam_position + eps)
        return jnp.sum(_render_flat(s, settings))

    def gfn(eps):
        val, g = jax.value_and_grad(loss)(scene.vertices, eps)
        return val + jnp.sum(g)

    def rung(eps0):
        def body(i, acc):
            return acc + gfn(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jg = jax.jit(rung)
    float(jg(jnp.float32(0.0)))
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        float(jg(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"fwd+bwd(vertices) [{tag}]: {best / N * 1e3:.2f} ms/pass",
          flush=True)


if __name__ == "__main__":
    main()
