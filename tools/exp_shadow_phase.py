"""Pin the shadow-phase cost in-graph (TPU): kernel vs binning vs launch.

All timings in-graph (N reps, perturbed inputs).  Variants:
  1. full frame / frame with no_shadows       -> shadow phase total
  2. the shadow closest-hit on the REAL shadow wavefront:
       compact launch (production) vs plain launch vs binning alone
  3. a dense primary-like wavefront of the same live-lane count, for a
     tests/s reference point

Usage: python tools/exp_shadow_phase.py
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
from crt_tpu.ops.shade import hit_attributes
from crt_tpu.renderer import _render_flat, make_tiler, make_trace_fn

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
    return best / N


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
    tables = jax.tree.map(jax.lax.stop_gradient, tables)

    t_full = bench(
        "full frame",
        lambda eps: jnp.sum(_render_flat(
            scene.replace(cam_position=scene.cam_position + eps), settings)),
    )
    t_nosh = bench(
        "frame no_shadows",
        lambda eps: jnp.sum(_render_flat(
            scene.replace(cam_position=scene.cam_position + eps),
            RenderSettings(compat_no_shadows=True))),
    )
    print(f"-> shadow phase total ~{(t_full - t_nosh) * 1e3:.2f} ms")

    # --- the real shadow wavefront, built once per eps -----------------
    def shadow_wavefront(eps):
        o = origins + eps
        hit = trace_fn(o, dirs, None)
        attrs = hit_attributes(scene, o, dirs, hit, force_all=True)
        lp = scene.light_position
        light_vec = lp[:, None, :] - attrs.point[None]
        r2 = vecmath.length_squared(light_vec)
        ldir = vecmath.safe_normalize(light_vec)
        facing = vecmath.dot(
            ldir, jnp.broadcast_to(attrs.normal[None], light_vec.shape)
        ) > 0.0
        act = (attrs.valid[None] & facing).reshape(-1)
        so = (attrs.point + attrs.normal * settings.shadow_bias)
        o_flat = jnp.broadcast_to(so[None], light_vec.shape).reshape(-1, 3)
        d_flat = ldir.reshape(-1, 3)
        apex = jnp.repeat(lp, attrs.point.shape[0] // pt.TILE_RAYS, axis=0)
        return o_flat, d_flat, act, r2.reshape(-1), apex

    def t_bin(eps):
        o_flat, d_flat, act, r2, apex = shadow_wavefront(eps)
        _, counts = pt.bin_rays(
            tables, o_flat, d_flat, pt.TILE_RAYS, act, apex=apex,
            apex_slack=float(settings.shadow_bias),
        )
        return jnp.sum(counts).astype(jnp.float32)

    def trace_with(compact):
        def f(eps):
            o_flat, d_flat, act, r2, apex = shadow_wavefront(eps)
            TR = pt.TILE_RAYS
            tiles = o_flat.shape[0] // TR
            cl, counts = pt.bin_rays(
                tables, o_flat, d_flat, TR, act, apex=apex,
                apex_slack=float(settings.shadow_bias),
            )
            o_t = o_flat.reshape(tiles, TR, 3).swapaxes(1, 2)
            d_t = d_flat.reshape(tiles, TR, 3).swapaxes(1, 2)
            fn = (pt._closest_hit_binned_compact if compact
                  else pt._closest_hit_binned)
            bt, btri = fn(tables, o_t, d_t, cl, counts, TR, False)
            occ = (btri.reshape(-1) >= 0) & (
                bt.reshape(-1) ** 2 <= r2
            )
            return jnp.sum(occ.astype(jnp.float32))

        return f

    # wavefront build cost alone (trace + attrs + masks, no shadow work)
    def t_wave(eps):
        o_flat, d_flat, act, r2, apex = shadow_wavefront(eps)
        return jnp.sum(d_flat) + jnp.sum(act) + jnp.sum(r2)

    tw = bench("wavefront build only", t_wave)
    tb = bench("wavefront + binning", t_bin)
    tc = bench("wavefront + bin + COMPACT kernel", trace_with(True))
    tp = bench("wavefront + bin + PLAIN kernel", trace_with(False))
    print(f"-> binning ~{(tb - tw) * 1e3:.2f} ms, "
          f"compact kernel ~{(tc - tb) * 1e3:.2f} ms, "
          f"plain kernel ~{(tp - tb) * 1e3:.2f} ms")

    # dense reference: primary trace on the 2 M-ray wavefront
    def t_primary(eps):
        hit = trace_fn(origins + eps, dirs, None)
        return jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))

    bench("primary trace (2 M dense)", t_primary)


if __name__ == "__main__":
    main()
