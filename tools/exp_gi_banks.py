"""Bank-budget sweep on the GI showcase: drops + image delta vs frame time.

Decides the default GI bank count with evidence: for each B, render
15-01-scene2 (540x540, grow schedule) and report dropped-child count,
max/mean abs image delta vs the B=18 reference, and in-graph frame time.

Usage: python tools/exp_gi_banks.py [--res N]
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
from crt_tpu.ops import camera as camera_ops
from crt_tpu.ops.shade_iter import shade_wavefront_iter_with_stats
from crt_tpu.renderer import _render_flat, make_tiler, make_trace_fn

SCENE = "/root/reference/scenes/15-01-conclusion/scene2.crtscene"
N = 4


def main(argv):
    res = 540
    if "--res" in argv:
        res = int(argv[argv.index("--res") + 1])
    scene = load_scene(SCENE).replace(width=res, height=res)
    prof = dict(compat_no_shadows=True, compat_hadamard_y=True)

    # drops + image per B (single chunk; direct shade_iter call)
    h, w = scene.height, scene.width
    rx, ry, _ = make_tiler(h, w)
    o, d = camera_ops.generate_rays(
        scene.cam_position, scene.cam_rotation, scene.cam_tan_half_fov,
        w, h, rx, ry,
    )
    imgs = {}
    total_paths = None
    for B in (18, 14, 12, 10, 8):
        settings = RenderSettings(**prof)
        trace_fn = make_trace_fn(scene, settings)

        @jax.jit
        def run(o, d, B=B, settings=settings, trace_fn=trace_fn):
            return shade_wavefront_iter_with_stats(
                scene, settings, trace_fn, o, d,
                rx.astype(jnp.uint32), ry.astype(jnp.uint32), banks=B,
            )

        color, dropped = run(o, d)
        imgs[B] = np.asarray(color)
        print(f"B={B}: dropped children = {int(dropped)}", flush=True)

    ref = imgs[18]
    for B in (14, 12, 10, 8):
        diff = np.abs(imgs[B] - ref)
        print(f"B={B}: max|d|={diff.max():.6f} mean={diff.mean():.8f} "
              f"pixels>1/255: {(diff.max(-1) > 1 / 255).mean() * 100:.4f}%",
              flush=True)

    # frame times through the full renderer (chunked) per B
    def bench(B):
        settings = RenderSettings(**prof, wavefront_banks=B)

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
        for i in range(3):
            t0 = time.perf_counter()
            float(jfn(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        print(f"B={B}: {best / N * 1e3:.1f} ms/frame", flush=True)

    for B in (12, 10):
        bench(B)


if __name__ == "__main__":
    main(sys.argv[1:])
