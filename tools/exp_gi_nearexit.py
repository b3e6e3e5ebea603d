"""GI showcase (15-01-scene2) A/B: CRT_NEAR_EXIT on/off (round-4 item 5).

The exact-tree GI frame is dominated by INCOHERENT leaf/bounce traces
whose tile frustums degenerate to ~all clusters; near-origin-first
ordering + the in-kernel lower-bound exit should cut each walk to the
hit-distance shell.  Also prints a device-side radiance sum per mode
(tie flips only; must agree to ~1e-5 relative).

Usage: python tools/exp_gi_nearexit.py [--res N] [--reps N]
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

SCENE = "/root/reference/scenes/15-01-conclusion/scene2.crtscene"


def main(argv):
    res = 540
    reps = 3
    if "--res" in argv:
        res = int(argv[argv.index("--res") + 1])
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])

    import crt_tpu.ops.pallas_trace as ptr

    base = load_scene(SCENE)
    scene = base.replace(width=res, height=res)
    settings = RenderSettings(compat_no_shadows=True, compat_hadamard_y=True)

    for flag in (False, True):
        ptr._NEAR_EXIT = flag

        def one(eps):
            s = scene.replace(cam_position=scene.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        def run(eps0):
            def body(i, acc):
                return acc + one(eps0 + 1e-7 * i.astype(jnp.float32))

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        jfn = jax.jit(run)
        t0 = time.perf_counter()
        s0 = float(jfn(jnp.float32(0.0)))
        c = time.perf_counter() - t0
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            float(jfn(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        print(f"near_exit={flag}: {best / reps * 1e3:.0f} ms/frame "
              f"(compile {c:.0f}s, sum {s0:.1f})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
