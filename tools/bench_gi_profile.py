"""GI showcase (15-01-scene2) phase attribution — where do the banks spend it?

In-graph repetition timing (the relay's dispatch noise swamps single shots;
see bench_bwd2.py).  Variants isolate the three cost hypotheses:

  - trace volume: B banks x R lanes traced per bounce regardless of
    occupancy (banks override shrinks the pool)
  - child-placement bookkeeping: the [B, B, R] match + per-field bank loop
    in shade_iter._place_children (K override removes GI children)
  - per-bounce shading body (D override shrinks the scan)

Usage: python tools/bench_gi_profile.py [--res N] [--reps N]
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
    reps = 4
    if "--res" in argv:
        res = int(argv[argv.index("--res") + 1])
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])

    base = load_scene(SCENE)
    scene = base.replace(width=res, height=res)
    prof = dict(compat_no_shadows=True, compat_hadamard_y=True)

    def bench(name, settings, scn=scene):
        def one(eps):
            s = scn.replace(cam_position=scn.cam_position + eps)
            return jnp.sum(_render_flat(s, settings))

        def run(eps0):
            def body(i, acc):
                return acc + one(eps0 + 1e-7 * i.astype(jnp.float32))

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        jfn = jax.jit(run)
        t0 = time.perf_counter()
        float(jfn(jnp.float32(0.0)))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(jfn(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / reps * 1e3:.1f} ms/frame "
              f"(compile {compile_s:.0f}s)", flush=True)
        return best / reps

    full = bench("full GI (K=4, D=3, B=auto=18)", RenderSettings(**prof))
    bench("B=12", RenderSettings(**prof, wavefront_banks=12))
    bench("B=10", RenderSettings(**prof, wavefront_banks=10))
    bench("K=2 (B=auto=14)", RenderSettings(
        **prof, diffuse_reflection_ray_count=2))
    bench("K=0 (no GI children, B=auto=10)", RenderSettings(
        **prof, diffuse_reflection_ray_count=0))
    bench("D=1 (B=auto=18)", RenderSettings(**prof, max_ray_depth=1))
    bench("gi off (recursive unroll auto)",
          RenderSettings(**prof), scene.replace(gi_on=False))
    bench("chunked 2x smaller", RenderSettings(
        **prof, chunk_pixels=res * res // 8))
    print(f"baseline full: {full * 1e3:.1f} ms")


if __name__ == "__main__":
    main(sys.argv[1:])
