"""A/B: occupancy lane compaction on the 11-01-scene8 refractive frame.

Round-4 attribution (docs/PERFORMANCE.md): the 10.9 s in-graph frame is
~90 % the bank pool's per-bounce shadow volume — L*B*R transmissive-march
first traces whose sparse active lanes are SCATTERED through every pixel
tile (tile-skipping alone: -5 %), plus cond-gated full-width re-traces.
Round-5 fix: shade.lane_partition packs active lanes first (march and pool
traces), so dead tiles form and the binned launch skips them.

Variants (module-global patching, never reload):
  base          — both compactions off (the round-4 state)
  march         — shadow-march compaction only
  pool          — pool bounce-trace compaction only
  both          — committed defaults

Usage: python tools/exp_refr_compact.py [N_passes] [variants...]
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
from crt_tpu.ops import shade as shade_mod
from crt_tpu.ops import shade_iter as shade_iter_mod
from crt_tpu.renderer import _render_flat

SCENE = "/root/reference/scenes/11-01-refractive/scene8.crtscene"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 2
FILTERS = sys.argv[2:]

VARIANTS = {
    "base": (False, False),
    "march": (True, False),
    "pool": (False, True),
    "both": (True, True),
}


def bench(name, scene, settings):
    def f(eps):
        s = scene.replace(cam_position=scene.cam_position + eps)
        return jnp.sum(_render_flat(s, settings))

    def run(eps0):
        def body(i, acc):
            return acc + f(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(0.0)))  # compile
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    ms = best / N * 1e3
    print(f"{name}: {ms:.1f} ms/frame  [compile {compile_s:.0f} s]",
          flush=True)
    return ms


def main():
    scene = load_scene(SCENE)
    settings = RenderSettings()  # shadows ON: the capability path
    for name, (march, pool) in VARIANTS.items():
        if FILTERS and name not in FILTERS:
            continue
        shade_mod._SHADOW_COMPACT = march
        shade_iter_mod._POOL_COMPACT = pool
        bench(f"11-01-scene8 {name:6s}", scene, settings)


if __name__ == "__main__":
    main()
