"""Sub-banded segsum sweep on the 14-01 fwd+bwd (round-4 item 3).

The banded VJP's ~2.2 ms is grid-sequencing floor: ~2024 steps x ~1 us,
with the [r_sub, T_BLK] one-hot pinning r_tile x T_BLK to VMEM.  The
sub-tiled kernel amortizes the grid 4-16x while keeping the one-hot
small.  Sweeps (r_tile, r_sub).

Usage: python tools/exp_r4_segsum.py
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

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
REPS = 8


def bench(name, fn, reps=REPS):
    def run(eps0):
        def body(i, acc):
            return acc + fn(eps0 + 1e-7 * i.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jfn = jax.jit(run)
    t0 = time.perf_counter()
    s0 = float(jfn(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name}: {best / reps * 1e3:.2f} ms (compile {c:.0f}s, "
          f"sum {s0:.4e})", flush=True)


def main():
    import crt_tpu.ops.pallas_segsum as pseg
    import crt_tpu.renderer as renderer
    from crt_tpu import RenderSettings, load_scene

    scene = load_scene(SCENE)
    settings = RenderSettings()
    params = {"vertices": scene.vertices,
              "light_intensity": scene.light_intensity,
              "cam_position": scene.cam_position}

    def loss(p, eps):
        s = scene.replace(**{k: v + (eps if k == "cam_position" else 0.0)
                             for k, v in p.items()})
        img = renderer._render_flat(s, settings)
        return jnp.sum(img * img)

    def fwdbwd(eps):
        l, g = jax.value_and_grad(loss)(params, eps)
        return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

    for r_tile, r_sub in ((4096, 4096), (8192, 1024), (16384, 1024),
                          (16384, 2048), (32768, 2048)):
        pseg.segment_accumulate_matmul.__defaults__ = (r_tile, r_sub)
        print(f"[r_tile={r_tile} r_sub={r_sub}]", flush=True)
        bench("fwd+bwd", fwdbwd)


if __name__ == "__main__":
    main()
