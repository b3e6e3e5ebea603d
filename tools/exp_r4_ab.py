"""Round-4 A/Bs on the 14-01 headline workload (TPU).

Measures fwd and fwd+bwd frames with each flag combination:
  base            — round-3 defaults
  occl_exit       — CRT_OCCL_EXIT: all-blocked shadow-walk exit + near order
  near_exit       — CRT_NEAR_EXIT: distance-ordered closest-hit early exit
  remat           — remat_shading=True re-A/B at the round-4 baseline
  no_fused_light  — fused_light_vjp=False (isolates the round-3 carryover)

In-graph repetition methodology (see docs/PERFORMANCE.md).
Usage: python tools/exp_r4_ab.py [variants...]
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
    float(jfn(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name}: {best / reps * 1e3:.2f} ms (compile {c:.0f}s)",
          flush=True)
    return best / reps


def measure(tag, settings_kw):
    # the flags are module globals read at trace time — patch directly
    import crt_tpu.ops.pallas_trace as ptr
    ptr._NEAR_EXIT = os.environ.get("CRT_NEAR_EXIT", "0") != "0"
    ptr._OCCL_EXIT = os.environ.get("CRT_OCCL_EXIT", "0") != "0"
    import crt_tpu.renderer as renderer
    from crt_tpu import RenderSettings, load_scene

    scene = load_scene(SCENE)
    settings = RenderSettings(**settings_kw)
    print(f"[{tag}] {settings_kw} NEAR={ptr._NEAR_EXIT} "
          f"OCCL={ptr._OCCL_EXIT}", flush=True)

    def fwd(eps):
        s = scene.replace(cam_position=scene.cam_position + eps)
        return jnp.sum(renderer._render_flat(s, settings))

    bench("fwd", fwd)

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

    bench("fwd+bwd", fwdbwd)


def main(argv):
    variants = argv or ["base", "occl_exit", "near_exit", "remat",
                        "no_fused_light"]
    for v in variants:
        os.environ.pop("CRT_NEAR_EXIT", None)
        os.environ.pop("CRT_OCCL_EXIT", None)
        kw = {}
        if v == "occl_exit":
            os.environ["CRT_OCCL_EXIT"] = "1"
        elif v == "near_exit":
            os.environ["CRT_NEAR_EXIT"] = "1"
        elif v == "remat":
            kw = {"remat_shading": True}
        elif v == "no_fused_light":
            kw = {"fused_light_vjp": False}
        measure(v, kw)


if __name__ == "__main__":
    main(sys.argv[1:])
