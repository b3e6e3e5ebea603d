"""Headline benchmark: the reference's acceleration-tree scene.

Workload: scenes/14-01-acceleration-tree/scene1.crtscene — 4,014 triangles,
4 point lights, 1920x1080 — the scene behind every published number in the
reference's optimization report (src/README.md:5-11; best: 0.066962 s with
the KD tree on a Ryzen 7 8845HS ≈ 31.0 M primary rays/s).

Metrics: primary-ray throughput (Mrays/s) of (a) the full forward render
(1 primary + 4 shadow traces per pixel) and (b) forward+backward —
``value_and_grad`` of the image sum w.r.t. vertices, light intensities and
camera position (the BASELINE.json north-star metric) — each best of N
timed runs after compilation, end-to-end on device.  vs_baseline = ours /
31.0 (the reference CPU's forward anchor, src/README.md:11).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} plus
fwd_bwd_* keys for the forward+backward figure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
BASELINE_MRAYS = 31.0  # 1920*1080 / 0.066962 s (src/README.md:11)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    from crt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from crt_tpu import RenderSettings, load_scene
    from crt_tpu.scene.procedural import make_test_scene

    if os.path.exists(SCENE):
        scene = load_scene(SCENE)
    else:
        scene = make_test_scene(width=1920, height=1080, num_quads=64)

    import jax.numpy as jnp

    from crt_tpu.renderer import _render_flat

    backend = os.environ.get("CRT_BENCH_BACKEND", "auto")
    settings = RenderSettings(backend=backend)

    # NOTE: remote-device relays may make block_until_ready a no-op and may
    # cache identical executions, so: perturb an input every rep and time via
    # an actual scalar readback, subtracting the pure dispatch latency.
    fn = jax.jit(
        lambda s, eps: jnp.sum(
            _render_flat(s.replace(cam_position=s.cam_position + eps), settings)
        )
    )
    float(fn(scene, jnp.zeros(3)))  # compile + warm up

    null = jax.jit(lambda eps: jnp.sum(eps))
    float(null(jnp.zeros(3)))
    overhead = min(
        _timed(lambda: float(null(jnp.asarray([0.0, 0.0, 1e-6 * i]))))
        for i in range(5)
    )

    reps = int(os.environ.get("CRT_BENCH_REPS", "7"))
    best = float("inf")
    for i in range(reps):
        eps = jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)], jnp.float32)
        best = min(best, _timed(lambda: float(fn(scene, eps))))
    best = max(best - overhead, 1e-9)

    # forward+backward: d(sum image)/d(vertices, lights, camera) — the
    # BASELINE.json metric ("Mrays/s/chip forward+backward")
    def loss(vertices, lights, cam, eps):
        s = scene.replace(
            vertices=vertices,
            light_intensity=lights,
            cam_position=cam + eps,
        )
        return jnp.sum(_render_flat(s, settings))

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def grad_fn(vertices, lights, cam, eps):
        v, grads = vg(vertices, lights, cam, eps)
        # ONE scalar depending on the value and every gradient leaf: a
        # single readback forces the full pipeline (two float() readbacks
        # cost two relay round trips ~ +20 ms of pure dispatch).
        return v + sum(jnp.sum(g) for g in grads)

    def run_grad(eps):
        return float(grad_fn(
            scene.vertices, scene.light_intensity, scene.cam_position, eps
        ))

    run_grad(jnp.zeros(3))  # compile + warm up
    best_grad = float("inf")
    for i in range(reps):
        eps = jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)], jnp.float32)
        best_grad = min(best_grad, _timed(lambda: run_grad(eps)))
    best_grad = max(best_grad - overhead, 1e-9)

    px = scene.width * scene.height
    mrays = px / best / 1e6
    mrays_grad = px / best_grad / 1e6
    print(
        json.dumps(
            {
                "metric": "primary Mrays/s fwd, 14-01 acceleration-tree scene1",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                "fwd_bwd_mrays": round(mrays_grad, 3),
                "fwd_bwd_vs_baseline": round(mrays_grad / BASELINE_MRAYS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
