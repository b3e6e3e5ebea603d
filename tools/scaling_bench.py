"""Scaling-efficiency benchmark: render throughput vs device count.

BASELINE.json's north star includes "scaling efficiency from 1 chip -> 1
host -> N hosts".  This tool measures the rays-DP sharded render at
1, 2, 4, ... devices of whatever platform jax exposes (real chips on a pod;
virtual CPU devices under xla_force_host_platform_device_count for harness
validation) and reports per-count throughput + efficiency vs linear scaling.

Usage:
    python tools/scaling_bench.py [scene] [--width N] [--height N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    import jax
    import jax.numpy as jnp

    from crt_tpu import RenderSettings, load_scene
    from crt_tpu.parallel.sharded import make_mesh, render_image_sharded
    from crt_tpu.scene.procedural import make_test_scene
    from crt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    scene_path = argv[0] if argv and argv[0].endswith(".crtscene") else None
    if scene_path:
        scene = load_scene(scene_path)
    else:
        scene = make_test_scene(width=512, height=512, num_quads=32)

    settings = RenderSettings()
    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devices)]

    results = []
    base = None
    for n in counts:
        mesh = make_mesh(devices[:n])

        def run():
            img = render_image_sharded(scene, settings, mesh)
            return float(jnp.sum(img))

        run()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        mrays = scene.width * scene.height / dt / 1e6
        if base is None:
            base = mrays
        eff = mrays / (base * n)
        results.append(
            {"devices": n, "seconds": round(dt, 4),
             "mrays_per_s": round(mrays, 2), "efficiency": round(eff, 3)}
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"platform": jax.default_backend(),
                      "scaling": results}))


if __name__ == "__main__":
    main(sys.argv[1:])
