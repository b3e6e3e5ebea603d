"""Detailed backend benchmark on the current jax device.

Defeats execution-result caching in the device tunnel by perturbing the
camera each repetition, and avoids framebuffer-transfer overhead by reducing
the image to a scalar on device.

Usage: python tools/bench_detail.py [scene] [backends...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crt_tpu import RenderSettings, load_scene
from crt_tpu.renderer import _render_flat

DEFAULT_SCENE = "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"


def bench_backend(scene, backend: str, reps: int = 10, grad: bool = False):
    settings = RenderSettings(backend=backend)

    if grad:
        def loss(s, eps):
            s = s.replace(cam_position=s.cam_position + eps)
            img = _render_flat(s, settings)
            return jnp.sum(img)

        fn = jax.jit(jax.grad(
            lambda verts, s, eps: jnp.sum(
                _render_flat(s.replace(vertices=verts,
                                       cam_position=s.cam_position + eps),
                             settings)
            )
        ))
        call = lambda eps: fn(scene.vertices, scene, eps)
    else:
        fn = jax.jit(
            lambda s, eps: jnp.sum(
                _render_flat(s.replace(cam_position=s.cam_position + eps),
                             settings)
            )
        )
        call = lambda eps: fn(scene, eps)

    # NOTE: through the remote-device relay block_until_ready does NOT wait
    # for execution; only a value readback does.  Time via float(scalar).
    t0 = time.perf_counter()
    float(jax.tree.leaves(call(jnp.zeros(3)))[0].sum())
    compile_time = time.perf_counter() - t0

    times = []
    for i in range(reps):
        eps = jnp.asarray([0.0, 0.0, 1e-6 * (i + 1)], jnp.float32)
        t0 = time.perf_counter()
        float(jax.tree.leaves(call(eps))[0].sum())
        times.append(time.perf_counter() - t0)

    # subtract pure dispatch+readback latency (measured with a trivial fn)
    null = jax.jit(lambda eps: jnp.sum(eps))
    float(null(jnp.zeros(3)))
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        float(null(jnp.asarray([0.0, 0.0, 1e-6 * i], jnp.float32)))
        lat.append(time.perf_counter() - t0)
    overhead = min(lat)

    times = [max(t - overhead, 1e-9) for t in times]
    return compile_time, min(times), sorted(times)[len(times) // 2]


def main(argv):
    from crt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    scene_path = argv[0] if argv and argv[0].endswith(".crtscene") else DEFAULT_SCENE
    backends = [
        a for a in argv if not a.endswith(".crtscene") and not a.startswith("-")
    ] or ["bruteforce", "pallas", "tree"]
    scene = load_scene(scene_path)
    npix = scene.width * scene.height
    print(f"scene: {scene_path}  {scene.num_triangles} tris  "
          f"{scene.width}x{scene.height}  lights={scene.num_lights}",
          flush=True)
    for backend in backends:
        for grad in (False, True) if "--grad" in argv else (False,):
            try:
                ct, best, med = bench_backend(scene, backend, grad=grad)
                tag = backend + ("+grad" if grad else "")
                print(
                    f"{tag:14s} compile={ct:6.1f}s best={best*1e3:8.2f}ms "
                    f"med={med*1e3:8.2f}ms  {npix/best/1e6:8.1f} Mrays/s",
                    flush=True,
                )
            except Exception as e:
                print(f"{backend}: ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
