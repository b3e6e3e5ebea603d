"""TPU smoke of the RESIDENT production path under shard_map (VERDICT r4 #6).

tools/exp_shard_stream_tpu.py proved the HBM-streaming kernel bit-exact
under shard_map on real hardware; this does the same for the DEFAULT
resident path — the pallas cluster kernel with the w-parameterized shadow
kernel (in-kernel directions) forward, and the banded-segsum backward —
on a 1-device "rays" mesh, so every production Pallas path has executed
for real under shard_map before multi-chip hardware exists:

  1. forward: render_image_sharded vs the flat renderer (bit compare);
  2. backward: sharded_value_and_grad (psum gradient all-reduce) vs flat
     jax.grad of the same loss.

Usage: python tools/exp_shard_resident_tpu.py [scene.crtscene]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from crt_tpu import RenderSettings, load_scene
from crt_tpu.parallel.sharded import (
    default_trainable_params,
    make_mesh,
    render_image_sharded,
    sharded_value_and_grad,
)
from crt_tpu.renderer import render_image_hwc


def main(argv):
    path = argv[0] if argv else (
        "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene"
    )
    scene = load_scene(path)
    # reduced rows keep the smoke fast; full tile structure preserved
    scene = scene.replace(width=640, height=320)
    settings = RenderSettings(backend="pallas")
    mesh = make_mesh(jax.devices()[:1])

    img_sh = np.asarray(render_image_sharded(scene, settings, mesh))
    img_flat = np.asarray(render_image_hwc(scene, settings))
    err = float(np.abs(img_sh - img_flat).max())
    n_diff = int((img_sh != img_flat).sum())
    print(f"resident fwd (1-device rays mesh) vs flat: max err {err:.2e}, "
          f"{n_diff} differing components", flush=True)
    assert err < 1e-6, err

    params = default_trainable_params(scene)
    target = jnp.asarray(img_flat) * 0.9
    loss_sh, grads_sh = sharded_value_and_grad(
        scene, target, params, settings, mesh
    )

    # target passed as an ARGUMENT, not a closure constant: a large f32
    # constant embedded in a pallas-heavy program arrives partially zeroed
    # through the axon relay (measured round 5 — the sharded path is
    # unaffected because shard_map takes target as an operand).
    def flat_loss(p, target):
        img = render_image_hwc(scene.replace(**p), settings, jit=False)
        return jnp.mean((img - target) ** 2)

    loss_f, grads_f = jax.jit(jax.value_and_grad(flat_loss))(params, target)
    dl = abs(float(loss_sh) - float(loss_f))
    print(f"loss sharded {float(loss_sh):.8f} flat {float(loss_f):.8f} "
          f"(|d|={dl:.2e})", flush=True)
    worst = 0.0
    for k in grads_f:
        gs, gf = np.asarray(grads_sh[k]), np.asarray(grads_f[k])
        scale = max(1e-8, float(np.abs(gf).max()))
        rel = float(np.abs(gs - gf).max()) / scale
        worst = max(worst, rel)
        print(f"  grad[{k}]: max rel err {rel:.2e}", flush=True)
    assert dl < 1e-7 and worst < 1e-4, (dl, worst)
    print("ok", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
