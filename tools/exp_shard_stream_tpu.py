"""TPU smoke of the stream-partitioned path: REAL Mosaic kernel inside
shard_map on a (1, 1) rays x scene mesh (single chip).  The CPU test mesh
can only exercise the XLA-oracle semantics (the Pallas HLO interpreter
rejects vma-carrying operands); this proves the composed lowering —
pallas_call with vma'd out_shapes under manual axes — compiles and runs on
hardware and matches the flat renderer.

Usage: python tools/exp_shard_stream_tpu.py [num_tris]
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
from jax.sharding import Mesh

from crt_tpu import RenderSettings
from crt_tpu.parallel.scene_sharded import render_image_scene_sharded
from crt_tpu.renderer import render_image_hwc
from crt_tpu.scene.procedural import make_big_scene


def main(argv):
    num_tris = int(argv[0]) if argv else 60_000
    scene = make_big_scene(num_tris, width=256, height=128)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("rays", "scene"))
    img = render_image_scene_sharded(
        scene, RenderSettings(), mesh, local_backend="pallas_stream",
    )
    img = np.asarray(img)
    flat = np.asarray(render_image_hwc(
        scene, RenderSettings(backend="pallas_stream")
    ))
    err = float(np.abs(img - flat).max())
    print(f"stream-partitioned (1,1) TPU mesh vs flat: max err {err:.2e}")
    assert err < 1e-5, err
    print("ok", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
