"""Stream backend vs resident Pallas on a real course scene (TPU).

The stream kernel's parity gates are procedural scenes + interpret mode;
this renders 09-02 and 14-01 goldens through BOTH TPU backends and
compares pixels (expect bit-equality or tie-level differences only).

Usage: python tools/exp_stream_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from crt_tpu import RenderSettings, load_scene
from crt_tpu.renderer import render_image_hwc

SCENES = [
    "/root/reference/scenes/09-02-diffuse-smooth-shading/scene2.crtscene",
    "/root/reference/scenes/14-01-acceleration-tree/scene1.crtscene",
]


def main():
    for path in SCENES:
        scene = load_scene(path).replace(width=480, height=270)
        a = np.asarray(render_image_hwc(
            scene, RenderSettings(backend="pallas")))
        b = np.asarray(render_image_hwc(
            scene, RenderSettings(backend="pallas_stream")))
        diff = np.abs(a - b)
        frac = float((diff.max(-1) <= 1e-6).mean())
        print(f"{os.path.basename(path)}: {frac * 100:.4f}% pixels equal, "
              f"max diff {diff.max():.2e}", flush=True)
        assert frac > 0.999, path
    print("ok", flush=True)


if __name__ == "__main__":
    main()
