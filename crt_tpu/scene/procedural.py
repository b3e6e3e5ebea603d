"""Procedural test scenes (no file dependencies).

Used by __graft_entry__, benchmarks and tests when the reference scene files
are unavailable.  Built through the same ``scene_from_dict`` path as real
.crtscene files so they exercise the full loader.
"""

from __future__ import annotations

import numpy as np

from crt_tpu.scene.json_loader import scene_from_dict
from crt_tpu.scene.types import Scene


def make_test_scene(
    width: int = 64,
    height: int = 36,
    num_quads: int = 8,
    seed: int = 0,
    with_reflective: bool = True,
    with_refractive: bool = False,
    gi_on: bool = False,
) -> Scene:
    """A small random quad-soup scene with a floor, lights and materials."""
    rng = np.random.default_rng(seed)

    objects = [
        {  # floor
            "material_index": 0,
            "vertices": [-20, -2, 20, 20, -2, 20, -20, -2, -20,
                         20, -2, -20],
            "triangles": [0, 1, 2, 3, 2, 1],
        }
    ]
    mats = [
        {"type": "diffuse", "albedo": [0.7, 0.7, 0.7], "smooth_shading": False},
        {"type": "diffuse", "albedo": [0.9, 0.2, 0.2], "smooth_shading": True},
    ]
    if with_reflective:
        mats.append(
            {"type": "reflective", "albedo": [0.8, 0.8, 0.9],
             "smooth_shading": False}
        )
    if with_refractive:
        mats.append(
            {"type": "refractive", "ior": 1.5, "smooth_shading": True}
        )

    for i in range(num_quads):
        c = rng.uniform(-6, 6, 3)
        c[1] = rng.uniform(-1.5, 3.0)
        c[2] = -abs(c[2]) - 3.0
        s = rng.uniform(0.4, 1.2)
        v = np.array(
            [c + [-s, -s, 0], c + [s, -s, 0], c + [0, s, 0]], np.float32
        )
        objects.append(
            {
                "material_index": int(rng.integers(1, len(mats))),
                "vertices": v.reshape(-1).tolist(),
                "triangles": [0, 1, 2],
            }
        )

    data = {
        "settings": {
            "background_color": [0.1, 0.2, 0.3],
            "image_settings": {"width": width, "height": height},
            "gi_on": gi_on,
        },
        "camera": {
            "matrix": [1, 0, 0, 0, 1, 0, 0, 0, 1],
            "position": [0, 0, 6],
        },
        "lights": [
            {"intensity": 800, "position": [3, 6, 2]},
            {"intensity": 300, "position": [-4, 5, -1]},
        ],
        "materials": mats,
        "objects": objects,
    }
    return scene_from_dict(data)
