"""Golden-image pixel parity in CI (CPU-feasible subset).

Full-res renders of the course scenes small enough for the CPU test backend
(a few triangles).  The complete sweep incl. 4k-triangle scenes runs on TPU
via tools/golden_check.py.
"""

import numpy as np
import pytest

from crt_tpu import RenderSettings, load_scene, render_image
from crt_tpu.utils import golden
from tests.conftest import golden_match_stats, load_golden

CPU_CASES = [
    ("07-01-scene/scene0.crtscene", "07-01-scene-scene0", {}, 0.999),
    ("12-01-textures/scene0.crtscene", "12-01-textures-scene0", {}, 0.995),
    ("12-01-textures/scene1.crtscene", "12-01-textures-scene1", {}, 0.995),
    ("12-01-textures/scene2.crtscene", "12-01-textures-scene2", {}, 0.995),
    ("12-01-textures/scene3.crtscene", "12-01-textures-scene3", {}, 0.98),
]


@pytest.mark.parametrize("rel,name,overrides,threshold", CPU_CASES,
                         ids=[c[1] for c in CPU_CASES])
def test_golden_parity_cpu(scenes_dir, golden_dir, rel, name, overrides,
                           threshold):
    scene = load_scene(str(scenes_dir / rel))
    img = np.asarray(render_image(scene, RenderSettings(**overrides)))
    frac, mae = golden_match_stats(img, load_golden(name))
    assert frac >= threshold, f"{name}: frac={frac:.4f} mae={mae:.5f}"
