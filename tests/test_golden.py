"""Golden-image pixel parity in CI (CPU-feasible subset).

Full-res renders of the course scenes small enough for the CPU test backend
(≤ ~10 triangles, no deep refractive branching).  Settings profiles come
from crt_tpu.utils.golden so CI stays in sync with the per-golden reference
bug archaeology; the complete sweep incl. 4k-triangle scenes runs on TPU
via tools/golden_check.py.
"""

import numpy as np
import pytest

from crt_tpu import RenderSettings, load_scene, render_image
from crt_tpu.utils import golden
from tests.conftest import golden_match_stats, load_golden

_ALL_CASES = {
    name: (rel, overrides)
    for rel, name, overrides in (
        golden.LEGACY_GOLDEN_CASES + golden.HEAD_GOLDEN_CASES
    )
}

# (golden name, frac threshold).  Thresholds track the published TPU sweep
# (99.44-100 %) with slack for CPU-vs-TPU f32 rounding; 12-01-scene3 carries
# the documented irreducible stb-vs-PIL JPEG decode residual.
CPU_CASES = [
    ("07-01-scene-scene0", 0.999),
    ("07-01-scene-scene1", 0.999),  # era half-lambert (ERA07_LIGHT_DIR)
    ("07-01-scene-scene2", 0.999),
    ("07-01-scene-scene3", 0.999),
    # scene4 (4,012 tris at 1080p) is TPU-sweep only: ~2 min brute force on
    # the CPU test backend.  TPU sweep: 1.0000.
    ("09-01-barycentric-coordinates-scene0", 0.999),
    ("08-01-light-scene0", 0.995),
    ("12-01-textures-scene0", 0.995),
    ("12-01-textures-scene1", 0.995),
    ("12-01-textures-scene2", 0.995),
    ("12-01-textures-scene3", 0.98),
    ("12-01-textures-scene4", 0.995),
    ("14-01-acceleration-tree-scene0", 0.995),
]


@pytest.mark.parametrize("name,threshold", CPU_CASES,
                         ids=[c[0] for c in CPU_CASES])
def test_golden_parity_cpu(scenes_dir, golden_dir, name, threshold):
    rel, overrides = _ALL_CASES[name]
    scene = load_scene(str(scenes_dir / rel))
    img = np.asarray(render_image(scene, RenderSettings(**overrides)))
    frac, mae = golden_match_stats(img, load_golden(name))
    assert frac >= threshold, f"{name}: frac={frac:.4f} mae={mae:.5f}"
