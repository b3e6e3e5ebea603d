"""Early-era procedural goldens (tasks 02-03) reproduce BIT-EXACTLY."""

import numpy as np
import pytest
from PIL import Image

from crt_tpu.io.ppm import quantize
from crt_tpu.utils.era import ERA_CASES


@pytest.mark.parametrize("name,fn", ERA_CASES, ids=[c[0] for c in ERA_CASES])
def test_era_golden_bit_exact(golden_dir, name, fn):
    with Image.open(golden_dir / f"{name}.png") as im:
        golden = np.asarray(im.convert("RGB"), np.int32)
    h, w = golden.shape[:2]
    render = quantize(fn(w, h)).astype(np.int32)
    mismatch = int((render != golden).any(axis=-1).sum())
    assert mismatch == 0, f"{name}: {mismatch} mismatched pixels"
