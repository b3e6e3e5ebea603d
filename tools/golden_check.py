"""Render every golden-covered scene and report pixel-match stats.

Runs on whatever backend jax picks (TPU in this environment).  Usage:

    python tools/golden_check.py [case-substring ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crt_tpu import RenderSettings, load_scene, render_image
from crt_tpu.utils import golden


def main(argv):
    from crt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    filters = [a for a in argv if not a.startswith("-")]
    cases = golden.LEGACY_GOLDEN_CASES + golden.HEAD_GOLDEN_CASES
    if filters:
        cases = [c for c in cases if any(f in c[0] for f in filters)]

    results = []
    for rel, name, overrides in cases:
        path = golden.SCENES / rel
        t0 = time.time()
        try:
            overrides = dict(overrides)
            aov = overrides.pop("aov", None)
            scene = load_scene(str(path))
            if aov:
                from crt_tpu.renderer import render_aov

                img = np.asarray(
                    render_aov(scene, RenderSettings(**overrides), aov=aov)
                )
            else:
                img = np.asarray(render_image(scene, RenderSettings(**overrides)))
            frac, mae = golden.match_stats(img, golden.load_golden(name))
            dt = time.time() - t0
            print(f"{name}: frac={frac:.4f} mae={mae:.5f} t={dt:.1f}s", flush=True)
            results.append((name, frac, mae))
        except Exception as e:  # noqa
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            results.append((name, 0.0, 1.0))

    worst = min(results, key=lambda r: r[1]) if results else None
    print(f"\n{len(results)} cases, worst: {worst}")


if __name__ == "__main__":
    main(sys.argv[1:])
