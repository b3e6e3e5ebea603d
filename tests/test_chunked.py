"""Chunked (bucket) rendering matches whole-frame rendering."""

import numpy as np

from crt_tpu import RenderSettings, render_image
from crt_tpu.scene.procedural import make_test_scene


def test_chunked_matches_whole_frame():
    scene = make_test_scene(width=64, height=40, num_quads=6,
                            with_reflective=True)
    whole = np.asarray(render_image(scene, RenderSettings()))
    chunked = np.asarray(
        render_image(scene, RenderSettings(chunk_pixels=512))
    )
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-7)


def test_chunked_gi_scene():
    # kept tiny: the unrolled GI graph inside a chunked lax.map body is
    # compile-heavy on the CPU test backend
    scene = make_test_scene(width=16, height=16, num_quads=2, gi_on=True,
                            with_reflective=False)
    st = RenderSettings(diffuse_reflection_ray_count=1, max_ray_depth=1)
    whole = np.asarray(render_image(scene, st))
    chunked = np.asarray(
        render_image(scene, st.replace(chunk_pixels=128))
    )
    # GI uses per-pixel counter RNG -> chunking must not change samples
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-7)
    assert np.isfinite(whole).all()
