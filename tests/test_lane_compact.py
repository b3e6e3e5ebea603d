"""Occupancy lane compaction (round 5): bit-exact parity + permutation.

The transmissive shadow march and the iter pool's bounce traces permute
active lanes to the front before tracing (shade.lane_partition) so sparse
wavefronts form dead tiles the binned launch skips.  These tests pin:

  - lane_partition is a stable partition (actives first, original order
    kept, pos/perm mutually inverse);
  - a refractive render with transmissive shadows is BIT-IDENTICAL with
    compaction on vs off (both the march compaction and the pool trace
    compaction), through the pallas backend in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crt_tpu import RenderSettings, render_image
from crt_tpu.ops import shade as shade_mod
from crt_tpu.ops import shade_iter as shade_iter_mod
from crt_tpu.ops.shade import lane_partition
from crt_tpu.scene.procedural import make_test_scene


def test_lane_partition_stable_inverse():
    rng = np.random.default_rng(7)
    for n, p_act in ((16, 0.3), (1024, 0.05), (2048, 0.9), (64, 0.0), (64, 1.0)):
        alive = jnp.asarray(rng.uniform(size=n) < p_act)
        pos, perm = jax.jit(lane_partition)(alive)
        pos = np.asarray(pos)
        perm = np.asarray(perm)
        a = np.asarray(alive)
        n_act = int(a.sum())
        # mutually inverse permutations
        assert sorted(pos) == list(range(n))
        np.testing.assert_array_equal(perm[pos], np.arange(n))
        np.testing.assert_array_equal(pos[perm], np.arange(n))
        # actives first, stable (original order preserved within each class)
        np.testing.assert_array_equal(perm[:n_act], np.nonzero(a)[0])
        np.testing.assert_array_equal(perm[n_act:], np.nonzero(~a)[0])


@pytest.mark.parametrize("flag", ["march", "pool"])
def test_refractive_render_bit_identical_with_compaction(flag, monkeypatch):
    """Transmissive-shadow refractive render: compaction on == off, bitwise.

    A/B by patching the module globals (trace-time reads), never by
    reloading (NamedTuple identities).  Pallas backend in interpret mode so
    the binned launch (whose tile skipping the compaction feeds) is the one
    under test.
    """
    import crt_tpu.renderer as renderer
    from crt_tpu.ops.pallas_trace import make_pallas_trace_fn

    orig = renderer.make_trace_fn

    def patched(scn, settings):
        if settings.backend == "pallas":
            return make_pallas_trace_fn(scn, interpret=True)
        return orig(scn, settings)

    monkeypatch.setattr(renderer, "make_trace_fn", patched)

    scene = make_test_scene(width=64, height=32, num_quads=6,
                            with_refractive=True)
    settings = RenderSettings(backend="pallas", max_ray_depth=3,
                              wavefront="iter")

    monkeypatch.setattr(shade_mod, "_SHADOW_COMPACT", flag == "march")
    monkeypatch.setattr(shade_iter_mod, "_POOL_COMPACT", flag == "pool")
    img_on = np.asarray(render_image(scene, settings, jit=False))

    monkeypatch.setattr(shade_mod, "_SHADOW_COMPACT", False)
    monkeypatch.setattr(shade_iter_mod, "_POOL_COMPACT", False)
    img_off = np.asarray(render_image(scene, settings, jit=False))

    assert np.isfinite(img_on).all()
    np.testing.assert_array_equal(img_on, img_off)
