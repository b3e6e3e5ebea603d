"""PCG32 bit-exactness against a pure-python port of crt_random.h."""

import numpy as np
import jax.numpy as jnp

from crt_tpu.ops import rng as rng_mod

M64 = (1 << 64) - 1


class RefPCG32:
    """Port of crt_random.h:10-43."""

    def __init__(self, state=0, inc=0):
        self.state = state
        self.inc = inc

    def next(self):
        old = self.state
        self.state = (old * 6364136223846793005 + self.inc) & M64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def uniform(self):
        bits = 0x3F800000 | (self.next() >> 9)
        return np.uint32(bits).view(np.float32) - 1.0


def ref_make_pcg(x, y):
    seed = ((x << 32) | y) & M64
    r = RefPCG32()
    r.state = 0
    r.inc = ((seed << 1) | 1) & M64
    r.next()
    r.state = (r.state + seed) & M64
    r.next()
    return r


def test_sequence_matches_reference():
    xs = np.array([0, 1, 827, 1919, 123456], np.uint32)
    ys = np.array([0, 2, 410, 1079, 654321], np.uint32)
    state = rng_mod.make_pcg(jnp.asarray(xs), jnp.asarray(ys))

    refs = [ref_make_pcg(int(x), int(y)) for x, y in zip(xs, ys)]
    for draw in range(20):
        vals, state = rng_mod.uniform(state)
        expect = np.array([r.uniform() for r in refs], np.float32)
        np.testing.assert_array_equal(np.asarray(vals), expect), draw


def test_masked_advancement():
    xs = jnp.asarray(np.array([5, 7], np.uint32))
    ys = jnp.asarray(np.array([9, 11], np.uint32))
    state = rng_mod.make_pcg(xs, ys)

    active = jnp.asarray([True, False])
    v1, state = rng_mod.uniform(state, active)
    v2, state = rng_mod.uniform(state, jnp.asarray([True, True]))

    r0 = ref_make_pcg(5, 9)
    r1 = ref_make_pcg(7, 11)
    assert float(v1[0]) == float(np.float32(r0.uniform()))
    assert float(v2[0]) == float(np.float32(r0.uniform()))
    # lane 1 did not advance on the masked draw
    assert float(v2[1]) == float(np.float32(r1.uniform()))
