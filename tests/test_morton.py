import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.ops.morton import morton_encode, morton_decode, pad_code
from raht3dgs_tpu.ops.prelude import morton_codes_np


def test_roundtrip(rng):
    for depth in (1, 4, 10, 18, 21):
        V = rng.integers(0, 2**depth, size=(500, 3))
        codes = morton_encode(jnp.asarray(V), depth)
        back = morton_decode(codes, depth)
        np.testing.assert_array_equal(np.asarray(back), V)


def test_matches_looped_reference(rng):
    for depth in (3, 10, 18):
        V = rng.integers(0, 2**depth, size=(1000, 3))
        fast = np.asarray(morton_encode(jnp.asarray(V), depth))
        ref = morton_codes_np(V, depth)
        np.testing.assert_array_equal(fast, ref)


def test_bit_layout():
    # digit = z + 2y + 4x at each 3-bit group (voxelize_pc.py:52-57)
    V = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    codes = np.asarray(morton_encode(V, 4))
    assert codes.tolist() == [4, 2, 1]


def test_monotone_in_each_axis(rng):
    V = rng.integers(0, 2**10, size=(200, 3))
    c1 = np.asarray(morton_encode(jnp.asarray(V), 10))
    c2 = np.asarray(morton_encode(jnp.asarray(V + 0), 10))
    np.testing.assert_array_equal(c1, c2)


def test_pad_codes_above_real_range():
    depth, n = 4, 1000
    slots = jnp.arange(n)
    pads = np.asarray(pad_code(depth, n, slots))
    assert pads.min() > (1 << (3 * depth)) - 1
    assert len(np.unique(pads)) == n
