"""Octree occupancy serialization: exact roundtrip, malformed-input rejection."""

import numpy as np
import pytest

from raht3dgs_tpu.ops.octree import (
    octree_deserialize,
    octree_serialize,
    occupancy_level_sizes,
)


def _random_codes(rng, n, depth):
    hi = 1 << (3 * depth)
    if hi <= 1 << 62:
        c = rng.integers(0, hi, size=n * 2, dtype=np.int64).astype(np.uint64)
    else:  # depth 21: 63-bit range
        c = rng.integers(0, 1 << 62, size=n * 2, dtype=np.int64).astype(
            np.uint64
        ) | (rng.integers(0, 2, size=n * 2).astype(np.uint64) << np.uint64(62))
    c = np.unique(c)[:n]
    return c


@pytest.mark.parametrize("depth", [1, 2, 4, 10, 21])
@pytest.mark.parametrize("n", [1, 2, 7, 500])
def test_roundtrip(depth, n):
    rng = np.random.default_rng(depth * 1000 + n)
    codes = _random_codes(rng, n, depth)
    occ = octree_serialize(codes, depth)
    back = octree_deserialize(occ, depth)
    np.testing.assert_array_equal(back, codes)
    sizes = occupancy_level_sizes(occ, depth)
    assert sizes[0] == 1 and sizes.sum() == occ.size


def test_roundtrip_dense_block():
    # fully occupied 2-level octree: 64 leaves, occupancy all 0xFF
    depth = 2
    codes = np.arange(64, dtype=np.uint64)
    occ = octree_serialize(codes, depth)
    assert occ.size == 1 + 8 and np.all(occ == 0xFF)
    np.testing.assert_array_equal(octree_deserialize(occ, depth), codes)


def test_roundtrip_int32_codes():
    # the J<=10 pipeline tier hands int32 codes to the serializer
    depth = 5
    codes = np.array([0, 3, 9, 1000, 32767], dtype=np.int32)
    occ = octree_serialize(codes, depth)
    back = octree_deserialize(occ, depth, dtype=np.int32)
    np.testing.assert_array_equal(back, codes)
    assert back.dtype == np.int32


def test_serialize_rejects_bad_input():
    with pytest.raises(ValueError, match="strictly increasing"):
        octree_serialize(np.array([1, 1, 2], dtype=np.uint64), 2)
    with pytest.raises(ValueError, match="strictly increasing"):
        octree_serialize(np.array([5, 3], dtype=np.uint64), 2)
    with pytest.raises(ValueError, match="negative"):
        octree_serialize(np.array([-1, 3], dtype=np.int64), 2)
    with pytest.raises(ValueError, match="exceed"):
        octree_serialize(np.array([0, 64], dtype=np.uint64), 2)
    with pytest.raises(ValueError, match="empty"):
        octree_serialize(np.array([], dtype=np.uint64), 2)


def test_deserialize_rejects_corruption():
    codes = np.array([0, 7, 42], dtype=np.uint64)
    occ = octree_serialize(codes, 2)
    with pytest.raises(ValueError, match="truncated"):
        octree_deserialize(occ[:-1], 2)
    with pytest.raises(ValueError, match="trailing"):
        octree_deserialize(np.concatenate([occ, [1]]), 2)
    bad = occ.copy()
    bad[0] = 0
    with pytest.raises(ValueError, match="zero byte"):
        octree_deserialize(bad, 2)
    # depth mismatch parses as truncation/trailing, never silently
    with pytest.raises(ValueError):
        octree_deserialize(occ, 3)


def test_surface_cloud_beats_raw_codes():
    # occupancy bytes beat raw 3*J-bit codes on *correlated* geometry
    # (real clouds are surfaces; sparse uniform noise is the worst case
    # and legitimately doesn't compress without the entropy stage)
    from raht3dgs_tpu.ops.morton import morton_encode
    import jax.numpy as jnp

    depth = 8
    u = np.linspace(0, np.pi, 80)
    v = np.linspace(0, 2 * np.pi, 160)
    uu, vv = np.meshgrid(u, v)
    r = 100.0
    pts = np.stack(
        [
            128 + r * np.sin(uu) * np.cos(vv),
            128 + r * np.sin(uu) * np.sin(vv),
            128 + r * np.cos(uu),
        ],
        axis=-1,
    ).reshape(-1, 3)
    V = np.unique(np.clip(pts.astype(np.int64), 0, 255), axis=0)
    codes = np.unique(np.asarray(morton_encode(jnp.asarray(V), depth)))
    occ = octree_serialize(codes, depth)
    np.testing.assert_array_equal(
        octree_deserialize(occ, depth, dtype=codes.dtype), codes
    )
    assert occ.size * 8 < codes.size * 3 * depth
