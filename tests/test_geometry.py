"""Geometry entropy coder: roundtrips, backend byte-identity, corruption.

The automaton in native/geom.cpp and codec/_geom_py.py is frozen stream
format (geometry profile 0) — these tests pin the two backends to each
other byte-for-byte and the roundtrip to exactness.
"""

import numpy as np
import pytest

from raht3dgs_tpu.codec import _geom_py, geometry
from raht3dgs_tpu.ops.octree import octree_serialize


def _random_codes(rng, n, depth):
    hi = min(1 << (3 * depth), 1 << 62)
    c = rng.integers(0, hi, size=n * 2, dtype=np.int64).astype(np.uint64)
    return np.unique(c)[:n]


def _surface_codes(depth, n=4000, seed=3):
    from raht3dgs_tpu.ops.morton import morton_encode
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    half = 1 << (depth - 1)
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = 0.8 * half + rng.normal(0, 1.0, n)
    pts = np.stack(
        [
            half + r * np.sin(theta) * np.cos(phi),
            half + r * np.sin(theta) * np.sin(phi),
            half + r * np.cos(theta),
        ],
        -1,
    )
    V = np.unique(np.clip(pts, 0, 2 * half - 1).astype(np.int64), axis=0)
    return np.unique(np.asarray(morton_encode(jnp.asarray(V), depth)))


@pytest.mark.parametrize("depth", [1, 3, 10, 21])
@pytest.mark.parametrize("n", [1, 5, 300])
def test_roundtrip_random(depth, n):
    rng = np.random.default_rng(depth * 100 + n)
    codes = _random_codes(rng, n, depth)
    sec = geometry.encode_geometry(codes, depth)
    back = geometry.decode_geometry(sec, depth, codes.size, dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)


def test_roundtrip_surface_and_rate():
    depth = 8
    codes = _surface_codes(depth)
    sec = geometry.encode_geometry(codes, depth)
    back = geometry.decode_geometry(sec, depth, codes.size, dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)
    # entropy coding must beat both raw codes and uncoded occupancy bytes
    occ = octree_serialize(codes, depth)
    assert len(sec) < occ.size
    assert len(sec) * 8 < codes.size * 3 * depth


def test_default_dtype_matches_morton_tier():
    codes10 = _surface_codes(10, n=500)
    sec = geometry.encode_geometry(codes10, 10)
    assert geometry.decode_geometry(sec, 10, codes10.size).dtype == np.int32
    codes12 = _random_codes(np.random.default_rng(0), 100, 12)
    sec = geometry.encode_geometry(codes12, 12)
    assert geometry.decode_geometry(sec, 12, 100).dtype == np.int64


def test_backend_byte_identity():
    if not geometry.native_available():
        pytest.skip("native geometry coder unavailable")
    for depth, n, seed in [(2, 3, 0), (6, 200, 1), (10, 2000, 2), (21, 64, 3)]:
        codes = _random_codes(np.random.default_rng(seed), n, depth)
        occ = octree_serialize(codes, depth)
        nat = geometry._encode_occ(occ, depth)
        py = _geom_py.encode(occ, depth)
        assert nat == py, f"encoder mismatch at depth={depth} n={n}"
        # python decoder reads the native stream and vice versa
        cap = codes.size * depth + 1
        np.testing.assert_array_equal(_geom_py.decode(nat, depth, cap), occ)
        np.testing.assert_array_equal(
            geometry._decode_occ(py, depth, cap), occ
        )


def test_python_fallback_roundtrip(monkeypatch):
    monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
    codes = _surface_codes(6, n=800)
    sec = geometry.encode_geometry(codes, 6)
    back = geometry.decode_geometry(sec, 6, codes.size, dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)


def test_decode_rejects_corruption():
    codes = _surface_codes(8, n=1000)
    sec = geometry.encode_geometry(codes, 8)
    # wrong leaf count in the header
    with pytest.raises(ValueError, match="corrupt|capacity|exceeds"):
        geometry.decode_geometry(sec, 8, codes.size - 5)
    # unknown profile byte
    with pytest.raises(ValueError, match="profile"):
        geometry.decode_geometry(b"\x07" + sec[1:], 8, codes.size)
    # empty section
    with pytest.raises(ValueError, match="empty"):
        geometry.decode_geometry(b"", 8, codes.size)
    # garbage payload must raise, never return wrong geometry silently
    rng = np.random.default_rng(0)
    garbage = bytes([0]) + rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    with pytest.raises(ValueError):
        geometry.decode_geometry(garbage, 8, codes.size)


def test_encode_rejects_bad_walk():
    # occupancy byte array inconsistent with the self-framing walk
    with pytest.raises(ValueError):
        geometry._encode_occ(np.array([3, 1], dtype=np.uint8), 3)
    with pytest.raises(ValueError):
        geometry._encode_occ(np.array([0], dtype=np.uint8), 1)
