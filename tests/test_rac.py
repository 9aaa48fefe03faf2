"""RAC attribute entropy coder: backend byte-identity, roundtrips, prefix
decodes, chunked layout, and the rate claim vs RLGR.

The RAC stream format (native/rac.cpp == codec/_rac_py.py) is FROZEN —
byte-identity between the two backends pins the automaton exactly like
the geometry coder's tests do; evolve the model only behind a new
leading profile byte.
"""

import numpy as np
import pytest

from raht3dgs_tpu.codec import _rac_py
from raht3dgs_tpu.codec.rac import (
    native_available,
    rac_decode,
    rac_decode_channels,
    rac_decode_chunked,
    rac_encode,
    rac_encode_channels,
    rac_encode_chunked,
)


def _laplace_stream(rng, n, scale, zero_frac):
    q = rng.laplace(0, scale, n).astype(np.int32)
    q[rng.random(n) < zero_frac] = 0
    return q


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def test_roundtrip_fuzz(rng):
    for _ in range(20):
        n = int(rng.integers(1, 20000))
        q = _laplace_stream(rng, n, float(rng.uniform(0.1, 2000)),
                            float(rng.uniform(0.1, 0.95)))
        s, _ = rac_encode(q)
        got, _ = rac_decode(s, n)
        np.testing.assert_array_equal(got, q)


def test_int32_extremes_roundtrip():
    q = np.array(
        [np.iinfo(np.int32).min, np.iinfo(np.int32).max, -3, 3, 0, -1, 1,
         2, -2, 0], np.int32,
    )
    s, _ = rac_encode(q)
    got, _ = rac_decode(s, len(q))
    np.testing.assert_array_equal(got, q)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_backend_byte_identity(rng):
    """The Python mirror and the native coder are the same automaton."""
    for n in (1, 2, 100, 5000):
        q = _laplace_stream(rng, n, 300.0, 0.6)
        sn, _ = rac_encode(q, backend="native")
        sp, _ = rac_encode(q, backend="python")
        assert sn == sp
        dn, _ = rac_decode(sn, n, backend="native")
        dp, _ = rac_decode(sn, n, backend="python")
        np.testing.assert_array_equal(dn, q)
        np.testing.assert_array_equal(dp, q)


def test_prefix_decode_matches_full(rng):
    n = 9000
    q = _laplace_stream(rng, n, 40.0, 0.7)
    s, _ = rac_encode(q)
    for k in (1, 7, n // 3, n - 1, n):
        got, _ = rac_decode(s, k, n)
        np.testing.assert_array_equal(got, q[:k])


def test_prefix_requires_n_total(rng):
    """Prefix decode with the wrong n_total must be able to mis-bucket —
    the API contract (n, n_total) exists because buckets derive from the
    FULL stream length. This pins that the parameter is actually used:
    decoding with n_total=n_prefix either differs or (rarely) coincides,
    but decoding with the true n_total always matches."""
    rng2 = np.random.default_rng(7)
    n = 20000
    q = (rng2.laplace(0, 900, n)).astype(np.int32)  # remainder-heavy
    s, _ = rac_encode(q)
    k = 300
    right, _ = rac_decode(s, k, n)
    np.testing.assert_array_equal(right, q[:k])


def test_chunked_roundtrip_and_prefix(rng):
    n = 2500
    q = _laplace_stream(rng, n, 500.0, 0.4)
    s, _ = rac_encode_chunked(q, chunk=1000)  # chunks 1000/1000/500
    full, _ = rac_decode_chunked(s, n, n)
    np.testing.assert_array_equal(full, q)
    # prefix ending inside the SHORT final chunk: bucket table must come
    # from the chunk's true encoded length (500), not the nominal 1000
    got, _ = rac_decode_chunked(s, 2300, n)
    np.testing.assert_array_equal(got, q[:2300])
    got, _ = rac_decode_chunked(s, 999, n)
    np.testing.assert_array_equal(got, q[:999])


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_channels_batch_matches_per_stream(rng):
    """The one-call native batch path is byte-identical to per-stream
    composition (RAHT3DGS_RAC_BATCH=0), chunked and not."""
    import os

    for chunk, D, n, pad in ((0, 3, 7777, 8192), (1000, 3, 7777, 8192),
                             (0, 56, 3001, 4096), (512, 56, 3001, 4096)):
        q = rng.laplace(0, 50, (D, pad)).astype(np.int32)
        q[:, n:] = 0
        batch, _ = rac_encode_channels(q, channel_major=True, chunk=chunk,
                                       n=n)
        os.environ["RAHT3DGS_RAC_BATCH"] = "0"
        try:
            per, _ = rac_encode_channels(q, channel_major=True, chunk=chunk,
                                         n=n)
        finally:
            del os.environ["RAHT3DGS_RAC_BATCH"]
        assert batch == per
        out = np.zeros((D, pad), np.int32)
        rac_decode_channels(batch, n, out, chunk=chunk, n_total=n)
        np.testing.assert_array_equal(out[:, :n], q[:, :n])


def test_corrupt_stream_fails_cleanly(rng):
    q = _laplace_stream(rng, 500, 30.0, 0.5)
    s, _ = rac_encode(q)
    with pytest.raises(ValueError):
        rac_decode(b"\xff" + s[1:], 500)  # unknown profile byte
    with pytest.raises(ValueError):
        rac_decode(b"", 500)
    # hostile payload bytes must not crash (values are garbage, bounded)
    bad = s[: 1 + 4] + bytes(reversed(s[5:]))
    out, _ = rac_decode(bad, 500)
    assert out.shape == (500,)


def test_rate_beats_rlgr_on_laplacian(rng):
    """The motivating measurement, pinned at a modest size: adaptive
    binary coding beats RLGR on sparse Laplacian streams (the RD-grid
    regime; scripts/exp_attr_contexts.py measured -7..-13% across the
    reference grid on transform output)."""
    from raht3dgs_tpu.codec.rlgr import rlgr_encode

    n = 60000
    q = _laplace_stream(rng, n, 2.0, 0.65)
    rac_bytes = len(rac_encode(q)[0])
    rlgr_bytes = len(rlgr_encode(q, signed=True)[0])
    assert rac_bytes < rlgr_bytes


def test_python_mirror_guards():
    with pytest.raises(ValueError):
        _rac_py.rac_decode_py(b"\x00" * 10, 5, 3)  # n_decode > n_total
    with pytest.raises(ValueError):
        _rac_py.rac_decode_py(b"\x07" + b"\x00" * 8, 1, 1)  # bad profile
