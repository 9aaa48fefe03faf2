import numpy as np
import pytest

from raht3dgs_tpu.codec import rlgr
from raht3dgs_tpu.codec import _rlgr_py


CASES = [
    np.array([], dtype=np.int64),
    np.zeros(1, dtype=np.int64),
    np.zeros(1000, dtype=np.int64),
    np.ones(1, dtype=np.int64),
    np.array([5], dtype=np.int64),
    np.array([-3, 0, 0, 0, 7, 0, 0, -1], dtype=np.int64),
    np.arange(-50, 50, dtype=np.int64),
]


def _random_cases(rng):
    out = []
    # dense small values
    out.append(rng.integers(-10, 10, size=2000))
    # sparse (RAHT-like): mostly zeros with occasional large coefficients
    x = np.zeros(5000, dtype=np.int64)
    idx = rng.integers(0, 5000, size=200)
    x[idx] = rng.integers(-1000, 1000, size=200)
    out.append(x)
    # very sparse long runs
    x = np.zeros(20000, dtype=np.int64)
    x[rng.integers(0, 20000, size=10)] = rng.integers(-5, 5, size=10)
    out.append(x)
    # large magnitudes triggering the 32-bit GR escape
    out.append(rng.integers(-(2**30), 2**30, size=500))
    # geometric-ish distribution
    out.append((rng.geometric(0.05, size=3000) - 1) * rng.choice([-1, 1], 3000))
    return [a.astype(np.int64) for a in out]


def test_python_roundtrip(rng):
    for seq in CASES + _random_cases(rng):
        data = _rlgr_py.encode(seq.tolist(), signed=True)
        out = _rlgr_py.decode(data, len(seq), signed=True)
        np.testing.assert_array_equal(np.asarray(out, dtype=np.int64), seq)


def test_python_roundtrip_unsigned(rng):
    seq = np.abs(rng.integers(0, 1000, size=1000)).astype(np.int64)
    data = _rlgr_py.encode(seq.tolist(), signed=False)
    out = _rlgr_py.decode(data, len(seq), signed=False)
    np.testing.assert_array_equal(np.asarray(out, dtype=np.int64), seq)


@pytest.mark.skipif(not rlgr.native_available(), reason="native lib unavailable")
def test_native_roundtrip(rng):
    for seq in CASES + _random_cases(rng):
        data, _ = rlgr.rlgr_encode(seq, backend="native")
        out, _ = rlgr.rlgr_decode(data, len(seq), backend="native")
        np.testing.assert_array_equal(out, seq)


@pytest.mark.skipif(not rlgr.native_available(), reason="native lib unavailable")
def test_native_matches_python_bytes(rng):
    for seq in CASES + _random_cases(rng):
        native, _ = rlgr.rlgr_encode(seq, backend="native")
        pure = _rlgr_py.encode(seq.tolist(), signed=True)
        assert native == pure, f"stream mismatch for n={len(seq)}"


@pytest.mark.skipif(not rlgr.native_available(), reason="native lib unavailable")
def test_cross_backend_decode(rng):
    seq = rng.integers(-100, 100, size=3000).astype(np.int64)
    data, _ = rlgr.rlgr_encode(seq, backend="python")
    out, _ = rlgr.rlgr_decode(data, len(seq), backend="native")
    np.testing.assert_array_equal(out, seq)


def test_membuf_compat_api(rng):
    seq = rng.integers(-50, 50, size=500).tolist()
    w = rlgr.MemBuf()
    ns = w.rlgrWrite(seq, 1)
    assert ns > 0
    w.close()
    buf = w.get_buffer()
    assert w.buffer_size() == len(buf)
    r = rlgr.MemBuf(buf)
    ns, out = r.rlgrRead(len(seq), 1)
    assert out == seq


def test_compression_is_effective(rng):
    # Sparse RAHT-like coefficients should compress far below raw int32 size.
    x = np.zeros(10000, dtype=np.int64)
    x[rng.integers(0, 10000, size=100)] = rng.integers(-300, 300, size=100)
    data, _ = rlgr.rlgr_encode(x)
    assert len(data) < 10000 * 4 / 10


def test_membuf_gr_single_codeword():
    w = rlgr.MemBuf()
    w.grWrite(77, 3)
    r = rlgr.MemBuf(w.get_buffer())
    assert r.grRead(3) == 77
    # escape path
    w2 = rlgr.MemBuf()
    w2.grWrite(10**6, 0)
    r2 = rlgr.MemBuf(w2.get_buffer())
    assert r2.grRead(0) == 10**6


# -- chunked (parallel) entropy layout ---------------------------------------

def test_chunked_roundtrip(rng):
    from raht3dgs_tpu.codec.rlgr import rlgr_decode_chunked, rlgr_encode_chunked

    for n, chunk in [(10, 4), (1000, 256), (5000, 5000), (4096, 65536), (0, 8)]:
        v = (rng.standard_normal(n) * 20).astype(np.int32)
        stream, _ = rlgr_encode_chunked(v, chunk=chunk)
        out, _ = rlgr_decode_chunked(stream, n)
        np.testing.assert_array_equal(out[:n], v)


def test_chunked_matches_independent_encodes(rng):
    # automaton resets at boundaries: each chunk is byte-identical to a
    # standalone encode of that slice
    import struct

    from raht3dgs_tpu.codec.rlgr import rlgr_encode, rlgr_encode_chunked

    v = (rng.standard_normal(1000) * 50).astype(np.int32)
    chunk = 300
    stream, _ = rlgr_encode_chunked(v, chunk=chunk)
    cs, n_chunks = struct.unpack_from("<II", stream, 0)
    assert (cs, n_chunks) == (chunk, 4)
    lens = struct.unpack_from("<4I", stream, 8)
    off = 8 + 16
    for i in range(4):
        part = stream[off:off + lens[i]]
        ref, _ = rlgr_encode(v[i * chunk:(i + 1) * chunk])
        assert part == ref
        off += lens[i]


def test_chunked_overhead_small(rng):
    from raht3dgs_tpu.codec.rlgr import rlgr_encode, rlgr_encode_chunked

    v = (rng.standard_normal(200_000) * 8).astype(np.int32)
    seq, _ = rlgr_encode(v)
    chk, _ = rlgr_encode_chunked(v, chunk=65536)
    assert len(chk) < len(seq) * 1.01  # <1% rate cost at 64Ki chunks


def test_pipeline_chunked_roundtrip(rng):
    from conftest import unique_voxel_cloud
    from raht3dgs_tpu.codec.bitstream import FrameStream
    from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame

    depth = 5
    pts, _, attrs = unique_voxel_cloud(rng, 700, depth)
    frame = prepare_voxel_frame(pts, attrs * 30, depth, bucket=1024)

    plain = AttributeCodec(depth).encode(frame, steps=2.0)
    chunked = AttributeCodec(depth, chunk=256).encode(frame, steps=2.0)
    # container survives serialization with the chunk field intact
    rt = FrameStream.from_bytes(chunked.stream.to_bytes())
    assert rt.chunk == 256 and plain.stream.chunk == 0

    dec_codec = AttributeCodec(depth)
    rec_plain, _ = dec_codec.decode(plain.stream, frame.codes, frame.weights)
    rec_chunked, _ = dec_codec.decode(rt, frame.codes, frame.weights)
    np.testing.assert_array_equal(rec_plain, rec_chunked)


def test_adversarial_patterns_match_python_golden(rng):
    # Edge patterns aimed at the optimized bit-IO paths: escape codewords
    # (q >= 32), INT32 extremes, long runs with single-symbol bursts,
    # alternating signs, and flush-boundary lengths.
    from raht3dgs_tpu.codec import _rlgr_py
    from raht3dgs_tpu.codec.rlgr import rlgr_decode, rlgr_encode

    patterns = [
        np.zeros(1000, np.int32),
        np.full(100, np.iinfo(np.int32).max, np.int32),
        np.full(100, np.iinfo(np.int32).min, np.int32),
        np.array([0] * 500 + [2**30] + [0] * 500, np.int32),
        np.tile(np.array([1, -1], np.int32), 2000),
        np.array([2**i - 1 for i in range(31)] * 3, np.int32),
        # lengths straddling the 32-bit flush and byte padding
        np.arange(-17, 16, dtype=np.int32),
        np.arange(-16, 16, dtype=np.int32),
        (rng.standard_normal(7) * 1e9).astype(np.int32),
    ]
    for v in patterns:
        s_native, _ = rlgr_encode(v, backend="native")
        s_py = _rlgr_py.encode(v.astype(np.int64).tolist(), signed=True)
        assert s_native == s_py, f"stream mismatch for pattern {v[:8]}"
        out, _ = rlgr_decode(s_native, len(v), backend="native",
                             out=np.empty(len(v), np.int32))
        np.testing.assert_array_equal(out, v)


def test_adversarial_unsigned(rng):
    from raht3dgs_tpu.codec import _rlgr_py
    from raht3dgs_tpu.codec.rlgr import rlgr_decode, rlgr_encode

    for v in [
        np.array([0, 1, 2**31 - 1, 0, 0, 5], np.int32),
        (np.abs(rng.standard_normal(3000)) * 2**28).astype(np.int32),
    ]:
        s_native, _ = rlgr_encode(v, signed=False, backend="native")
        s_py = _rlgr_py.encode(v.astype(np.int64).tolist(), signed=False)
        assert s_native == s_py
        out, _ = rlgr_decode(s_native, len(v), signed=False, backend="native",
                             out=np.empty(len(v), np.int32))
        np.testing.assert_array_equal(out, v)


def test_decoder_never_crashes_on_garbage(rng):
    # Robustness contract: rlgr_decode on arbitrary bytes must terminate
    # and fill exactly n symbols (past-end bits read as zeros) — a malformed
    # or corrupted stream can produce wrong VALUES but never a crash, hang,
    # or buffer overrun.
    from raht3dgs_tpu.codec.rlgr import rlgr_decode

    for trial in range(50):
        m = int(rng.integers(0, 200))
        blob = rng.integers(0, 256, size=m, dtype=np.uint8).tobytes()
        n = int(rng.integers(1, 500))
        out = np.full(n + 8, 123456789, dtype=np.int32)  # canary tail
        rlgr_decode(blob, n, out=out[:n + 8])
        assert np.all(out[n:] == 123456789), "decoder wrote past n"


def test_chunked_decoder_rejects_or_survives_garbage(rng):
    from raht3dgs_tpu.codec.rlgr import rlgr_decode_chunked

    for trial in range(20):
        m = int(rng.integers(8, 100))
        blob = rng.integers(0, 256, size=m, dtype=np.uint8).tobytes()
        try:
            rlgr_decode_chunked(blob, int(rng.integers(1, 100)))
        except Exception:
            pass  # clean Python exception is acceptable; crash/hang is not


def test_concurrent_encodes_are_thread_safe(rng):
    # The native coder keeps all state function-local, so concurrent
    # encode/decode from many threads must produce identical results (the
    # channel/chunk thread pool relies on this; ctypes releases the GIL).
    from concurrent.futures import ThreadPoolExecutor

    from raht3dgs_tpu.codec.rlgr import rlgr_decode, rlgr_encode

    arrays = [
        (rng.standard_normal(20_000) * (3 + i)).astype(np.int32)
        for i in range(8)
    ]
    expected = [rlgr_encode(v)[0] for v in arrays]

    with ThreadPoolExecutor(max_workers=8) as pool:
        for _ in range(5):  # repeated rounds to shake out races
            got = list(pool.map(lambda v: rlgr_encode(v)[0], arrays))
            assert got == expected
            outs = list(pool.map(
                lambda se: rlgr_decode(se[0], len(se[1]),
                                       out=np.empty(len(se[1]), np.int32))[0],
                zip(expected, arrays),
            ))
            for o, v in zip(outs, arrays):
                np.testing.assert_array_equal(o, v)


def test_native_batch_matches_per_stream_paths(rng, monkeypatch):
    """The one-call native batch path must produce byte-identical streams
    and identical decodes vs the per-stream composition, chunked or not."""
    from raht3dgs_tpu.codec.rlgr import (
        native_available,
        rlgr_decode_channels,
        rlgr_encode_channels,
    )

    if not native_available():
        import pytest

        pytest.skip("native backend unavailable")

    for n, chunk in [(10_000, 0), (10_000, 4096), (5, 4096), (4096, 4096),
                     (8193, 4096), (0, 0), (0, 1024)]:
        payload = np.asarray(
            np.round(rng.normal(0, 6, size=(3, n))), dtype=np.int32
        )
        monkeypatch.setenv("RAHT3DGS_RLGR_BATCH", "0")
        ref_streams, _ = rlgr_encode_channels(
            payload, channel_major=True, chunk=chunk
        )
        monkeypatch.setenv("RAHT3DGS_RLGR_BATCH", "1")
        got_streams, _ = rlgr_encode_channels(
            payload, channel_major=True, chunk=chunk
        )
        assert [bytes(a) for a in got_streams] == [bytes(a) for a in ref_streams], (
            n, chunk,
        )

        # decode through both paths into strided outputs (extra columns)
        out_a = np.full((3, n + 7), -1, dtype=np.int32)
        out_b = np.full((3, n + 7), -1, dtype=np.int32)
        monkeypatch.setenv("RAHT3DGS_RLGR_BATCH", "0")
        rlgr_decode_channels(ref_streams, n, out=out_a, chunk=chunk)
        monkeypatch.setenv("RAHT3DGS_RLGR_BATCH", "1")
        rlgr_decode_channels(got_streams, n, out=out_b, chunk=chunk)
        np.testing.assert_array_equal(out_a[:, :n], payload)
        np.testing.assert_array_equal(out_b[:, :n], payload)
        # untouched tail columns prove no out-of-row writes
        np.testing.assert_array_equal(out_b[:, n:], -1)


def test_batch_decode_rejects_oversized_length_table(rng):
    """A corrupt chunk length table must raise, not read past the buffer
    (the native batch reader has no Python slice to clamp it)."""
    from raht3dgs_tpu.codec.rlgr import (
        native_available,
        rlgr_decode_channels,
        rlgr_encode_channels,
    )

    if not native_available():
        pytest.skip("native backend unavailable")
    payload = np.asarray(rng.integers(-50, 50, (2, 3000)), dtype=np.int32)
    streams, _ = rlgr_encode_channels(payload, channel_major=True, chunk=1024)
    # corrupt channel 0's first chunk length to a huge value
    bad = bytearray(streams[0])
    bad[8:12] = (2**31).to_bytes(4, "little")
    with pytest.raises(ValueError, match="truncated chunked stream"):
        rlgr_decode_channels([bytes(bad), streams[1]], 3000, chunk=1024)


def test_concurrent_batch_calls_are_thread_safe(rng):
    """Parallel Python threads each driving the native batch API (which
    spawns its own C++ pool) must produce the same streams as serial."""
    from concurrent.futures import ThreadPoolExecutor

    from raht3dgs_tpu.codec.rlgr import (
        native_available,
        rlgr_decode_channels,
        rlgr_encode_channels,
    )

    if not native_available():
        pytest.skip("native backend unavailable")
    payloads = [
        np.asarray(rng.integers(-100, 100, (4, 5000)), dtype=np.int32)
        for _ in range(6)
    ]
    serial = [
        rlgr_encode_channels(p, channel_major=True, chunk=1024)[0]
        for p in payloads
    ]

    def work(p):
        streams, _ = rlgr_encode_channels(p, channel_major=True, chunk=1024)
        out = np.empty((4, 5000), np.int32)
        rlgr_decode_channels(streams, 5000, out=out, chunk=1024)
        return streams, out

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(work, payloads))
    for (streams, out), ref_streams, p in zip(results, serial, payloads):
        assert [bytes(s) for s in streams] == [bytes(s) for s in ref_streams]
        np.testing.assert_array_equal(out, p)


def test_chunked_truncated_header_raises(rng):
    """A header whose chunks cover fewer symbols than requested must raise,
    not silently leave np.empty garbage in the output tail."""
    import pytest

    from raht3dgs_tpu.codec.rlgr import (
        _pack_chunk_header,
        _parse_chunk_header,
        rlgr_decode_chunked,
        rlgr_encode_chunked,
    )

    n = 300
    v = rng.integers(-50, 50, size=n).astype(np.int32)
    stream, _ = rlgr_encode_chunked(v, chunk=100)
    chunk, lens, off = _parse_chunk_header(stream)
    assert len(lens) == 3
    # drop the last chunk but keep the header internally consistent
    truncated = (
        _pack_chunk_header(chunk, lens[:2])
        + stream[off:off + lens[0] + lens[1]]
    )
    with pytest.raises(ValueError, match="truncated chunked stream"):
        rlgr_decode_chunked(truncated, n)


def test_batch_chunked_truncated_header_raises(rng):
    import pytest

    from raht3dgs_tpu.codec.rlgr import (
        _pack_chunk_header,
        _parse_chunk_header,
        native_available,
        rlgr_decode_channels,
        rlgr_encode_chunked,
    )

    if not native_available():
        pytest.skip("native batch path unavailable")
    n = 300
    v = rng.integers(-50, 50, size=(2, n)).astype(np.int32)
    streams = [rlgr_encode_chunked(v[d], chunk=100)[0] for d in range(2)]
    chunk, lens, off = _parse_chunk_header(streams[1])
    streams[1] = (
        _pack_chunk_header(chunk, lens[:2])
        + streams[1][off:off + lens[0] + lens[1]]
    )
    with pytest.raises(ValueError, match="truncated chunked stream"):
        rlgr_decode_channels(streams, n, chunk=100)
