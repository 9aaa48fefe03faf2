"""RLGR entropy-coding front-end: native C++ backend with Python fallback.

The reference ships its coder as a pybind11 extension
(``/root/reference/python/PyRLGR``) that crosses the binding with
``list[int]`` copies — the single worst boundary cost in its pipeline
(SURVEY.md §3). Here the native backend is a plain C shared library built
on first use and called through ctypes directly on contiguous numpy buffers:
zero Python-object traffic on the hot path.

Streams are bit-identical between the native and Python backends (asserted
in tests) and with the reference coder's automaton.
"""

from __future__ import annotations

import ctypes
import os
import time
from typing import List, Optional, Tuple

import numpy as np

from raht3dgs_tpu.codec import _rlgr_py
from raht3dgs_tpu.codec._native import NativeLib

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _configure(lib: ctypes.CDLL) -> None:
    lib.rlgr_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.rlgr_encode.restype = ctypes.c_int
    lib.rlgr_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_size_t,
    ]
    lib.rlgr_decode.restype = ctypes.c_int
    lib.rlgr_buffer_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.rlgr_encode32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.rlgr_encode32.restype = ctypes.c_int
    lib.rlgr_decode32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t,
    ]
    lib.rlgr_decode32.restype = ctypes.c_int
    _pu8 = ctypes.POINTER(ctypes.c_uint8)
    _psz = ctypes.POINTER(ctypes.c_size_t)
    lib.rlgr_encode_batch32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), _psz, _psz, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(_pu8), _psz,
    ]
    lib.rlgr_encode_batch32.restype = ctypes.c_int
    lib.rlgr_decode_batch32.argtypes = [
        _pu8, _psz, _psz, _psz, _psz, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rlgr_decode_batch32.restype = ctypes.c_int


_native = NativeLib(
    os.path.join(_NATIVE_DIR, "rlgr.cpp"),
    os.path.join(_NATIVE_DIR, "librlgr.so"),
    _configure,
    extra_flags=("-pthread",),
)


def _load() -> Optional[ctypes.CDLL]:
    return _native.load()


def _sz_array(values) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(values, dtype=np.uintp))


def _sz_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t))


def _encode_batch32(
    flat: np.ndarray, offsets, ns, signed: bool, threads: int = 0
) -> List[bytes]:
    """Encode independent int32 jobs through ONE native call (internal C++
    thread pool). ``flat`` is the shared contiguous symbol buffer; job j
    covers ``flat[offsets[j]:offsets[j]+ns[j]]``."""
    lib = _load()
    assert lib is not None and flat.dtype == np.int32 and flat.flags.c_contiguous
    count = len(ns)
    offs = _sz_array(offsets)
    nss = _sz_array(ns)
    outs = (ctypes.POINTER(ctypes.c_uint8) * count)()
    lens = np.zeros(count, dtype=np.uintp)
    rc = lib.rlgr_encode_batch32(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _sz_ptr(offs), _sz_ptr(nss), count, int(signed), int(threads),
        outs, _sz_ptr(lens),
    )
    if rc != 0:
        raise RuntimeError(f"rlgr_encode_batch32 failed (rc={rc})")
    streams = []
    for j in range(count):
        streams.append(ctypes.string_at(outs[j], int(lens[j])))
        lib.rlgr_buffer_free(outs[j])
    return streams


def _decode_batch32(
    buf: bytes, buf_offsets, buf_lens, ns, out_offsets, out_flat: np.ndarray,
    signed: bool, threads: int = 0,
) -> None:
    """Decode independent jobs from one concatenated stream buffer into a
    shared int32 output buffer through ONE native call."""
    lib = _load()
    assert lib is not None and out_flat.dtype == np.int32
    assert out_flat.flags.c_contiguous
    count = len(ns)
    boffs = _sz_array(buf_offsets)
    blens = _sz_array(buf_lens)
    nss = _sz_array(ns)
    ooffs = _sz_array(out_offsets)
    rc = lib.rlgr_decode_batch32(
        ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8)),
        _sz_ptr(boffs), _sz_ptr(blens), _sz_ptr(nss), _sz_ptr(ooffs),
        count, int(signed), int(threads),
        out_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"rlgr_decode_batch32 failed (rc={rc})")


def native_available() -> bool:
    return _load() is not None


def rlgr_encode(
    values: np.ndarray, signed: bool = True, backend: str = "auto"
) -> Tuple[bytes, int]:
    """Encode an integer array; returns ``(stream, elapsed_ns)``.

    The elapsed time mirrors the reference's in-coder ns timers
    (``membuf.cpp:340-341``) for CSV schema parity.
    """
    values = np.asarray(values)
    # int32 inputs take the copy-free native path (the codec's quantized
    # coefficients are int32); anything else widens to int64.
    if values.dtype == np.int32 and values.ndim == 1 and values.flags.c_contiguous:
        seq = values
        use32 = True
    else:
        seq = np.ascontiguousarray(values, dtype=np.int64).ravel()
        use32 = False
    lib = _load() if backend in ("auto", "native") else None
    if backend == "native" and lib is None:
        raise RuntimeError("native RLGR backend unavailable")
    t0 = time.perf_counter_ns()
    if lib is not None and backend != "python":
        out = ctypes.POINTER(ctypes.c_uint8)()
        out_len = ctypes.c_size_t()
        if use32:
            rc = lib.rlgr_encode32(
                seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(seq), int(signed), ctypes.byref(out), ctypes.byref(out_len),
            )
        else:
            rc = lib.rlgr_encode(
                seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(seq), int(signed), ctypes.byref(out), ctypes.byref(out_len),
            )
        if rc != 0:
            raise RuntimeError(f"rlgr_encode failed (rc={rc})")
        data = ctypes.string_at(out, out_len.value)
        lib.rlgr_buffer_free(out)
    else:
        data = _rlgr_py.encode(np.asarray(seq, dtype=np.int64).tolist(), signed=signed)
    return data, time.perf_counter_ns() - t0


def rlgr_decode(
    stream: bytes, n: int, signed: bool = True, backend: str = "auto",
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int]:
    """Decode ``n`` symbols; returns ``(array, elapsed_ns)``.

    ``out``: optional preallocated contiguous int32 or int64 destination
    (e.g. a row of a channel matrix) to decode into without allocations.
    """
    lib = _load() if backend in ("auto", "native") else None
    if backend == "native" and lib is None:
        raise RuntimeError("native RLGR backend unavailable")
    t0 = time.perf_counter_ns()
    if lib is not None and backend != "python":
        if out is None:
            out = np.empty(n, dtype=np.int64)
        assert out.flags.c_contiguous and len(out) >= n
        buf = ctypes.cast(
            (ctypes.c_char_p(stream)), ctypes.POINTER(ctypes.c_uint8)
        )
        if out.dtype == np.int32:
            rc = lib.rlgr_decode32(
                buf, len(stream), int(signed),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            )
        else:
            rc = lib.rlgr_decode(
                buf, len(stream), int(signed),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            )
        if rc != 0:
            raise RuntimeError(f"rlgr_decode failed (rc={rc})")
    else:
        dec = np.asarray(_rlgr_py.decode(stream, n, signed=signed), dtype=np.int64)
        if out is None:
            out = dec
        else:
            out[:n] = dec
    return out, time.perf_counter_ns() - t0


def _use_batch(arr) -> bool:
    """Whether the one-call native batch path applies: int32 C-contiguous
    2-D buffer and the native library present. RAHT3DGS_RLGR_BATCH=0 forces
    the per-stream composition (used by tests to pin byte-equality)."""
    if os.environ.get("RAHT3DGS_RLGR_BATCH", "1") == "0":
        return False
    return (
        isinstance(arr, np.ndarray)
        and arr.dtype == np.int32
        and arr.ndim == 2
        and arr.flags.c_contiguous
        and native_available()
    )


_pool = None


def _executor():
    """Shared thread pool for entropy work. ctypes releases the GIL during
    the native encode/decode calls, so channel/chunk tasks run truly in
    parallel on multi-core hosts; on a single-core host callers skip the
    pool entirely."""
    global _pool
    if _pool is None:
        from concurrent.futures import ThreadPoolExecutor

        _pool = ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 1))
    return _pool


def _map_tasks(fn, tasks):
    """Run ``fn`` over ``tasks`` via the pool when it can help, else serially."""
    if len(tasks) > 1 and (os.cpu_count() or 1) > 1 and native_available():
        return list(_executor().map(fn, tasks))
    return [fn(t) for t in tasks]


def _pack_chunk_header(chunk: int, lens) -> bytes:
    """Chunked-stream framing: ``u32 chunk | u32 n_chunks | u32 len[i]...``.

    The single definition shared by the per-stream and native-batch
    encoders — the byte-identity invariant between those paths depends on
    this layout living in exactly one place."""
    import struct

    return struct.pack(f"<II{len(lens)}I", chunk, len(lens), *lens)


def _parse_chunk_header(stream: bytes):
    """Parse and validate chunked framing; returns (chunk, lens, payload_off).

    Raises ValueError on any truncation — including a length table whose
    payloads would run past the end of the buffer (the native batch
    decoder reads exactly [off, off+len) with no Python slicing to clamp
    for it)."""
    import struct

    if len(stream) < 8:
        raise ValueError(
            f"truncated chunked stream: {len(stream)} bytes, header needs 8"
        )
    chunk, n_chunks = struct.unpack_from("<II", stream, 0)
    if len(stream) < 8 + 4 * n_chunks:
        raise ValueError("truncated chunked stream: length table cut off")
    lens = struct.unpack_from(f"<{n_chunks}I", stream, 8)
    payload_off = 8 + 4 * n_chunks
    if payload_off + sum(lens) > len(stream):
        raise ValueError(
            "truncated chunked stream: payloads exceed the buffer "
            f"({payload_off + sum(lens)} > {len(stream)} bytes)"
        )
    return chunk, lens, payload_off


def rlgr_encode_chunked(
    values: np.ndarray, signed: bool = True, chunk: int = 65536
) -> Tuple[bytes, int]:
    """Encode as independent fixed-size chunks for parallel entropy coding.

    The adaptive automaton resets at every chunk boundary, making chunks
    self-contained: encode AND decode parallelize across chunks (and across
    channels) with a rate overhead of a few adaptation-restart bytes per
    chunk (<0.1% at the default 64Ki chunk). This is a deliberate format
    extension over the reference's strictly sequential coder
    (``/root/reference/python/PyRLGR/src/libs/rlgr/rlgr.cpp``) — its
    bitstream cannot be entropy-decoded in parallel at all.

    Layout: ``u32 chunk_size | u32 n_chunks | u32 len[i]... | payloads``.
    """
    values = np.asarray(values)
    n = len(values)
    chunk = max(int(chunk), 1)
    n_chunks = max((n + chunk - 1) // chunk, 1)
    parts = [values[i * chunk:(i + 1) * chunk] for i in range(n_chunks)]
    t0 = time.perf_counter_ns()
    results = _map_tasks(lambda p: rlgr_encode(p, signed)[0], parts)
    elapsed = time.perf_counter_ns() - t0
    head = _pack_chunk_header(chunk, [len(r) for r in results])
    return head + b"".join(results), elapsed


def rlgr_decode_chunked(
    stream: bytes, n: int, signed: bool = True,
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int]:
    """Decode a :func:`rlgr_encode_chunked` stream; chunks in parallel."""
    chunk, lens, payload_off = _parse_chunk_header(stream)
    n_chunks = len(lens)
    if n_chunks * chunk < n:
        # An internally consistent header with too few chunks would decode
        # partially and silently leave np.empty garbage in the tail.
        raise ValueError(
            f"truncated chunked stream: {n_chunks} chunks of {chunk} cover "
            f"{n_chunks * chunk} symbols, need {n}"
        )
    offs = np.concatenate([[payload_off], payload_off + np.cumsum(lens)])
    if out is None:
        out = np.empty(n, dtype=np.int32)
    t0 = time.perf_counter_ns()

    def _one(i):
        m = min(chunk, n - i * chunk)
        if m > 0:
            rlgr_decode(
                stream[offs[i]:offs[i + 1]], m, signed, out=out[i * chunk:]
            )

    _map_tasks(_one, list(range(n_chunks)))
    return out, time.perf_counter_ns() - t0


def rlgr_encode_channels(
    payload: np.ndarray, signed: bool = True, channel_major: bool = False,
    chunk: int = 0, n: Optional[int] = None,
) -> Tuple[List[bytes], int]:
    """Encode each channel of a payload as its own RLGR stream.

    ``payload`` is (N, D) sample-major by default (transposed here), or
    (D, N) channel-major with ``channel_major=True`` — the pipeline has the
    device emit that layout so every channel is a zero-copy contiguous
    int32 row. ``n`` limits each channel to its first n symbols (the
    pads-last layout's real prefix) WITHOUT slicing: a column-sliced view
    is non-contiguous and would silently disqualify the one-call native
    batch path. ``chunk > 0`` switches each channel to the self-contained
    chunked layout (:func:`rlgr_encode_chunked`) so entropy coding
    parallelizes within a channel as well as across channels. Returns
    (streams, wall-clock coder ns — the entropy-stage time the reference
    logs per frame, ``membuf.cpp:340-341``).
    """
    payload = np.asarray(payload)
    rows = payload if channel_major else np.ascontiguousarray(payload.T)
    D, row_len = rows.shape
    n = row_len if n is None else min(int(n), row_len)
    t0 = time.perf_counter_ns()
    if _use_batch(rows):
        # one native call for the whole frame: every (channel, chunk) job
        # runs on the C++ thread pool, byte-identical streams
        flat = rows.reshape(-1)
        if chunk > 0:
            c = max(int(chunk), 1)
            n_chunks = max((n + c - 1) // c, 1)
            offsets, ns = [], []
            for d in range(D):
                for i in range(n_chunks):
                    offsets.append(d * row_len + i * c)
                    ns.append(max(min(c, n - i * c), 0))
            parts = _encode_batch32(flat, offsets, ns, signed)
            streams = []
            for d in range(D):
                mine = parts[d * n_chunks : (d + 1) * n_chunks]
                streams.append(
                    _pack_chunk_header(c, [len(p) for p in mine])
                    + b"".join(mine)
                )
        else:
            streams = _encode_batch32(
                flat, [d * row_len for d in range(D)], [n] * D, signed
            )
        return streams, time.perf_counter_ns() - t0
    if chunk > 0:
        streams = [
            rlgr_encode_chunked(
                np.ascontiguousarray(rows[d][:n]), signed, chunk
            )[0]
            for d in range(D)
        ]
    else:
        streams = _map_tasks(
            lambda d: rlgr_encode(np.ascontiguousarray(rows[d][:n]), signed)[0],
            list(range(D)),
        )
    return streams, time.perf_counter_ns() - t0


def rlgr_decode_channels(
    streams: List[bytes], n: int, signed: bool = True,
    out: Optional[np.ndarray] = None, chunk: int = 0,
) -> Tuple[np.ndarray, int]:
    """Decode per-channel streams into a (D, n...) channel-major matrix.

    ``out``: optional preallocated (D, >=n) int32/int64 C-contiguous matrix;
    each channel decodes straight into its row (no temporaries). ``chunk``
    must match the value the streams were encoded with (0 = sequential).
    """
    D = len(streams)
    if out is None:
        out = np.empty((D, n), dtype=np.int32)
    t0 = time.perf_counter_ns()
    if _use_batch(out):
        # one native call for the whole frame: concatenate the channel
        # streams into a single buffer and decode every (channel, chunk)
        # job on the C++ thread pool, straight into the output rows.
        # _parse_chunk_header bounds-checks the untrusted length tables —
        # the native reader consumes exactly [off, off+len) with no Python
        # slicing to clamp an oversized len.
        stride = out.shape[1]
        buf = b"".join(streams)
        base = 0
        boffs, blens, ns, ooffs = [], [], [], []
        for d, s in enumerate(streams):
            if chunk > 0:
                c, lens, off = _parse_chunk_header(s)
                n_chunks = len(lens)
                if n_chunks * c < n:
                    raise ValueError(
                        f"truncated chunked stream (channel {d}): "
                        f"{n_chunks} chunks of {c} cover {n_chunks * c} "
                        f"symbols, need {n}"
                    )
                for i in range(n_chunks):
                    m = max(min(c, n - i * c), 0)
                    if m > 0:
                        boffs.append(base + off)
                        blens.append(lens[i])
                        ns.append(m)
                        ooffs.append(d * stride + i * c)
                    off += lens[i]
            else:
                boffs.append(base)
                blens.append(len(s))
                ns.append(n)
                ooffs.append(d * stride)
            base += len(s)
        _decode_batch32(
            buf, boffs, blens, ns, ooffs, out.reshape(-1), signed
        )
        return out, time.perf_counter_ns() - t0
    if chunk > 0:
        for d in range(D):
            rlgr_decode_chunked(streams[d], n, signed, out=out[d])
    else:
        _map_tasks(
            lambda d: rlgr_decode(streams[d], n, signed, out=out[d]),
            list(range(D)),
        )
    return out, time.perf_counter_ns() - t0


class MemBuf:
    """Compatibility shim mirroring the reference's ``rlgr.membuf`` API
    (``/root/reference/python/PyRLGR/src/libs/rlgr/bindings.cpp:34-57``):
    write-mode constructor, read-mode constructor from a byte buffer,
    ``rlgrWrite``/``rlgrRead`` returning (ns, ...), ``get_buffer``,
    ``buffer_size`` and ``close``."""

    def __init__(self, buffer: Optional[bytes] = None):
        self._read_buf = bytes(buffer) if buffer is not None else None
        self._write_buf: Optional[bytes] = None

    def rlgrWrite(self, values: List[int], flagSigned: int = 1) -> int:
        data, ns = rlgr_encode(np.asarray(values, dtype=np.int64), bool(flagSigned))
        self._write_buf = data
        return ns

    def rlgrRead(self, n: int, flagSigned: int = 1) -> Tuple[int, List[int]]:
        assert self._read_buf is not None, "MemBuf not opened for reading"
        out, ns = rlgr_decode(self._read_buf, n, bool(flagSigned))
        return ns, out.tolist()

    def grWrite(self, value: int, k: int) -> None:
        """Single Golomb-Rice codeword write (reference grWrite parity)."""
        sink = _rlgr_py._Sink()
        _rlgr_py._gr_put(sink, int(value), int(k))
        self._write_buf = sink.finish()

    def grRead(self, k: int) -> int:
        """Single Golomb-Rice codeword read (reference grRead parity)."""
        assert self._read_buf is not None, "MemBuf not opened for reading"
        return _rlgr_py._gr_get(_rlgr_py._Source(self._read_buf), int(k))

    def get_buffer(self) -> bytes:
        assert self._write_buf is not None
        return self._write_buf

    def buffer_size(self) -> int:
        buf = self._write_buf if self._write_buf is not None else self._read_buf
        return 0 if buf is None else len(buf)

    def close(self) -> None:
        pass
