"""The RAHT attribute codec pipeline — encode/decode a voxel frame.

This is the framework's "model" layer: the end-to-end path the reference
spreads across its drivers (``/root/reference/python/encode_ply.py:102-222``,
``encode_3dgs.py``), re-architected for TPU:

- the hot path (RAHT forward/inverse, quantization, RA-GFT reorder) is a
  handful of jitted XLA programs over *bucketed* static shapes;
- exactly two device<->host transfers per frame: quantized int32
  coefficients down before entropy coding, decoded coefficients up after
  (the reference additionally pays a ``.tolist()`` per channel through
  pybind11 — SURVEY.md §3 calls it the worst boundary cost; we hand the
  C coder one contiguous numpy buffer);
- entropy coding runs on host via the native RLGR backend, per channel.

Per-stage timings mirror the reference CSV schema names.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.codec.bitstream import FrameStream
from raht3dgs_tpu.codec.rlgr import (
    rlgr_decode_channels,
    rlgr_encode_channels,
)
from raht3dgs_tpu.ops.morton import morton_encode, pad_code
from raht3dgs_tpu.ops.quantize import (
    dequantize,
    dequantize_biased,
    quantize,
    quantize_deadzone,
)
from raht3dgs_tpu.ops.raht import get_forward_impl
from raht3dgs_tpu.ops.reorder import coefficient_order
from raht3dgs_tpu.utils.padding import pad_rows, round_up_bucket
from raht3dgs_tpu.utils.timing import StageTimer


@dataclass
class VoxelFrame:
    """A padded, Morton-sorted voxel frame ready for the codec.

    ``codes``/``attributes``/``weights`` are length ``n_padded`` with real
    voxels in slots ``[0, n_voxels)`` and invisible padding after.
    """

    codes: jnp.ndarray       # (Np,) int64
    attributes: jnp.ndarray  # (Np, D) float
    weights: jnp.ndarray     # (Np,) float
    n_voxels: int
    depth: int
    vmin: np.ndarray
    width: float


@dataclass
class EncodedFrame:
    stream: FrameStream
    timer: StageTimer
    # Decoder-side replay info is all derivable from the stream + positions.


def _require_x64(dtype, depth: int) -> None:
    """Fail loudly when the requested precision needs jax_enable_x64.

    Without x64, float64 silently truncates to f32 and int64 Morton codes
    (needed for depth > 10) truncate to int32 — both corrupt results with
    only a drowned-out UserWarning. The CLI drivers enable x64 in
    configure_runtime; library users get this check instead.
    """
    import jax

    if jax.config.jax_enable_x64:
        return
    from raht3dgs_tpu.ops.raht import max_int32_levels

    needs = []
    if jnp.dtype(dtype) == jnp.dtype("float64"):
        needs.append("dtype=float64")
    if 3 * depth + 1 > max_int32_levels():
        needs.append(f"depth={depth} (> 10 needs int64 Morton codes)")
    if needs:
        raise RuntimeError(
            f"{' and '.join(needs)} require jax_enable_x64; call "
            "jax.config.update('jax_enable_x64', True) before building "
            "frames, or pass dtype=jnp.float32 / depth <= 10"
        )


def prepare_voxel_frame(
    positions: np.ndarray,
    attributes: np.ndarray,
    depth: int,
    bucket: int = 1 << 13,
    dtype=jnp.float64,
    vmin: Optional[np.ndarray] = None,
    width: Optional[float] = None,
    weights: Optional[np.ndarray] = None,
) -> VoxelFrame:
    """Build a padded VoxelFrame from integer voxel positions + attributes.

    ``positions`` must already be deduplicated integer voxel coordinates in
    ``[0, 2**depth)`` (the reference drivers' input contract — their PLYs are
    pre-voxelized; use ``ops.voxelize`` for raw float clouds). Rows are
    Morton-sorted here; attribute rows follow the sort.
    """
    _require_x64(dtype, depth)
    positions = np.asarray(positions)
    attributes = np.asarray(attributes)
    n = positions.shape[0]
    codes = np.asarray(
        morton_encode(jnp.asarray(positions.astype(np.int64)), depth)
    )
    order = np.argsort(codes, kind="stable")
    codes = codes[order]
    if np.any(np.diff(codes) == 0):
        raise ValueError(
            "duplicate voxel positions — voxelize/deduplicate before encoding"
        )
    attributes = attributes[order]
    w = np.ones(n) if weights is None else np.asarray(weights, dtype=float)[order]

    n_padded = round_up_bucket(n, bucket)
    pad_slots = np.arange(n, n_padded)
    # Codes and pad sentinels must share the exact code dtype BEFORE
    # concatenation (mixing int64 with the uint64 sentinels of depth 21
    # would promote to float64): int32 when the level count fits (int64 is
    # emulated on TPU — always true for the 3DGS J=10 path), int64 up to
    # depth 20, uint64 at depth 21 (sentinel needs bit 63).
    from raht3dgs_tpu.ops.morton import code_dtype

    cdt = np.dtype(code_dtype(depth, n_padded))
    codes_p = np.concatenate(
        [
            codes.astype(cdt),
            np.asarray(
                pad_code(depth, n_padded, jnp.asarray(pad_slots))
            ).astype(cdt),
        ]
    )
    attrs_p = pad_rows(attributes.astype(np.float64), n_padded)
    w_p = pad_rows(w, n_padded)
    return VoxelFrame(
        codes=jnp.asarray(codes_p),
        attributes=jnp.asarray(attrs_p, dtype=dtype),
        weights=jnp.asarray(w_p, dtype=dtype),
        n_voxels=n,
        depth=depth,
        vmin=np.zeros(3) if vmin is None else np.asarray(vmin, dtype=float),
        width=float(2**depth) if width is None else float(width),
    )


@partial(jax.jit, static_argnames=("depth", "order_mode", "impl"))
def _transform_device(codes, attrs, weights, depth, order_mode="ragft",
                      impl="dense"):
    res = get_forward_impl(impl)(codes, attrs, weights, depth)
    if order_mode == "weight_desc":
        # the stream permutation must be BITWISE identical between encoder
        # and decoder. The decoder always rebuilds it from
        # raht_structure_span; the level-loop forwards accumulate node
        # weights in a different summation order (bitwise-divergent for
        # fractional float weights), so the ordering — and only the
        # ordering — is always derived from the same structure function
        # the decoder uses. drop_level-based orders (ragft/morton) are
        # integer and bitwise-equal across implementations.
        from raht3dgs_tpu.ops.raht_span import raht_structure_span

        order = coefficient_order(
            raht_structure_span(codes, weights, depth), order_mode
        )
    else:
        order = coefficient_order(res.structure, order_mode)
    return res.coeffs, order, res.structure

def _pads_last(order, nvox):
    """Reorder a coefficient permutation so padding slots land at the end
    (real relative order preserved): the host can then slice the first nvox
    entries of the stream instead of boolean-compressing."""
    return order[jnp.argsort(order >= nvox, stable=True)]


@partial(jax.jit, static_argnames=("quant_mode",))
def _quant_reorder_device(coeffs, steps, order, nvox, quant_mode="mid",
                          qf=0.0):
    """Quantize + apply the pads-last order, channel-major output.

    Returns (D, N) int32 so every channel reaching the host entropy coder is
    one contiguous zero-copy row (prefix [:nvox] = the real stream).
    ``quant_mode``: "mid" = the reference's round-half-up (bitwise parity
    path); "deadzone" = sign-symmetric dead-zone with offset ``qf``.
    """
    if quant_mode == "deadzone":
        q = quantize_deadzone(coeffs, steps, qf)
    else:
        q = quantize(coeffs, steps)
    return q[_pads_last(order, nvox)].T


@jax.jit
def _reorder_T_device(coeffs, order, nvox):
    """The pads-last stream permutation + channel-major transpose alone.

    Sweeps hoist this out of the per-step program: the reorder is a row
    gather (per-row DMA — docs/performance.md) while quantization is
    elementwise, and elementwise ops commute with a permutation BITWISE —
    so one reorder serves every quantization step of a sweep."""
    return coeffs[_pads_last(order, nvox)].T


@partial(jax.jit, static_argnames=("quant_mode",))
def _quant_T_device(coeffs_T, steps, quant_mode="mid", qf=0.0):
    """Quantize an already-reordered channel-major (D, N) coefficient
    matrix (the per-step half of the hoisted sweep split; bitwise equal
    to ``_quant_reorder_device`` — per-channel steps broadcast along D)."""
    st = steps[:, None] if steps.shape[0] > 1 else steps
    if quant_mode == "deadzone":
        return quantize_deadzone(coeffs_T, st, qf)
    return quantize(coeffs_T, st)


@partial(jax.jit, static_argnames=("depth", "order_mode"))
def _inverse_order_device(codes, weights, nvox, depth, order_mode="ragft"):
    """Decoder prelude: inverse of the pads-last stream permutation."""
    from raht3dgs_tpu.ops.raht_span import raht_structure_span

    structure = raht_structure_span(codes, weights, depth)
    order2 = _pads_last(coefficient_order(structure, order_mode), nvox)
    return jnp.argsort(order2).astype(jnp.int32)


@jax.jit
def _maxabs_i64(q):
    return jnp.max(jnp.abs(q.astype(jnp.int64)), initial=0)


@jax.jit
def _cast_i16(q):
    return q.astype(jnp.int16)


@jax.jit
def _fetch_stats(q):
    """(maxabs, int8 rail-count, int16 rail-count) as ONE (3,) device
    array — a single tiny fetch decides the narrowing (the tunnel charges
    ~an RTT per fetch). Rails are values a clamped cast would alias:
    |v| >= 127 for int8, |v| >= 32767 for int16."""
    a = jnp.abs(q.astype(jnp.int64))
    return jnp.stack([
        jnp.max(a, initial=0),
        jnp.sum((a >= 127).astype(jnp.int64)),
        jnp.sum((a >= 32767).astype(jnp.int64)),
    ])


@jax.jit
def _clamp_cast_i16(q):
    return jnp.clip(q, -32767, 32767).astype(jnp.int16)


@jax.jit
def _cast_i8(q):
    return q.astype(jnp.int8)


@jax.jit
def _clamp_cast_i8(q):
    return jnp.clip(q, -127, 127).astype(jnp.int8)


@jax.jit
def _gather_flat_i32(q, idx):
    return q.reshape(-1)[idx].astype(jnp.int32)


def _fetch_window(n_steps: int) -> int:
    """Max async host copies in flight during a sweep (0/unset-0 = all)."""
    import os

    w = int(os.environ.get("RAHT3DGS_FETCH_WINDOW", "2"))
    return n_steps if w <= 0 else max(1, min(w, n_steps))


def _narrow_fetch_enabled() -> bool:
    """Halving the big device->host coefficient fetch pays on remote-host
    links (the axon tunnel moves ~20-50 MB/s) but costs an extra scalar
    round trip that a local PCIe/DMA host would only lose on. Default:
    on for the tunnel backend, overridable via RAHT3DGS_NARROW_FETCH."""
    env = os.environ.get("RAHT3DGS_NARROW_FETCH")
    if env is not None:
        return env not in ("0", "false", "")
    from raht3dgs_tpu.utils.backend import is_remote_tunnel_backend

    return is_remote_tunnel_backend()


def _fetch_patch_enabled() -> bool:
    return os.environ.get("RAHT3DGS_FETCH_PATCH", "1") not in (
        "0", "false", "")


class PendingFetch(NamedTuple):
    """An in-flight device->host coefficient fetch.

    ``buf`` is the array whose host copy was started (int16 narrow, int16
    rail-clamped, or int32); ``src`` keeps the device int32 alive when the
    clamped fetch needs its rails patched from an exact gather."""

    buf: jnp.ndarray
    src: Optional[jnp.ndarray]


def _start_fetch(q, stats) -> PendingFetch:
    """Pick the fetch dtype from the (maxabs, rails8, rails16) stats (host
    ints or None when narrowing is disabled) and start the async host copy.

    Regimes, narrowest first: everything fits int8 -> plain cast (exact);
    a FEW values overflow int8 -> clamp to the int8 rails and remember
    ``src`` so :func:`_finish_fetch` can re-fetch the aliased entries
    exactly; same two tiers again at int16; dense overflow -> full int32.
    Patch policies mirror :func:`pack_quantized_upload`: int16 rails at
    most size/8 (2 B/entry saved vs int32, 8 B/entry patch), int8 rails
    at most size/16 (1 B/entry saved vs int16). RD-point symbols are
    near-zero by design (that is why RLGR works), so real frames usually
    take the int8 tiers; the rail counts keep the worst case exact."""
    src = None
    if stats is not None:
        maxabs, rails8, rails16 = int(stats[0]), int(stats[1]), int(stats[2])
        patch = _fetch_patch_enabled()
        if maxabs < 128:
            q = _cast_i8(q)
        elif patch and 0 < rails8 <= q.size // 16:
            src = q
            q = _clamp_cast_i8(q)
        elif maxabs < (1 << 15):
            q = _cast_i16(q)
        elif patch and 0 < rails16 <= q.size // 8:
            src = q
            q = _clamp_cast_i16(q)
    try:
        q.copy_to_host_async()
    except AttributeError:  # non-Array backends (older jax)
        pass
    return PendingFetch(q, src)


def _finish_fetch(pending: PendingFetch) -> np.ndarray:
    """Block on the host copy and return the exact int32 matrix.

    Rail entries of a clamped fetch (|v| == 127 for int8, 32767 for
    int16 on host) are overwritten from a tiny exact device gather; the
    gather index vector is padded to a power-of-two bucket (duplicates
    of entry 0) to bound program recompiles."""
    a = np.asarray(pending.buf)
    if a.dtype not in (np.int16, np.int8):
        return a
    rail = 127 if a.dtype == np.int8 else 32767
    out = a.astype(np.int32)  # host widen keeps the native batch path
    if pending.src is not None:
        flat = out.reshape(-1)
        sus = np.flatnonzero(np.abs(flat) >= rail).astype(np.int32)
        if sus.size:
            bucket = 8
            while bucket < sus.size:
                bucket *= 2
            idx = np.concatenate(
                [sus, np.full(bucket - sus.size, sus[0], np.int32)]
            )
            exact = np.asarray(
                _gather_flat_i32(pending.src, jnp.asarray(idx))
            )
            flat[sus] = exact[: sus.size]
    return out


def _narrow_fetch(q_T) -> np.ndarray:
    """Fetch the quantized channel matrix to host int32, moving int16 over
    the link whenever exact (all values fit, or only a patchable few
    overflow — checked on device first)."""
    stats = (
        np.asarray(_fetch_stats(q_T)) if _narrow_fetch_enabled() else None
    )
    return _finish_fetch(_start_fetch(q_T, stats))


def build_entropy_stream(
    q_np: np.ndarray, frame, steps, *, depth: int, order_mode: str,
    chunk: int, quant_mode: str = "mid", quant_f: float = 0.5,
    rec_delta: float = 0.0, dtype32: bool = False, entropy: str = "rlgr",
    predict: bool = False, predict_mask: int = 0,
):
    """Host entropy-code one frame's quantized (D, N) channel matrix and
    wrap it as a FrameStream; returns ``(stream, encode_ns)``.

    The SINGLE place the stream format is assembled — AttributeCodec's
    encode/encode_sweep and BatchAttributeCodec's both paths all route
    through it, so a format change cannot diverge between the
    byte-identity-pinned paths. ``frame`` supplies n_voxels/vmin/width.

    ``entropy`` selects the coder per channel: "rlgr" (reference parity,
    pre-v5 container bytes), "rac" (the adaptive-binary profile,
    codec/rac.py — measured -7..-13% rate at identical reconstructions),
    or "auto" (encode both, keep the smaller stream PER CHANNEL — never
    worse than rlgr by more than 0 bytes; the per-channel choice rides
    the v5 entropy map)."""
    channels, emap, enc_ns = encode_entropy_channels(
        q_np, entropy, chunk=chunk, n=frame.n_voxels,
    )
    stream = FrameStream(
        depth=depth,
        n_voxels=frame.n_voxels,
        steps=np.atleast_1d(np.asarray(steps, dtype=np.float64)),
        channels=channels,
        vmin=frame.vmin,
        width=frame.width,
        order_mode=order_mode,
        chunk=chunk,
        quant_mode=quant_mode,
        quant_f=quant_f,
        rec_delta=rec_delta,
        dtype32=dtype32,
        entropy_map=emap,
        predict=predict,
        predict_mask=predict_mask,
    )
    return stream, enc_ns


def encode_entropy_channels(q_np: np.ndarray, entropy: str, *, chunk: int,
                            n: int):
    """Per-channel entropy encode under the selected coder; returns
    ``(channels, entropy_map_or_None, elapsed_ns)``."""
    if entropy == "rlgr":
        channels, enc_ns = rlgr_encode_channels(
            q_np, signed=True, channel_major=True, chunk=chunk, n=n,
        )
        return channels, None, enc_ns
    from raht3dgs_tpu.codec.rac import rac_encode_channels

    if entropy == "rac":
        channels, enc_ns = rac_encode_channels(
            q_np, channel_major=True, chunk=chunk, n=n,
        )
        return channels, (True,) * len(channels), enc_ns
    if entropy != "auto":
        raise ValueError(f"unknown entropy coder {entropy!r}")
    from raht3dgs_tpu.codec.rac import rac_encode, rac_encode_chunked

    rl, ns1 = rlgr_encode_channels(
        q_np, signed=True, channel_major=True, chunk=chunk, n=n,
    )
    ra, ns2 = rac_encode_channels(q_np, channel_major=True, chunk=chunk, n=n)
    # third candidate for channels > 0: the cross-channel profile (RAC
    # profile 1) conditioned on channel 0's significance — the decoder
    # derives the same bits from its decoded channel 0, whichever coder
    # channel 0 itself used
    D = q_np.shape[0]
    cond = np.ascontiguousarray(q_np[0, :n] != 0, dtype=np.uint8)
    t0 = time.perf_counter_ns()
    rows = np.ascontiguousarray(q_np[:, :n], dtype=np.int32)
    if chunk > 0:
        rc = [None] + [
            rac_encode_chunked(rows[d], chunk, cond=cond)[0]
            for d in range(1, D)
        ]
    else:
        rc = [None] + [
            rac_encode(rows[d], cond=cond)[0] for d in range(1, D)
        ]
    ns3 = time.perf_counter_ns() - t0
    channels, emap = [], []
    for d in range(D):
        cands = [(rl[d], False), (ra[d], True)]
        if rc[d] is not None:
            cands.append((rc[d], True))
        best = min(cands, key=lambda c: len(c[0]))
        channels.append(best[0])
        emap.append(best[1])
    emap = tuple(emap)
    return channels, (emap if any(emap) else None), ns1 + ns2 + ns3


def decode_entropy_channels(stream: FrameStream, n: int, out: np.ndarray):
    """Decode the first ``n`` symbols of every channel payload into the
    rows of ``out``, dispatching per channel on the stream's entropy map
    (absent/False = RLGR, True = RAC; a RAC payload's leading profile
    byte selects plain (0) vs channel-0-conditioned (1) contexts — the
    conditioned channels decode after channel 0, whose decoded
    significance supplies the conditioning bits). Returns
    ``(out, elapsed_ns)``."""
    emap = stream.entropy_map
    if emap is None or not any(emap):
        return rlgr_decode_channels(
            stream.channels, n, signed=True, out=out, chunk=stream.chunk,
        )
    from raht3dgs_tpu.codec.rac import (
        rac_decode,
        rac_decode_channels,
        rac_decode_chunked,
        rac_stream_profile,
    )

    profiles = [
        rac_stream_profile(stream.channels[d], stream.chunk) if is_rac
        else -1
        for d, is_rac in enumerate(emap)
    ]
    if emap[0] and profiles[0] == 1:
        raise ValueError(
            "corrupt stream: channel 0 cannot use the cross-channel "
            "profile (it is the conditioning source)"
        )
    if all(emap) and not any(p == 1 for p in profiles):
        return rac_decode_channels(
            stream.channels, n, out, chunk=stream.chunk,
            n_total=stream.n_voxels,
        )
    import time as _t

    from raht3dgs_tpu.codec.rlgr import rlgr_decode, rlgr_decode_chunked

    t0 = _t.perf_counter_ns()
    cond = None

    def _one(d):
        payload = stream.channels[d]
        if emap[d]:
            kw = {} if profiles[d] != 1 else {"cond": cond}
            if stream.chunk > 0:
                rac_decode_chunked(payload, n, stream.n_voxels,
                                   out=out[d, :n], **kw)
            else:
                rac_decode(payload, n, stream.n_voxels, out=out[d, :n],
                           **kw)
        elif stream.chunk > 0:
            rlgr_decode_chunked(payload, n, signed=True, out=out[d])
        else:
            rlgr_decode(payload, n, signed=True, out=out[d])

    _one(0)
    if any(p == 1 for p in profiles):
        cond = np.ascontiguousarray(out[0, :n] != 0, dtype=np.uint8)
    for d in range(1, len(emap)):
        _one(d)
    return out, _t.perf_counter_ns() - t0


def quantized_upload_array(vals_T: np.ndarray) -> np.ndarray:
    """Narrow the (D, N) int32 quantized channel matrix to int16 when every
    value fits — halves the host->device upload, which dominates the frame
    cost on remote-host links. The device program widens back before
    dequantization, so results are bitwise unchanged."""
    if vals_T.dtype == np.int32 and np.abs(vals_T, dtype=np.int64).max(
        initial=0
    ) < (1 << 15):
        return vals_T.astype(np.int16)
    return vals_T


class QuantizedUpload(NamedTuple):
    """Host-side packing of a quantized channel matrix for upload.

    Dense tiers: ``vals`` is the (possibly int8/int16-narrowed) matrix;
    when a *few* entries overflow the narrow dtype, they are truncated in
    ``vals`` and carried exactly in the sparse ``(patch_idx, patch_val)``
    flat-index patch (empty arrays when no patch is needed).

    Sparse tier (``shape`` set): the matrix is mostly ZEROS — inter
    residuals at serving operating points, high-step RD points — and the
    wire carries only ``(patch_idx, vals)`` = (flat nonzero indices,
    their values in the narrowest exact dtype); the device rebuilds the
    dense matrix with one scatter into zeros. Chosen by
    :func:`pack_quantized_upload` only when the padded sparse bytes beat
    the best dense tier; ``RAHT3DGS_UPLOAD_SPARSE=0`` disables."""

    vals: np.ndarray
    patch_idx: np.ndarray
    patch_val: np.ndarray
    shape: tuple = None


_EMPTY_I32 = np.zeros((0,), np.int32)


def _upload_patch_enabled() -> bool:
    return os.environ.get("RAHT3DGS_UPLOAD_PATCH", "1") not in (
        "0", "false", "")


def _upload_sparse_enabled() -> bool:
    return os.environ.get("RAHT3DGS_UPLOAD_SPARSE", "1") not in (
        "0", "false", "")


def _sparse_upload(vals_T: np.ndarray, nz: np.ndarray,
                   dense_bytes: int):
    """Sparse wire tier when (padded) indices+values beat the best dense
    tier; ``None`` when dense wins. Values ride the narrowest dtype that
    holds every nonzero exactly; nnz pads to a power-of-two bucket
    (duplicates of entry 0 — same (idx, val) rewritten) so the scatter
    program compiles once per bucket."""
    val = vals_T.reshape(-1)[nz]
    a = np.abs(val, dtype=np.int64)
    vmax = int(a.max()) if val.size else 0
    if vmax < 128:
        vdt = np.int8
    elif vmax < (1 << 15):
        vdt = np.int16
    else:
        vdt = np.int32
    bucket = 64
    while bucket < nz.size:
        bucket *= 2
    if bucket * (4 + np.dtype(vdt).itemsize) >= dense_bytes:
        return None
    pad = bucket - nz.size
    if pad:
        fi = nz[0] if nz.size else np.int32(0)
        fv = val[0] if val.size else 0
        nz = np.concatenate([nz, np.full(pad, fi, np.int32)])
        val = np.concatenate([val, np.full(pad, fv, val.dtype)])
    return QuantizedUpload(val.astype(vdt), nz, _EMPTY_I32,
                           tuple(vals_T.shape))


def _padded_patch(vals_narrow: np.ndarray, over: np.ndarray,
                  flat: np.ndarray) -> QuantizedUpload:
    """Bucket-pad the (idx, exact-val) overflow patch (duplicating entry
    0 — identical scatter writes, so duplicates are harmless) to bound
    recompiles of the device widen program."""
    val = flat[over]
    bucket = 8
    while bucket < over.size:
        bucket *= 2
    pad = bucket - over.size
    idx = np.concatenate([over, np.full(pad, over[0], np.int32)])
    val = np.concatenate([val, np.full(pad, val[0], np.int32)])
    return QuantizedUpload(vals_narrow, idx, val)


def pack_quantized_upload(vals_T: np.ndarray) -> QuantizedUpload:
    """Narrow an int32 quantized matrix to int8/int16 even when a handful
    of entries overflow, carrying the overflows as an exact sparse patch.

    Real RD operating points put almost all mass near zero (that is why
    RLGR works); at the measured serving point exactly 1 of 1.8M
    coefficients exceeded int16, yet the all-or-nothing
    :func:`quantized_upload_array` fell back to a full int32 upload —
    double the bytes on the remote-host tunnel for one outlier. Patch
    policies: int16+patch while the patch (8 B/entry) costs at most half
    the 2 B/entry narrowing win vs int32, i.e. ``P <= size // 8``;
    int8+patch while it costs at most half the 1 B/entry win vs int16,
    ``P <= size // 16``. Narrowing casts wrap the overflow entries; the
    patch overwrites them exactly on device. ``RAHT3DGS_UPLOAD_PATCH=0``
    restores the all-or-nothing int16/int32 behavior for A/B tests.
    """
    if vals_T.dtype != np.int32:
        return QuantizedUpload(vals_T, _EMPTY_I32, _EMPTY_I32)
    flat = vals_T.reshape(-1)
    a = np.abs(flat, dtype=np.int64)
    over8 = np.flatnonzero(a >= 128).astype(np.int32)
    patch_ok = _upload_patch_enabled()
    if over8.size == 0:
        dense = QuantizedUpload(
            vals_T.astype(np.int8), _EMPTY_I32, _EMPTY_I32
        )
    elif patch_ok and over8.size <= flat.size // 16:
        dense = _padded_patch(vals_T.astype(np.int8), over8, flat)
    else:
        over16 = over8[a[over8] >= (1 << 15)]  # subset of over8
        if over16.size == 0:
            dense = QuantizedUpload(
                vals_T.astype(np.int16), _EMPTY_I32, _EMPTY_I32
            )
        elif not patch_ok or over16.size > flat.size // 8:
            dense = QuantizedUpload(vals_T, _EMPTY_I32, _EMPTY_I32)
        else:
            dense = _padded_patch(vals_T.astype(np.int16), over16, flat)
    if _upload_sparse_enabled():
        dense_bytes = (dense.vals.nbytes + dense.patch_idx.nbytes
                       + dense.patch_val.nbytes)
        nnz = int(np.count_nonzero(flat))
        if nnz * 5 < dense_bytes:  # cheap pre-check before flatnonzero
            sp = _sparse_upload(
                vals_T, np.flatnonzero(flat).astype(np.int32),
                dense_bytes)
            if sp is not None:
                return sp
    return dense


@jax.jit
def _widen_patch_device(vals, idx, val):
    flat = vals.astype(jnp.int32).reshape(-1)
    # pad duplicates write the same (idx, val) — order is immaterial
    flat = flat.at[idx].set(val, unique_indices=False)
    return flat.reshape(vals.shape)


@partial(jax.jit, static_argnames=("shape",))
def _scatter_sparse_device(idx, val, shape):
    """Rebuild the dense channel matrix from the sparse wire tier: one
    scatter of the nonzeros into zeros (pad duplicates rewrite entry 0's
    own value — harmless)."""
    size = 1
    for s in shape:
        size *= s
    flat = jnp.zeros((size,), val.dtype).at[idx].set(
        val, unique_indices=False)
    return flat.reshape(shape)


def upload_quantized(up: QuantizedUpload):
    """Move a :class:`QuantizedUpload` to device. Dense tiers apply the
    overflow patch in a tiny scatter dispatch; the sparse tier scatters
    the nonzeros into zeros. Returns a device array bitwise equal (after
    int32 widening) to the original int32 matrix; dtype is the narrowed
    int8/int16 when exact (consumers widen), int32 otherwise."""
    if up.shape is not None:
        return _scatter_sparse_device(
            jnp.asarray(up.patch_idx), jnp.asarray(up.vals), up.shape)
    vals = jnp.asarray(up.vals)
    if up.patch_idx.size == 0:
        return vals
    return _widen_patch_device(
        vals, jnp.asarray(up.patch_idx), jnp.asarray(up.patch_val)
    )


@partial(jax.jit, static_argnames=("dtype", "quant_mode"))
def _dequant_gather_device(vals_T, inv, steps, dtype, quant_mode="mid",
                           delta=0.0):
    """(D, N) channel-major stream values -> dequantized (N, D) coefficients
    back in transform position (inverse permutation as a wide gather).
    ``quant_mode`` "deadzone" reconstructs at ``sign(q)*(|q|+delta)*step``
    (the stream's recorded reconstruction offset)."""
    if quant_mode == "deadzone":
        return dequantize_biased(vals_T.T[inv], steps, delta, dtype=dtype)
    return dequantize(vals_T.T[inv], steps, dtype=dtype)


@partial(jax.jit, static_argnames=("depth",))
def _inverse_device(coeffs, codes, weights, depth):
    from raht3dgs_tpu.ops.raht_span import raht_inverse_span

    return raht_inverse_span(coeffs, codes, weights, depth)


@jax.jit
def _scale_sqrt_w(attributes, weights):
    """``attrs * sqrt(w)`` — the predicted loop's true coefficients are the
    standard forward transform of this scaled input (identity for the
    common unit-weight voxelized case); see ops/praht_device.py."""
    return attributes * jnp.sqrt(weights.astype(attributes.dtype))[:, None]


class AttributeCodec:
    """Encode/decode attribute frames at a fixed octree depth.

    One instance caches jitted programs per (bucketed shape, depth); reuse it
    across frames and quantization steps (the reference's RD sweeps reuse
    the transform across steps the same way, ``encode_ply.py:145``).
    """

    def __init__(
        self,
        depth: int,
        dtype=jnp.float64,
        order_mode: str = "ragft",
        impl: Optional[str] = None,
        chunk: int = 0,
        quant_mode: str = "mid",
        quant_f: float = 0.3,
        rec_delta: float = 0.12,
        entropy: str = "rlgr",
        predict: bool = False,
        predict_impl: Optional[str] = None,
    ):
        import os

        _require_x64(dtype, depth)
        self.depth = depth
        self.dtype = dtype
        # Quantizer: "mid" = the reference's round-half-up (bitwise parity
        # default); "deadzone" = sign-symmetric dead-zone with encoder
        # offset quant_f and reconstruction offset rec_delta (recorded in
        # the stream; opt-in RD improver, ops/quantize.py).
        if quant_mode not in ("mid", "deadzone"):
            raise ValueError(f"unknown quant_mode {quant_mode!r}")
        self.quant_mode = quant_mode
        self.quant_f = float(quant_f)
        self.rec_delta = float(rec_delta)
        # Coefficient stream order: "ragft" (reference Python drivers),
        # "weight_desc" (MATLAB encoder_RAHT_RLGR.m), or "morton".
        self.order_mode = order_mode
        # Forward-transform implementation (span / dense / compact / scan /
        # golden). "span" (closed form) is the TPU fast path and the
        # default; "dense" is the bitwise golden used by the 1e-12
        # crosscheck tooling. "golden" runs the transform on HOST through
        # the ragged numpy golden (ops/prelude.py) with torch-compatible
        # sqrt — bit-identical coefficients to the torch reference
        # pipeline, so streams are byte-identical even at quantization tie
        # points (scripts/rd_parity_j18.py); it is a parity tool, not a
        # performance path.
        self.impl = impl or os.environ.get("RAHT3DGS_RAHT_IMPL", "span")
        if self.impl == "golden":
            if self.order_mode != "ragft":
                raise ValueError(
                    "impl='golden' (reference byte parity) supports only "
                    f"the 'ragft' coefficient order, got {order_mode!r}"
                )
            if self.quant_mode != "mid":
                raise ValueError(
                    "impl='golden' replays the reference quantizer only "
                    f"(quant_mode='mid'), got {quant_mode!r}"
                )
            if depth > 20:
                raise ValueError(
                    "impl='golden' covers the reference's int64 Morton "
                    f"range (depth <= 20), got {depth}"
                )
            self._golden_cache: Optional[tuple] = None
        # Entropy chunk size: 0 = sequential streams (reference-compatible
        # automaton per channel); >0 = self-contained chunks that encode and
        # decode in parallel on multi-core hosts (codec/rlgr.py).
        self.chunk = int(chunk)
        # Entropy coder: "rlgr" (reference parity), "rac" (adaptive-binary
        # profile, -7..-13% rate at identical reconstructions), "auto"
        # (per-channel min of both — never worse than rlgr). The choice is
        # recorded per channel in the stream (container v5 entropy map),
        # so decode needs no matching option.
        if entropy not in ("rlgr", "rac", "auto"):
            raise ValueError(f"unknown entropy coder {entropy!r}")
        self.entropy = entropy
        # Inter-depth predicted RAHT (ops/praht.py): encode codes
        # prediction residuals in the same stream layout; opt-in RD
        # improver. Decode is flag-driven (any codec instance decodes a
        # predicted stream), so `predict` only steers the encoder.
        if predict:
            if self.order_mode != "ragft":
                raise ValueError(
                    "predict=True needs the RA-GFT coefficient order "
                    "(the depth groups must be stream-sequential), got "
                    f"{order_mode!r}"
                )
            if self.impl == "golden":
                raise ValueError(
                    "impl='golden' is the reference byte-parity mode; "
                    "the predicted transform has no reference "
                    "counterpart — drop one of the two"
                )
        self.predict = bool(predict)
        # Predicted-loop encoder implementation: "host" (ops/praht.py —
        # the frozen closed-loop spec, bitwise encoder==decoder), "device"
        # (ops/praht_device.py — the whole per-step loop as one jitted
        # program; emits the same stream format, symbols observed bitwise
        # equal on CPU and within quantization-tie ulps anywhere), or
        # "auto" (default: device on accelerator backends, host on CPU).
        # Decode ALWAYS replays the frozen host loop.
        predict_impl = predict_impl or os.environ.get(
            "RAHT3DGS_PRAHT_IMPL", "auto")
        if predict_impl not in ("host", "device", "auto"):
            raise ValueError(
                f"unknown predict_impl {predict_impl!r} "
                "(choose host, device or auto)"
            )
        if predict_impl == "device" and depth > 20:
            raise ValueError(
                "predict_impl='device' covers the int32/int64 code tiers "
                f"(depth <= 20), got depth={depth}; use 'host'"
            )
        self.predict_impl = predict_impl
        # step-independent predicted-loop state (ops/praht.py): geometry
        # plans and true-coefficient caches shared across a sweep's steps,
        # a rate search's probes, and the temporal codec's intra/residual
        # candidate pair (same geometry, two attribute sets). Small FIFOs —
        # plans are O(N) host memory. The device cache holds (coeffs,
        # order, device plan) keyed by frame-array identity.
        self._praht_plans: dict = {}
        self._praht_tcs: dict = {}
        self._praht_dev_cache: dict = {}

    # -- encoding ---------------------------------------------------------

    def _praht_context(self, codes_np: np.ndarray, w_np: np.ndarray,
                       fdtype, attrs_np: Optional[np.ndarray] = None):
        """(plan, true_coeffs-or-None) for one frame's real rows, cached by
        content hash (sweeps/searches re-enter per step; the praht call
        itself re-verifies the plan against the codes, so a hash collision
        cannot decode the wrong stream)."""
        import hashlib

        gkey = (
            codes_np.shape[0], self.depth, np.dtype(fdtype).name,
            hashlib.sha1(codes_np.tobytes()).hexdigest(),
            hashlib.sha1(np.ascontiguousarray(w_np).tobytes()).hexdigest(),
        )
        plan = self._praht_plans.get(gkey)
        if plan is None:
            from raht3dgs_tpu.ops.praht import praht_plan

            plan = praht_plan(codes_np, w_np, self.depth, fdtype=fdtype)
            while len(self._praht_plans) >= 2:
                self._praht_plans.pop(next(iter(self._praht_plans)))
            self._praht_plans[gkey] = plan
        if attrs_np is None:
            return plan, None
        tkey = gkey + (
            hashlib.sha1(np.ascontiguousarray(attrs_np).tobytes())
            .hexdigest(),
        )
        tc = self._praht_tcs.get(tkey)
        if tc is None:
            from raht3dgs_tpu.ops.praht import praht_true_coeffs

            tc = praht_true_coeffs(plan, attrs_np)
            while len(self._praht_tcs) >= 4:
                self._praht_tcs.pop(next(iter(self._praht_tcs)))
            self._praht_tcs[tkey] = tc
        return plan, tc

    def _entropy_stream(self, q_np: np.ndarray, frame: VoxelFrame, steps,
                        predict_mask: Optional[int] = None):
        return build_entropy_stream(
            q_np, frame, steps, depth=self.depth,
            order_mode=self.order_mode, chunk=self.chunk,
            quant_mode=self.quant_mode, quant_f=self.quant_f,
            rec_delta=self.rec_delta,
            dtype32=jnp.dtype(self.dtype) == jnp.dtype("float32"),
            entropy=self.entropy,
            predict=predict_mask is not None,
            predict_mask=predict_mask or 0,
        )

    def _praht_fdtype(self, stream: Optional[FrameStream] = None):
        """The predicted loop's numpy dtype: decode replays the encoder's
        recorded precision (the closed loop depends on it), encode uses
        the codec's own."""
        if stream is not None:
            return np.float32 if stream.dtype32 else np.float64
        return (
            np.float32
            if jnp.dtype(self.dtype) == jnp.dtype("float32")
            else np.float64
        )

    def _praht_encode(self, frame: VoxelFrame, steps,
                      timer: StageTimer) -> EncodedFrame:
        """Host closed-loop predicted-RAHT encode (ops/praht.py); the
        step-independent plan + true coefficients come from the per-frame
        cache, so sweeps and rate searches pay the geometry work once."""
        from raht3dgs_tpu.ops.praht import praht_encode

        n = frame.n_voxels
        codes_np = np.asarray(frame.codes)[:n]
        attrs_np = np.asarray(frame.attributes)[:n]
        w_np = np.asarray(frame.weights)[:n]
        fdtype = self._praht_fdtype()

        def _run():
            plan, tc = self._praht_context(codes_np, w_np, fdtype, attrs_np)
            return praht_encode(
                codes_np, attrs_np, w_np, self.depth,
                np.atleast_1d(np.asarray(steps, dtype=np.float64)),
                quant_mode=self.quant_mode, quant_f=self.quant_f,
                rec_delta=self.rec_delta, fdtype=fdtype,
                plan=plan, true_coeffs=tc,
            )

        sym_T, mask, _ = timer.time("RAHT_transform_time", _run)
        stream, enc_ns = self._entropy_stream(
            sym_T, frame, steps, predict_mask=mask
        )
        timer.add("Entropy_enc_time", enc_ns / 1e9)
        return EncodedFrame(stream=stream, timer=timer)

    # -- device predicted-RAHT encoder (ops/praht_device.py) ----------------

    def _predict_on_device(self) -> bool:
        """Resolve the predicted-encoder implementation for this process.

        "auto" picks the device program on accelerator backends (where the
        host numpy loop would serialize a ~100x-slower closed loop per
        step) and the frozen host loop on CPU. Decode is host either way.
        """
        if self.predict_impl == "auto":
            import jax

            return self.depth <= 20 and jax.default_backend() != "cpu"
        return self.predict_impl == "device"

    def _praht_dev_context(self, frame: VoxelFrame):
        """(true-coeffs, ragft order, device plan) for one frame, cached by
        array identity (sweeps and rate searches re-enter per step; entries
        pin the arrays alive so ids cannot be recycled)."""
        key = (id(frame.codes), id(frame.weights), id(frame.attributes))
        ent = self._praht_dev_cache.get(key)
        if ent is None:
            from raht3dgs_tpu.ops.praht_device import praht_device_plan

            scaled = _scale_sqrt_w(frame.attributes, frame.weights)
            coeffs, order, structure = _transform_device(
                frame.codes, scaled, frame.weights, self.depth,
                "ragft", self.impl,
            )
            plan = praht_device_plan(
                frame.codes, frame.weights, self.depth,
                structure.drop_level, structure.subtree_w,
            )
            while len(self._praht_dev_cache) >= 2:
                self._praht_dev_cache.pop(next(iter(self._praht_dev_cache)))
            ent = (frame, coeffs, order, plan)
            self._praht_dev_cache[key] = ent
        return ent[1], ent[2], ent[3]

    def _praht_dev_dispatch(self, frame: VoxelFrame, steps):
        """Dispatch one step's device closed loop (async). Returns
        ``(q_T, fetch stats or None, maskbits device scalar)``."""
        from raht3dgs_tpu.ops.praht_device import praht_device_encode

        coeffs, order, plan = self._praht_dev_context(frame)
        steps_j = jnp.atleast_1d(jnp.asarray(steps, dtype=self.dtype))
        sym, maskbits, _rec = praht_device_encode(
            plan, frame.codes, frame.weights, coeffs, self.depth, steps_j,
            quant_mode=self.quant_mode, qf=self.quant_f,
            rec_delta=self.rec_delta,
        )
        q_T = _reorder_T_device(sym, order, jnp.int32(frame.n_voxels))
        st = _fetch_stats(q_T) if _narrow_fetch_enabled() else None
        return q_T, st, maskbits

    def _praht_encode_device(self, frame: VoxelFrame, steps,
                             timer: StageTimer) -> EncodedFrame:
        """Device predicted-RAHT encode: same stream format as the host
        encoder (see ops/praht_device.py on why encoder-side float drift
        cannot break the signalled format)."""
        q_T, st, maskbits = timer.time(
            "RAHT_transform_time", self._praht_dev_dispatch, frame, steps)

        def _fetch():
            q_np = _finish_fetch(_start_fetch(
                q_T, np.asarray(st) if st is not None else None))
            return q_np, int(maskbits)

        q_np, mask = timer.time("Quant_time", _fetch)
        stream, enc_ns = self._entropy_stream(
            q_np, frame, steps, predict_mask=mask
        )
        timer.add("Entropy_enc_time", enc_ns / 1e9)
        return EncodedFrame(stream=stream, timer=timer)

    def _praht_sweep_device(self, frame: VoxelFrame,
                            steps_list) -> List[EncodedFrame]:
        """Pipelined device predicted sweep: every step's closed loop is
        dispatched up front (async; the step-independent plan is shared),
        then symbol fetches drain through the bounded window while the
        host runs the entropy coder — the same overlap schedule as the
        plain :meth:`encode_sweep`."""
        pend = [self._praht_dev_dispatch(frame, s) for s in steps_list]
        window = _fetch_window(len(pend))
        out: List[EncodedFrame] = []
        bufs: List[tuple] = []
        i = 0
        while len(out) < len(pend):
            while len(bufs) < window and i < len(pend):
                q_T, st, maskbits = pend[i]
                bufs.append((steps_list[i], maskbits, _start_fetch(
                    q_T, np.asarray(st) if st is not None else None)))
                i += 1
            s, maskbits, pending = bufs.pop(0)
            timer = StageTimer()
            q_np = timer.time("Quant_time", _finish_fetch, pending)
            stream, enc_ns = self._entropy_stream(
                q_np, frame, s, predict_mask=int(maskbits))
            timer.add("Entropy_enc_time", enc_ns / 1e9)
            out.append(EncodedFrame(stream=stream, timer=timer))
        return out

    # -- golden (reference byte-parity) host path ---------------------------

    def _golden_prelude(self, codes, nvox: int):
        """Ragged reference prelude on the real code slice, cached by
        content hash (decode sweeps re-enter per step)."""
        import hashlib

        from raht3dgs_tpu.ops.prelude import prelude

        codes_np = np.asarray(codes)[:nvox].astype(np.int64)
        key = (nvox, hashlib.sha1(codes_np.tobytes()).hexdigest())
        if self._golden_cache is not None and self._golden_cache[0] == key:
            return self._golden_cache[1]
        out = prelude(codes_np, 3 * self.depth)
        self._golden_cache = (key, out)
        return out

    def _golden_transform(self, frame: VoxelFrame):
        from raht3dgs_tpu.ops.prelude import parity_sqrt, raht_forward_lists

        n = frame.n_voxels
        P = frame.codes.shape[0]
        w_np = np.asarray(frame.weights)[:n]
        if not np.all(w_np == 1):
            raise ValueError(
                "impl='golden' replays the reference pipeline, which has "
                "unit leaf weights (unique-voxel inputs); this frame "
                "carries multiplicity weights"
            )
        Lists, Flags, weights, order = self._golden_prelude(frame.codes, n)
        attrs = np.asarray(frame.attributes)[:n].astype(np.float64)
        T, _w = raht_forward_lists(attrs, Lists, Flags, weights,
                                   sqrt_fn=parity_sqrt())
        coeffs = np.zeros((P, attrs.shape[1]), dtype=np.float64)
        coeffs[:n] = T
        # pads already last -> the downstream pads-last reorder is a no-op
        order_p = np.concatenate(
            [order, np.arange(n, P, dtype=np.int64)]
        ).astype(np.int32)
        return coeffs, order_p

    def transform(self, frame: VoxelFrame, timer: Optional[StageTimer] = None):
        """Forward RAHT + RA-GFT order (device). Returns (coeffs, order, structure)."""
        timer = timer or StageTimer()
        if self.impl == "golden":
            coeffs, order = timer.time(
                "RAHT_transform_time", self._golden_transform, frame
            )
            return coeffs, order, None, timer
        coeffs, order, structure = timer.time(
            "RAHT_transform_time",
            _transform_device,
            frame.codes,
            frame.attributes,
            frame.weights,
            self.depth,
            self.order_mode,
            self.impl,
        )
        return coeffs, order, structure, timer

    def encode(
        self,
        frame: VoxelFrame,
        steps,
        coeffs=None,
        order=None,
        timer: Optional[StageTimer] = None,
    ) -> EncodedFrame:
        """Full encode: transform (unless given), quantize, reorder, RLGR."""
        timer = timer or StageTimer()
        if self.predict:
            if self._predict_on_device():
                return self._praht_encode_device(frame, steps, timer)
            return self._praht_encode(frame, steps, timer)
        if coeffs is None or order is None:
            coeffs, order, _, timer = self.transform(frame, timer)
        steps_arr = jnp.atleast_1d(jnp.asarray(steps, dtype=self.dtype))
        q_T = timer.time(
            "Quant_time", _quant_reorder_device, coeffs, steps_arr, order,
            jnp.int32(frame.n_voxels), self.quant_mode,
            jnp.asarray(self.quant_f, dtype=self.dtype),
        )
        # Single device->host transfer; the full (D, Np) matrix stays
        # C-contiguous (a column slice would disqualify the one-call native
        # batch path) and each channel encodes its real [:n_voxels] prefix.
        q_np = _narrow_fetch(q_T)
        stream, enc_ns = self._entropy_stream(q_np, frame, steps)
        timer.add("Entropy_enc_time", enc_ns / 1e9)
        return EncodedFrame(stream=stream, timer=timer)

    def encode_sweep(
        self,
        frame: VoxelFrame,
        steps_list,
        coeffs=None,
        order=None,
    ) -> List[EncodedFrame]:
        """Pipelined quantization-step sweep (byte-identical streams).

        Equivalent to ``[self.encode(frame, s, coeffs, order) for s in
        steps_list]`` but with host/device overlap: all steps' quantize+
        reorder programs are dispatched first (JAX async dispatch), the
        device->host copies start asynchronously in dispatch order, and
        the host then drains the RLGR coder — step k's entropy overlaps
        step k+1's device work and transfer. The reference sweep is
        strictly serial (``/root/reference/python/encode_ply.py:147-188``).

        Per-step "Quant_time" is the *wait* for that step's result
        (overlap shows up as ~0), so summed stage columns track the
        pipelined wall time without double counting.
        """
        if self.predict:
            if self._predict_on_device():
                return self._praht_sweep_device(frame, steps_list)
            # every step is its own closed loop (the reconstruction the
            # prediction feeds on depends on the step); the step-
            # independent geometry plan + true coefficients are hoisted
            # through the per-frame cache (_praht_context) — the first
            # step builds them, the rest reuse (~5x at 1M/J=18,
            # docs/rd_predict.md)
            return [self.encode(frame, s) for s in steps_list]
        if coeffs is None or order is None:
            coeffs, order, _, _ = self.transform(frame)
        narrow = _narrow_fetch_enabled()
        nvox = jnp.int32(frame.n_voxels)
        pend = []
        qf = jnp.asarray(self.quant_f, dtype=self.dtype)
        # hoist the reorder gather out of the per-step programs: one row
        # gather serves the whole sweep (quantization is elementwise and
        # commutes with the permutation bitwise — _reorder_T_device)
        coeffs_T = _reorder_T_device(coeffs, order, nvox)
        for s in steps_list:
            sa = jnp.atleast_1d(jnp.asarray(s, dtype=self.dtype))
            q_T = _quant_T_device(coeffs_T, sa, self.quant_mode, qf)
            pend.append((s, q_T, _fetch_stats(q_T) if narrow else None))
        # bounded fetch window: keep at most W async host copies in flight
        # (the next step's transfer overlaps this step's entropy coding).
        # An unbounded queue measured FASTER on a quiet tunnel but can
        # thrash it with many large buffers queued (56ch x 131k sweeps
        # measured 0.4-0.8x serial); W=2 keeps the overlap that matters.
        # RAHT3DGS_FETCH_WINDOW=0 restores the unbounded queue.
        #
        # Round 5: the fetches run on a dedicated THREAD (finish+widen
        # fully overlap the entropy coder — async copies alone overlap
        # only ~60% through the tunnel, scripts/exp_e2e_schedule.py), and
        # the per-step (3,) stats arrays are fetched as ONE stacked array
        # (each tiny fetch costs a full tunnel RTT). Byte-identity with
        # the serial API is unchanged and pinned by the sweep tests.
        import queue as _queue
        import threading as _threading

        window = _fetch_window(len(pend))
        sts = (np.asarray(jnp.stack([st for _, _, st in pend]))
               if narrow else None)
        fetched: _queue.Queue = _queue.Queue(maxsize=window)
        errs: list = []
        STOP = object()

        def fetcher():
            try:
                inflight: List = []
                j = 0
                for _ in range(len(pend)):
                    while j < len(pend) and len(inflight) < window:
                        inflight.append(_start_fetch(
                            pend[j][1],
                            sts[j] if sts is not None else None))
                        j += 1
                    fetched.put(_finish_fetch(inflight.pop(0)))
            except BaseException as e:  # noqa: BLE001 - re-raised below
                errs.append(e)
                fetched.put(STOP)

        th = _threading.Thread(target=fetcher)
        th.start()
        out: List[EncodedFrame] = []
        try:
            for k in range(len(pend)):
                timer = StageTimer()
                q_np = timer.time("Quant_time", fetched.get)
                if q_np is STOP:
                    break
                stream, enc_ns = self._entropy_stream(q_np, frame,
                                                      pend[k][0])
                timer.add("Entropy_enc_time", enc_ns / 1e9)
                out.append(EncodedFrame(stream=stream, timer=timer))
        finally:
            # unblock the fetcher if we bailed early (full queue would
            # wedge its put); a completed run skips this instantly
            while th.is_alive():
                try:
                    fetched.get(timeout=0.1)
                except _queue.Empty:
                    pass
            th.join()
        if errs:
            raise errs[0]
        return out

    # -- decoding ---------------------------------------------------------

    def decode(
        self,
        stream: FrameStream,
        codes: jnp.ndarray,
        weights: jnp.ndarray,
        timer: Optional[StageTimer] = None,
    ) -> Tuple[np.ndarray, StageTimer]:
        """Decode a stream given the (losslessly known) voxel codes.

        ``codes``/``weights`` are the same padded arrays the encoder used —
        the decoder rebuilds the transform structure from positions alone,
        mirroring the reference decode path (``encode_ply.py:199-208``).
        Returns attributes for the real voxel slots, shape (n_voxels, D).
        (The full decode IS the n_voxels-prefix progressive decode.)
        """
        return self.decode_progressive(
            stream, codes, weights, stream.n_voxels, timer=timer
        )

    def decode_progressive(
        self,
        stream: FrameStream,
        codes: jnp.ndarray,
        weights: jnp.ndarray,
        n_coeffs: int,
        timer: Optional[StageTimer] = None,
    ) -> Tuple[np.ndarray, StageTimer]:
        """Decode only the first ``n_coeffs`` stream symbols per channel.

        Both supported coefficient orders put the structurally coarsest
        coefficients first (the RA-GFT order lists DC/survivors before
        details — ops/reorder.py; the weight-descending order sorts by
        subtree weight), so a stream PREFIX is a coarse-to-fine preview:
        the skipped symbols reconstruct as exact-zero detail coefficients
        (both the mid-tread and dead-zone dequantizers map 0 -> 0) and the
        inverse transform spreads the decoded coarse signal over the full
        voxel set. ``n_coeffs >= stream.n_voxels`` reproduces ``decode``
        bitwise (tests/test_progressive.py pins it). RLGR prefixes decode
        standalone — the adaptive automaton's state depends only on
        already-decoded symbols — and with chunked entropy streams
        (``--entropy-chunk``) the prefix is *byte-addressable*:
        :func:`progressive_prefix_bytes` reports what a receiver must
        actually hold to run this. The reference has no progressive path
        (its decode always materializes every coefficient,
        ``encode_ply.py:179-208``).
        """
        timer = timer or StageTimer()
        n_padded = codes.shape[0]
        nvox = stream.n_voxels
        D = stream.n_channels
        k = int(min(max(n_coeffs, 1), nvox))
        if nvox > n_padded:
            raise ValueError(
                f"stream encodes {nvox} voxels but the provided positions "
                f"only cover {n_padded} padded slots — positions do not "
                "match this stream"
            )
        if stream.predict:
            return self._praht_decode(stream, codes, weights, k, timer)
        if self.impl == "golden":
            return self._golden_decode(stream, codes, weights, k, timer)

        inv = timer.time(
            "Coeff_reorder_dec_time", _inverse_order_device, codes, weights,
            jnp.int32(nvox), self.depth, stream.order_mode,
        )
        # zeros beyond the decoded prefix ARE the truncated coefficients
        vals_T = np.zeros((D, n_padded), dtype=np.int32)
        _, dec_ns = decode_entropy_channels(stream, k, vals_T)
        timer.add("Entropy_dec_time", dec_ns / 1e9)

        steps = jnp.asarray(
            stream.steps if stream.steps.shape[0] > 1 else stream.steps[0],
            dtype=self.dtype,
        )
        coeffs = timer.time(
            "Dequant_time", _dequant_gather_device,
            upload_quantized(pack_quantized_upload(vals_T)), inv,
            steps, self.dtype, stream.quant_mode,
            jnp.asarray(stream.rec_delta, dtype=self.dtype),
        )
        attrs = timer.time(
            "iRAHT_time", _inverse_device, coeffs, codes, weights, self.depth
        )
        return np.asarray(attrs)[:nvox], timer

    def _praht_decode(self, stream: FrameStream, codes, weights, k: int,
                      timer: StageTimer,
                      lod_depth: Optional[int] = None):
        """Host decode of a predicted-RAHT stream (flag-driven — any codec
        instance handles it; the loop replays the encoder's recorded
        dtype). Symbols past the ``k``-prefix stay zero residuals, so a
        truncated stream reconstructs as the prediction cascade."""
        if stream.order_mode != "ragft":
            raise ValueError(
                "corrupt stream: predicted transform requires the RA-GFT "
                f"coefficient order, stream has {stream.order_mode!r}"
            )
        from raht3dgs_tpu.ops.praht import praht_decode

        nvox = stream.n_voxels
        vals_T = np.zeros((stream.n_channels, nvox), dtype=np.int32)
        _, dec_ns = decode_entropy_channels(stream, k, vals_T)
        timer.add("Entropy_dec_time", dec_ns / 1e9)
        codes_np = np.asarray(codes)[:nvox]
        w_np = np.asarray(weights)[:nvox]
        fdtype = self._praht_fdtype(stream)

        def _run():
            plan, _ = self._praht_context(codes_np, w_np, fdtype)
            return praht_decode(
                vals_T, codes_np, w_np, self.depth,
                stream.steps if stream.steps.shape[0] > 1
                else stream.steps[0],
                predict_mask=stream.predict_mask,
                quant_mode=stream.quant_mode, quant_f=stream.quant_f,
                rec_delta=stream.rec_delta,
                fdtype=fdtype, lod_depth=lod_depth, plan=plan,
            )

        out = timer.time("iRAHT_time", _run)
        return out, timer

    def _golden_decode(self, stream: FrameStream, codes, weights, k: int,
                       timer: StageTimer) -> Tuple[np.ndarray, StageTimer]:
        """Host decode mirroring the reference's op order bit-for-bit:
        RLGR -> dequant (q * step) -> inverse RA-GFT reorder -> ragged
        iRAHT with torch-compatible sqrt (``encode_ply.py:199-208``)."""
        if stream.order_mode != "ragft" or stream.quant_mode != "mid":
            raise ValueError(
                "impl='golden' decodes reference-shaped streams only "
                "(ragft order, mid quantizer)"
            )
        # same contract as the encode side: the ragged golden rebuilds
        # unit-leaf run-length weights from codes alone, so multiplicity
        # weights would silently invert with the wrong butterflies
        if not np.all(np.asarray(weights)[: stream.n_voxels] == 1):
            raise ValueError(
                "impl='golden' replays the reference pipeline, which has "
                "unit leaf weights (unique-voxel inputs); this frame "
                "carries multiplicity weights"
            )
        from raht3dgs_tpu.ops.prelude import (
            parity_sqrt,
            raht_inverse_lists,
        )

        nvox = stream.n_voxels
        D = stream.n_channels
        Lists, Flags, weights_l, order = timer.time(
            "Coeff_reorder_dec_time", self._golden_prelude, codes, nvox
        )
        vals_T = np.zeros((D, nvox), dtype=np.int32)
        _, dec_ns = decode_entropy_channels(stream, k, vals_T)
        timer.add("Entropy_dec_time", dec_ns / 1e9)

        def _dequant():
            steps = stream.steps if stream.steps.shape[0] > 1 else stream.steps[0]
            deq = vals_T.T.astype(np.float64) * steps  # (nvox, D) stream order
            coeffs = np.empty((nvox, D), dtype=np.float64)
            coeffs[order] = deq
            return coeffs

        coeffs = timer.time("Dequant_time", _dequant)
        rec = timer.time(
            "iRAHT_time", raht_inverse_lists, coeffs, Lists, Flags,
            weights_l, sqrt_fn=parity_sqrt(),
        )
        return rec, timer

    def decode_lod(
        self,
        stream: FrameStream,
        codes: jnp.ndarray,
        weights: jnp.ndarray,
        lod_depth: int,
        timer: Optional[StageTimer] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Level-of-detail decode: the frame at octree depth ``lod_depth``.

        Decodes exactly the stream prefix that carries the transform's
        coefficients ABOVE the level-``lod_depth`` cells
        (:func:`lod_prefix_count` — the RA-GFT order makes that cut a
        prefix), reconstructs, and collapses each cell to one output row.
        For unit leaf weights (every driver workload: inputs are unique
        voxels) the truncated-Haar reconstruction is constant across a
        cell's leaves and equals the cell's MEAN attributes exactly — the
        transform's own LOD, not a post-hoc downsample. With multiplicity
        weights the truncation scales leaf ``i`` by ``sqrt(w_i / W_cell)``
        (RAHT's weighted-butterfly geometry), so the returned attribute is
        the reconstruction sampled at each cell's first leaf. Requires the
        RA-GFT coefficient order (the weight-descending order interleaves
        depths).

        Returns ``(positions_int (M, 3) at depth lod_depth, attrs (M, D),
        cell_weights (M,))``.
        """
        if stream.order_mode != "ragft":
            raise ValueError(
                "decode_lod needs the RA-GFT coefficient order (stream has "
                f"{stream.order_mode!r}) — only there is a depth cut a "
                "stream prefix"
            )
        timer = timer or StageTimer()
        nvox = stream.n_voxels
        codes_np = np.asarray(codes)[:nvox]
        k = lod_prefix_count(codes_np, self.depth, lod_depth)
        if stream.predict:
            # the predicted loop yields the reconstructed cell means AT
            # the cut depth directly — no leaf pass, no collapse
            if nvox > codes.shape[0]:
                raise ValueError(
                    f"stream encodes {nvox} voxels but the provided "
                    f"positions only cover {codes.shape[0]} padded slots "
                    "— positions do not match this stream"
                )
            (cell_codes, means, cell_w), timer = self._praht_decode(
                stream, codes, weights, k, timer, lod_depth=lod_depth
            )
            from raht3dgs_tpu.ops.praht import _decode_axes_np

            return _decode_axes_np(cell_codes, lod_depth), means, cell_w
        rec, timer = self.decode_progressive(
            stream, codes, weights, k, timer=timer
        )
        shift = 3 * (self.depth - lod_depth)
        coarse = (
            codes_np.astype(np.uint64) >> np.uint64(shift)
            if shift else codes_np.astype(np.uint64)
        )
        firsts = np.concatenate([[True], coarse[1:] != coarse[:-1]])
        idx = np.nonzero(firsts)[0]
        w_np = np.asarray(weights)[:nvox].astype(np.float64)
        cell_w = np.add.reduceat(w_np, idx)
        from raht3dgs_tpu.ops.morton import morton_decode

        pos = np.asarray(
            morton_decode(jnp.asarray(coarse[idx].astype(np.int64)),
                          lod_depth)
        )
        return pos, rec[idx], cell_w


def _msb_np(x: np.ndarray) -> np.ndarray:
    """Index of the most-significant set bit (x > 0), vectorized numpy."""
    x = x.astype(np.uint64)
    b = np.zeros(x.shape, np.int32)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        b += big.astype(np.int32) * s
        x = np.where(big, x >> np.uint64(s), x)
    return b


def lod_prefix_count(codes_np: np.ndarray, depth: int, lod_depth: int) -> int:
    """Stream symbols covering an LOD cut at octree depth ``lod_depth``.

    In the RA-GFT order, detail coefficients are grouped by octree depth,
    coarsest first (ops/reorder.py) — so the coefficients an LOD-``L``
    reconstruction needs (the DC plus every detail from merges ABOVE the
    level-``L`` cells, i.e. merge bit-level > 3*(depth-L)) form a stream
    PREFIX. ``codes_np`` are the frame's real (unpadded) sorted unique
    Morton codes.
    """
    if not 1 <= lod_depth <= depth:
        raise ValueError(
            f"lod_depth must be in [1, {depth}], got {lod_depth}")
    codes_np = np.asarray(codes_np)
    if len(codes_np) <= 1:
        return 1
    drop = _msb_np(codes_np[1:] ^ codes_np[:-1]) + 1  # merge level per detail
    group = -(-drop // 3)
    return 1 + int(np.sum(group >= depth - lod_depth + 1))


def progressive_prefix_bytes(stream: FrameStream, n_coeffs: int) -> int:
    """Entropy bytes a receiver needs for ``decode_progressive(n_coeffs)``.

    Exact for chunked streams (chunk payloads are byte-aligned: the prefix
    is the header plus every chunk overlapping ``[0, n_coeffs)``). For
    sequential streams the RLGR prefix is bit-addressable but the coder
    does not report symbol->byte offsets, so the full channel sizes are
    returned (a sequential stream must be held whole anyway to decode its
    tail later).
    """
    from raht3dgs_tpu.codec.rlgr import _parse_chunk_header

    k = int(min(max(n_coeffs, 1), stream.n_voxels))
    total = 0
    for s in stream.channels:
        if stream.chunk > 0:
            c, lens, off = _parse_chunk_header(s)
            need = -(-k // c)  # chunks overlapping the prefix
            total += off + sum(lens[:need])
        else:
            total += len(s)
    return total
