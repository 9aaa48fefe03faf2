"""Region-Adaptive Hierarchical Transform (RAHT) as dense masked butterflies.

The reference implements RAHT with ragged per-level index lists built by a
"prelude" (``/root/reference/python/RAHT_param.py``) and consumed by per-level
gather/scatter butterflies (``/root/reference/python/RAHT.py:253-336``,
``/root/reference/python/iRAHT.py:40-114``). Ragged lists are hostile to XLA
(dynamic shapes, per-level dispatch), so this module uses a different — but
numerically identical — formulation designed for TPU:

**Dense state.** Keep a length-N state: coefficients ``T (N, D)``, accumulated
node weights ``w (N,)``, and an ``active`` mask. At level ``j`` a node pairs
with its successor in the active set iff their codes agree on bits
``[j, L)`` — exactly the reference's flag condition
(``RAHT_param.py:65-70``). Successor/predecessor of each active position are
computed with O(N) associative scans; the butterfly is then a fixed-shape
gather + masked elementwise update. Merged right-siblings are deactivated.
All 3J levels run inside one ``lax.fori_loop`` — a single compiled XLA
program, no host round-trips, no dynamic shapes.

**Invisible padding.** A slot with weight 0 degenerates the butterfly to the
identity (a=1, b=0), so padded slots are *algebraically invisible*: they
change no real coefficient and no real weight. Padding slots get sentinel
codes above the real code range (``ops/morton.py:pad_code``) so they never
pair with a real node until the real octree has fully merged (by level
``3*depth``), at which point the real DC merges a zero-weight pad root —
another exact no-op. This gives static shapes + shape bucketing with *bitwise
the same* real outputs as an unpadded run.

**Structure replay for decoding.** The forward pass records, per slot, the
level at which it merged into its left sibling (``drop_level``; 0 for the
lone survivor) and its subtree weight at that moment (``subtree_w``). These
O(N) arrays are sufficient to replay the pairing structure top-down for the
inverse transform — and the decoder can recompute them from the (losslessly
transmitted) positions alone via :func:`raht_structure`, mirroring how the
reference decoder re-runs ``RAHT_param``.

Pairs are well defined (no node is simultaneously a left and a right sibling)
because codes are unique and sorted: three consecutive active nodes can never
share the masked prefix at one level — two of them would have to agree on bit
``j-1`` and all higher bits, contradicting sortedness between them. This is
why the transform requires *voxelized* (duplicate-free) input; multiplicity
is carried by the initial weight vector instead (``voxelize.counts``).
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from raht3dgs_tpu.ops.morton import internal_payload_bits


def num_levels(depth: int, n: int) -> int:
    """Total butterfly levels for an ``n``-slot transform at octree depth J.

    Real nodes fully merge within ``3*depth`` levels (reference semantics);
    one extra level range covers the padding subtree and its final no-op merge
    with the real root.
    """
    return internal_payload_bits(depth, n) + 1


class RahtStructure(NamedTuple):
    drop_level: jnp.ndarray   # (N,) int32 — level the slot merged right-into-left; 0 = survivor
    subtree_w: jnp.ndarray    # (N,) float — accumulated weight when merged (survivor: final)
    node_weights: jnp.ndarray # (N,) float — final accumulated node weights (the
                              # reference's w output incl. its w[i1]=w[i0] rule);
                              # used by the MATLAB-style weight-descending order


class RahtForwardResult(NamedTuple):
    coeffs: jnp.ndarray      # (N, D) transform coefficients, in sorted-code order
    weights: jnp.ndarray     # (N,) final accumulated node weights (reference w output)
    structure: RahtStructure


def _succ_active(active: jnp.ndarray) -> jnp.ndarray:
    """For each position, the next strictly-greater active index (N if none)."""
    N = active.shape[0]
    idx = jnp.where(active, jnp.arange(N, dtype=jnp.int32), jnp.int32(N))
    incl = lax.cummin(idx, reverse=True)
    return jnp.concatenate([incl[1:], jnp.full((1,), N, dtype=jnp.int32)])


def _pred_active(active: jnp.ndarray) -> jnp.ndarray:
    """For each position, the previous strictly-smaller active index (-1 if none)."""
    N = active.shape[0]
    idx = jnp.where(active, jnp.arange(N, dtype=jnp.int32), jnp.int32(-1))
    incl = lax.cummax(idx)
    return jnp.concatenate([jnp.full((1,), -1, dtype=jnp.int32), incl[:-1]])


# ---------------------------------------------------------------------------
# Wide-gather packing.
#
# TPU gathers move (sublane, 128-lane) tiles: gathering a 1-lane array wastes
# 127/128 of the bandwidth (measured ~50x slower than an 8-lane row gather on
# v5e). All per-level neighbor reads are therefore fused into ONE gather of a
# packed (N, D + extra) float matrix; integer fields (Morton codes, drop
# levels) ride along as bitcast float lanes (no arithmetic ever touches the
# bitcast lanes — only gather/select — so the bit patterns are preserved).
# ---------------------------------------------------------------------------


# Codes ride the wide gather as VALUE-exact float lanes (22-bit digits:
# float32 represents integers < 2^24 exactly; 3 x 22 = 66 bits covers the
# depth-21 uint64 code space incl. the padding sentinel bit). Bitcasting
# would be cheaper but XLA:TPU fusions canonicalize NaN/denormal bit
# patterns inside concat+gather, corrupting bitcast payloads (observed on
# v5e).
_DIGIT_BITS = 22
_DIGIT_MASK = (1 << _DIGIT_BITS) - 1


def _code_lanes(codes: jnp.ndarray, fdtype) -> jnp.ndarray:
    """Split integer codes into (N, 3) exact float digits (low to high)."""
    # uint64 (depth 21) must not round-trip through int64: bit 63 is live
    c = codes if codes.dtype == jnp.uint64 else codes.astype(jnp.int64)
    return jnp.stack(
        [
            (c & _DIGIT_MASK).astype(fdtype),
            ((c >> _DIGIT_BITS) & _DIGIT_MASK).astype(fdtype),
            ((c >> (2 * _DIGIT_BITS)) & _DIGIT_MASK).astype(fdtype),
        ],
        axis=1,
    )


def _lanes_code(lanes: jnp.ndarray, code_dtype, fdtype) -> jnp.ndarray:
    """Inverse of :func:`_code_lanes`."""
    idt = jnp.uint64 if code_dtype == jnp.uint64 else jnp.int64
    lo = lanes[:, 0].astype(idt)
    mid = lanes[:, 1].astype(idt)
    hi = lanes[:, 2].astype(idt)
    c = lo | (mid << _DIGIT_BITS) | (hi << (2 * _DIGIT_BITS))
    return c.astype(code_dtype)


def _neighbor_pack(active, codes, fields, fdtype):
    """succ/pred indices plus the packed neighbor payloads at both.

    ``fields``: list of (N,) or (N, D) float arrays to fetch at the
    neighbors. Returns (succ, pred, fetch) where fetch(g) -> list of the
    fields followed by the neighbor code, for g in (gathered_succ,
    gathered_pred)."""
    N = active.shape[0]
    succ = _succ_active(active)
    pred = _pred_active(active)
    succ_c = jnp.minimum(succ, N - 1)
    pred_c = jnp.maximum(pred, 0)
    cols = [f[:, None] if f.ndim == 1 else f for f in fields]
    widths = [c.shape[1] for c in cols]
    pack = jnp.concatenate(cols + [_code_lanes(codes, fdtype)], axis=1)
    g_succ = pack[succ_c]
    g_pred = pack[pred_c]

    def unpack(g):
        out = []
        off = 0
        for f, wdt in zip(fields, widths):
            col = g[:, off : off + wdt]
            out.append(col[:, 0] if f.ndim == 1 else col)
            off += wdt
        out.append(_lanes_code(g[:, off:], codes.dtype, fdtype))
        return out

    return succ, pred, unpack(g_succ), unpack(g_pred)


def _level_mask(code_dtype, j, levels: int):
    """``2^levels - 2^j`` in the codes' dtype.

    Codes may be int32 when ``levels <= 31`` (int64 is emulated on TPU —
    halving code-side arithmetic matters; the 3DGS J=10 path fits). The
    subtraction is computed in int64 and narrowed: values are < 2^31 for
    the int32 case, so the cast is exact.
    """
    if code_dtype == jnp.uint64:
        # levels == 64: 2^64 wraps to 0 in uint64, so 0 - 2^j IS the mask
        # with bits j..63 set. The final level j == 64 must be an explicit
        # 0 ("merge everything"): shift counts >= the bit width are
        # implementation-defined in XLA (x86 masks them mod 64).
        ju = jnp.minimum(j, 63).astype(jnp.uint64)
        m = jnp.uint64(0) - (jnp.uint64(1) << ju)
        return jnp.where(j >= 64, jnp.uint64(0), m)
    m = (jnp.int64(1) << jnp.int64(levels)) - (jnp.int64(1) << j.astype(jnp.int64))
    return m.astype(code_dtype)


def max_int32_levels() -> int:
    """Largest level count representable with int32 codes (incl. pad bit)."""
    return 31


def _butterfly_ab(w0, w1):
    """Orthonormal butterfly coefficients; identity for zero-weight pairs."""
    denom = w0 + w1
    safe = denom > 0
    d = jnp.where(safe, denom, 1)
    a = jnp.where(safe, jnp.sqrt(w0 / d), 1.0)
    b = jnp.where(safe, jnp.sqrt(w1 / d), 0.0)
    return a, b


@partial(jax.jit, static_argnames=("depth",))
def raht_forward(
    codes: jnp.ndarray,
    attributes: jnp.ndarray,
    weights: jnp.ndarray,
    depth: int,
) -> RahtForwardResult:
    """Forward RAHT over Morton-sorted unique ``codes``.

    Args:
        codes: ``(N,)`` int64, strictly increasing; padding slots must carry
            sentinel codes (``pad_code``) and ``weights == 0``.
        attributes: ``(N, D)`` float attributes. Pad rows must be FINITE
            (zeros recommended — ``prepare_voxel_frame`` zero-fills): the
            identity butterfly still multiplies them by 0, and 0 * NaN
            poisons the real coefficients.
        weights: ``(N,)`` float initial weights (voxel point counts; 1 for
            unit-weight voxels, 0 for padding).
        depth: octree depth J (static).

    Returns:
        Coefficients in place (slot k holds the coefficient the reference's
        ``RAHT2_optimized`` leaves at position k), final node weights (with
        the reference's ``w[i1] = w[i0]`` behavior), and the replayable
        structure. Equivalent to ``RAHT.py:253-336`` on voxelized input.
    """
    N, D = attributes.shape
    levels = num_levels(depth, N)
    fdtype = attributes.dtype
    w0_init = weights.astype(fdtype)

    def body(j, state):
        T, w, active, drop, ws = state
        mask = _level_mask(codes.dtype, j, levels)
        succ, pred, (sT, sw, scode), (pT, pw, pcode) = _neighbor_pack(
            active, codes, [T, w], fdtype
        )
        left = active & (succ < N) & (((codes ^ scode) & mask) == 0)
        right = (
            active & (pred >= 0) & (((codes ^ pcode) & mask) == 0) & ~left
        )
        touched = left | right
        Tp = jnp.where(left[:, None], sT, pT)
        wp = jnp.where(left, sw, pw)
        w0 = jnp.where(left, w, wp)
        w1 = jnp.where(left, wp, w)
        a, b = _butterfly_ab(w0, w1)
        x0 = jnp.where(left[:, None], T, Tp)
        x1 = jnp.where(left[:, None], Tp, T)
        lo = (a[:, None] * x0 + b[:, None] * x1)
        hi = (-b[:, None] * x0 + a[:, None] * x1)
        T = jnp.where(
            touched[:, None], jnp.where(left[:, None], lo, hi), T
        )
        ws = jnp.where(right, w, ws)
        w = jnp.where(touched, w0 + w1, w)
        drop = jnp.where(right, j.astype(jnp.int32), drop)
        active = active & ~right
        return T, w, active, drop, ws

    init = (
        attributes,
        w0_init,
        jnp.ones((N,), dtype=bool),
        jnp.zeros((N,), dtype=jnp.int32),
        jnp.zeros((N,), dtype=fdtype),
    )
    T, w, active, drop, ws = lax.fori_loop(1, levels + 1, body, init)
    ws = jnp.where(active, w, ws)  # survivors: final weight
    return RahtForwardResult(
        coeffs=T,
        weights=w,
        structure=RahtStructure(drop_level=drop, subtree_w=ws, node_weights=w),
    )


@partial(jax.jit, static_argnames=("depth",))
def raht_structure(
    codes: jnp.ndarray, weights: jnp.ndarray, depth: int
) -> RahtStructure:
    """Structure-only forward pass (no attributes) — the decoder's prelude.

    Recomputes ``drop_level``/``subtree_w`` from positions alone, mirroring
    how the reference decoder re-runs ``RAHT_param`` before ``inverse_RAHT``
    (``/root/reference/python/encode_ply.py:115,208``).
    """
    N = codes.shape[0]
    levels = num_levels(depth, N)
    fdtype = weights.dtype

    def body(j, state):
        w, active, drop, ws = state
        mask = _level_mask(codes.dtype, j, levels)
        succ, pred, (sw, scode), (pw, pcode) = _neighbor_pack(
            active, codes, [w], fdtype
        )
        left = active & (succ < N) & (((codes ^ scode) & mask) == 0)
        right = (
            active & (pred >= 0) & (((codes ^ pcode) & mask) == 0) & ~left
        )
        touched = left | right
        wp = jnp.where(left, sw, pw)
        ws = jnp.where(right, w, ws)
        w = jnp.where(touched, w + wp, w)
        drop = jnp.where(right, j.astype(jnp.int32), drop)
        active = active & ~right
        return w, active, drop, ws

    init = (
        weights.astype(fdtype),
        jnp.ones((N,), dtype=bool),
        jnp.zeros((N,), dtype=jnp.int32),
        jnp.zeros((N,), dtype=fdtype),
    )
    w, active, drop, ws = lax.fori_loop(1, levels + 1, body, init)
    ws = jnp.where(active, w, ws)
    return RahtStructure(drop_level=drop, subtree_w=ws, node_weights=w)


@partial(jax.jit, static_argnames=("depth",))
def raht_inverse(
    coeffs: jnp.ndarray,
    structure: RahtStructure,
    depth: int,
) -> jnp.ndarray:
    """Inverse RAHT: replay the pairing structure top-down.

    At level ``j`` (descending), the active-set *before* the forward merge is
    ``{drop == 0} ∪ {drop >= j}``; right siblings are ``drop == j`` and their
    left partner is their predecessor in that set. Pair weights are recovered
    from ``subtree_w``: the right's weight is its recorded subtree weight, the
    left's is its current (post-merge) weight minus it. Numerically identical
    to ``iRAHT.py:40-114``.
    """
    N, D = coeffs.shape
    levels = num_levels(depth, N)
    fdtype = coeffs.dtype
    drop = structure.drop_level
    # drop levels are < 64, exactly representable as floats: ride the wide
    # gather value-wise (no bitcast needed)
    drop_f = drop.astype(fdtype)
    ws = structure.subtree_w.astype(fdtype)

    def body(k, state):
        C, wcur = state
        j = levels - k
        j_f = j.astype(fdtype)
        active_pre = (drop == 0) | (drop >= j)
        right = drop == j
        succ = _succ_active(active_pre)
        pred = _pred_active(active_pre)
        succ_c = jnp.minimum(succ, N - 1)
        pred_c = jnp.maximum(pred, 0)
        pack = jnp.concatenate(
            [C, wcur[:, None], ws[:, None], drop_f[:, None]], axis=1
        )
        g_s = pack[succ_c]
        g_p = pack[pred_c]
        left = active_pre & (succ < N) & (g_s[:, D + 2] == j_f)
        touched = left | right
        Cp = jnp.where(left[:, None], g_s[:, :D], g_p[:, :D])
        wcur_p = jnp.where(left, g_s[:, D], g_p[:, D])
        ws_p = jnp.where(left, g_s[:, D + 1], g_p[:, D + 1])
        w1 = jnp.where(left, ws_p, ws)
        denom = jnp.where(left, wcur, wcur_p)
        w0 = denom - w1
        a, b = _butterfly_ab(w0, w1)
        t0 = jnp.where(left[:, None], C, Cp)
        t1 = jnp.where(left[:, None], Cp, C)
        lo = a[:, None] * t0 - b[:, None] * t1
        hi = b[:, None] * t0 + a[:, None] * t1
        C = jnp.where(
            touched[:, None], jnp.where(left[:, None], lo, hi), C
        )
        wcur = jnp.where(left, w0, jnp.where(right, w1, wcur))
        return C, wcur

    init = (coeffs, ws)
    C, _ = lax.fori_loop(0, levels, body, init)
    return C


def get_forward_impl(name: str = "dense"):
    """Select a forward-transform implementation: "span" (closed form, no
    level loop — the TPU fast path, ops/raht_span.py), "dense" (masked
    levels, this module — bitwise golden for 1e-12 crosschecks), "compact"
    (prefix compaction) or "scan" (value-carrying scans). All produce the
    same pairing/structure; switch via env RAHT3DGS_RAHT_IMPL."""
    if name == "dense":
        return raht_forward
    if name == "compact":
        from raht3dgs_tpu.ops.raht_compact import raht_forward_compact

        return raht_forward_compact
    if name == "scan":
        from raht3dgs_tpu.ops.raht_scan import raht_forward_scan

        return raht_forward_scan
    if name == "span":
        from raht3dgs_tpu.ops.raht_span import raht_forward_span

        return raht_forward_span
    raise ValueError(f"unknown RAHT impl {name!r}")
