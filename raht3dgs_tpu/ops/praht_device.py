"""Device (XLA) encoder for inter-depth predicted RAHT.

The host closed loop (``ops/praht.py``) is the FROZEN decode spec: any
stream, from any encoder, must reconstruct by replaying that exact numpy
code. This module is a *throughput encoder* for the same stream format —
the whole per-step closed loop (predict -> butterflies -> quantize ->
reconstruct, coarse to fine) runs as ONE jitted program on the padded
sorted-code layout the rest of the codec uses, so a 56-channel 3DGS
predicted encode that takes ~18 s/step in host numpy at 500k voxels runs
at device speed (the loop is ~30 elementwise/gather passes per octree
depth — bandwidth-bound, no host crossings until the final symbol fetch).

Why an encoder-side implementation cannot break the format: every
decoder-visible decision is SIGNALLED (the per-depth predict mask, the
symbols themselves); the decoder never re-derives encoder state. A device
encoder whose float ops differ from host numpy by an ulp emits symbols
that differ (rarely, at quantization-boundary ties) from the host
encoder's — but the stream still decodes exactly, by construction, and
the encoder-side reconstruction drift is bounded by ulps of the
prediction, orders below the quantization noise. Compositions are safe
for the same reason: the temporal codec feeds its closed loop from
``codec.decode`` (the frozen host loop), not from encoder state
(``models/temporal.py``).

In practice the program is written to mirror the host loop's float ops
in the same order (unrolled stencil accumulation, identical butterfly
expressions, exact integer codelength proxy), so on CPU/XLA with f64 the
symbols come out bitwise equal to the host encoder on every tested
workload — the parity tests pin tolerance-based contracts plus observed
equality, not a cross-platform bitwise guarantee.

Key correspondences with the host loop (``ops/praht.py``):

- True coefficients: praht transforms per-depth cell MEANS scaled by
  ``sqrt(cell weight)``; by the RAHT invariant (every merged node value
  equals ``sqrt(W) * weighted mean``) this equals the standard forward
  transform run on ``attributes * sqrt(leaf weights)`` — for the common
  unit-weight voxelized case the scaling is the identity and the true
  coefficients ARE the plain transform's. The caller passes them in
  (``models/pipeline.py`` reuses its existing device forward).
- Per-depth butterflies: octree depth ``d`` owns butterfly levels
  ``3*(depth-d)+1 .. +3`` of the global dense level loop
  (``ops/raht.py``); the active set before level ``j`` is
  ``drop == 0 | drop >= j`` — derived from the one global structure pass
  the transform already computed.
- Prediction stencil: the G-PCC-style 4/2/1 parent/face/edge upsampling
  (``ops/praht.py:predict_means``), precomputed per frame as gather
  slots + weights. Neighbor lookup is a leaf-code prefix search: the
  first leaf >= ``ncode << 3*(depth-d+1)`` is the neighbor parent's
  first-leaf slot iff its prefix matches; padding sentinels
  (``ops/morton.py:pad_code``) shift to values strictly above every real
  parent code, so they can never alias a hit.

Depth <= 20 (int32/int64 code tiers). The uint64 J=21 tier stays on the
host encoder (the stencil's masked neighbor arithmetic would need the
sign-bit-safe uint64 path; the reference's own Python drivers stop at
J=18/J=10 — ``/root/reference/python/encode_ply.py:27``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from raht3dgs_tpu.ops.raht import (
    _butterfly_ab,
    _level_mask,
    _neighbor_pack,
    _succ_active,
    num_levels,
)

__all__ = ["PrahtDevicePlan", "praht_device_plan", "praht_device_encode",
           "praht_device_decode"]

# stencil lanes, in the host loop's FROZEN accumulation order: parent,
# face x/y/z, edge xy/xz/yz (ops/praht.py:predict_means)
_LANES = 7
_LANE_WT = (4.0, 2.0, 2.0, 2.0, 1.0, 1.0, 1.0)


class PrahtDevicePlan(NamedTuple):
    """Step-independent device state for one frame's predicted loop.

    Mirrors the host :class:`ops.praht.PrahtPlan` split: everything here
    depends only on geometry (codes + weights), so encode sweeps and rate
    searches reuse one plan. All arrays live on device.
    """

    drop: jnp.ndarray       # (N,) int32 global merge levels (transform structure)
    subtree_w: jnp.ndarray  # (N,) merge-time subtree weights (structure)
    w_stack: jnp.ndarray    # (depth+1, N) cell weights per octree depth d
    st_idx: jnp.ndarray     # (depth, N, 7) int32 stencil gather slots
    st_wt: jnp.ndarray      # (depth, N, 7) stencil weights (0 = invalid lane)


def _axis_masks_full(depth: int, dtype):
    """Per-axis Morton bit masks over the FULL depth (host uses exact
    per-level masks + validity bits; here overflow carries land above the
    ``3*(d-1)``-bit parent grid, where the prefix-hit test rejects them —
    equivalent gating, one constant mask)."""
    mz = 0
    for i in range(depth):
        mz |= 1 << (3 * i)
    return (jnp.asarray(mz << 2, dtype), jnp.asarray(mz << 1, dtype),
            jnp.asarray(mz, dtype))


def _step_axis_dev(codes, mask, low, direction):
    """Masked-arithmetic one-cell Morton step (``ops/praht.py:_step_axis``
    semantics; validity via the caller's prefix-hit test, see
    :func:`_axis_masks_full`)."""
    m = codes & mask
    pos = direction > 0
    inc = (((codes | ~mask) + low) & mask) | (codes & ~mask)
    dec = ((m - low) & mask) | (codes & ~mask)
    # negative steps at the axis origin wrap to high mask bits (above the
    # parent grid -> no prefix hit); positive steps at the axis edge carry
    # above the grid likewise. Only m == 0 decrements need the explicit
    # gate (the wrap stays INSIDE low bits for low = 1 at axis z).
    valid = jnp.where(pos, jnp.full_like(m, True, dtype=bool), m != 0)
    return jnp.where(pos, inc, dec), valid


@partial(jax.jit, static_argnames=("depth",))
def praht_device_plan(codes, weights, depth: int, drop, subtree_w
                      ) -> PrahtDevicePlan:
    """Build the step-independent device plan from the frame's padded
    sorted codes/weights and the transform's global structure."""
    if codes.dtype == jnp.uint64:
        raise ValueError(
            "device predicted RAHT covers the int32/int64 code tiers "
            "(depth <= 20); use the host encoder for J=21"
        )
    N = codes.shape[0]
    fdtype = weights.dtype
    w0 = weights.astype(fdtype)

    # ---- w_stack: cell weights at every octree depth, bottom-up. Exactly
    # the forward merge additions (left += right at its drop level), so
    # the values are bitwise the host pyramid's reduceat sums for integer
    # multiplicities and ulp-equal otherwise.
    def wbody(t, carry):
        w, stack = carry
        stack = lax.dynamic_update_index_in_dim(stack, w, depth - t, axis=0)
        for jj in range(1, 4):
            j = 3 * t + jj
            act = (drop == 0) | (drop >= j)
            succ = _succ_active(act)
            succ_c = jnp.minimum(succ, N - 1)
            is_left = act & (succ < N) & (drop[succ_c] == j)
            w = jnp.where(is_left, w + w[succ_c], w)
        return w, stack

    stack0 = jnp.zeros((depth + 1, N), dtype=fdtype)
    w_root, w_stack = lax.fori_loop(0, depth, wbody, (w0, stack0))
    w_stack = lax.dynamic_update_index_in_dim(w_stack, w_root, 0, axis=0)

    # ---- prediction stencil per depth d = 1..depth
    cdt = codes.dtype
    masks = _axis_masks_full(depth, cdt)
    lows = (jnp.asarray(4, cdt), jnp.asarray(2, cdt), jnp.asarray(1, cdt))
    real = weights > 0

    def sbody(d, carry):
        st_idx, st_wt = carry
        shift = 3 * (depth - d)
        cc = codes >> shift.astype(cdt)
        pc = cc >> jnp.asarray(3, cdt)
        o = (cc & jnp.asarray(7, cdt)).astype(jnp.int32)
        dirs = (o[:, None] >> jnp.asarray([2, 1, 0], jnp.int32)) & 1
        face, fvalid = [], []
        for ax in range(3):
            s, v = _step_axis_dev(pc, masks[ax], lows[ax], dirs[:, ax])
            face.append(s)
            fvalid.append(v)
        cands = [(pc, jnp.ones((N,), bool))]
        cands += [(face[ax], fvalid[ax]) for ax in range(3)]
        for a, b in ((0, 1), (0, 2), (1, 2)):
            s, v = _step_axis_dev(face[a], masks[b], lows[b], dirs[:, b])
            cands.append((s, v & fvalid[a]))
        leaf_shift = (shift + 3).astype(cdt)
        targets = jnp.stack([c << leaf_shift for c, _ in cands], axis=1)
        k = jnp.searchsorted(codes, targets).astype(jnp.int32)
        k = jnp.minimum(k, N - 1)
        ncode = jnp.stack([c for c, _ in cands], axis=1)
        valid = jnp.stack([v for _, v in cands], axis=1)
        hit = valid & ((codes[k] >> leaf_shift) == ncode) & real[k]
        wt = jnp.asarray(_LANE_WT, fdtype)[None, :] * hit.astype(fdtype)
        st_idx = lax.dynamic_update_index_in_dim(st_idx, k, d - 1, axis=0)
        st_wt = lax.dynamic_update_index_in_dim(st_wt, wt, d - 1, axis=0)
        return st_idx, st_wt

    st_idx0 = jnp.zeros((depth, N, _LANES), dtype=jnp.int32)
    st_wt0 = jnp.zeros((depth, N, _LANES), dtype=fdtype)
    st_idx, st_wt = lax.fori_loop(1, depth + 1, sbody, (st_idx0, st_wt0))
    return PrahtDevicePlan(
        drop=drop, subtree_w=subtree_w.astype(fdtype), w_stack=w_stack,
        st_idx=st_idx, st_wt=st_wt,
    )


def _quant_dev(x, st, quant_mode, f):
    if quant_mode == "deadzone":
        return (jnp.sign(x) * jnp.floor(jnp.abs(x) / st + f)).astype(
            jnp.int32)
    return jnp.floor(x / st + 0.5).astype(jnp.int32)


def _dequant_dev(q, st, quant_mode, delta, fdtype):
    qf = q.astype(fdtype)
    if quant_mode == "deadzone":
        return jnp.sign(qf) * (jnp.abs(qf) + delta) * st
    return qf * st


def _codelen_bits(q):
    """Exact per-symbol Exp-Golomb proxy bits: ``2*floor(log2(|q|+1))+1``
    (``ops/praht.py:_codelen_proxy``). The f32 frexp exponent can be one
    too high when ``|q|+1`` rounds up across a power of two (inputs
    >= 2^24); the integer compare corrects it, so the proxy is exact for
    every int32 symbol."""
    t = jnp.abs(q) + 1
    e = jnp.frexp(t.astype(jnp.float32))[1].astype(jnp.int32)
    tu = t.astype(jnp.uint32)
    over = tu < (jnp.uint32(1) << (e - 1).astype(jnp.uint32))
    e = e - over.astype(jnp.int32)
    return (2 * (e - 1) + 1).astype(jnp.int64)


def _predict_lanes(plan, d, m, fdtype):
    """Upsampled prediction from the precomputed stencil, accumulated in
    the host loop's frozen lane order."""
    idx = lax.dynamic_index_in_dim(plan.st_idx, d - 1, 0, keepdims=False)
    wt = lax.dynamic_index_in_dim(plan.st_wt, d - 1, 0, keepdims=False)
    num = wt[:, 0:1] * m[idx[:, 0]]
    den = wt[:, 0]
    for l in range(1, _LANES):
        num = num + wt[:, l:l + 1] * m[idx[:, l]]
        den = den + wt[:, l]
    return num / jnp.where(den > 0, den, 1)[:, None]


def _forward_depth(codes, drop, levels, T, w, shift, N, fdtype):
    """One octree depth's 3 forward sub-levels (the host _forward3 with
    constants from the chained weights). Returns (T_out, sub) where sub
    holds each sub-level's pairing for the inverse replay."""
    sub = []
    for jj in range(1, 4):
        j = shift + jj
        act = (drop == 0) | (drop >= j)
        mask = _level_mask(codes.dtype, jnp.asarray(j), levels)
        succ, pr, (sT, sw, scode), (pT, pw, pcode) = _neighbor_pack(
            act, codes, [T, w], fdtype)
        left = act & (succ < N) & (((codes ^ scode) & mask) == 0)
        right = act & (pr >= 0) & (((codes ^ pcode) & mask) == 0) & ~left
        touched = left | right
        wp = jnp.where(left, sw, pw)
        w0_ = jnp.where(left, w, wp)
        w1_ = jnp.where(left, wp, w)
        a, b = _butterfly_ab(w0_, w1_)
        Tp = jnp.where(left[:, None], sT, pT)
        x0 = jnp.where(left[:, None], T, Tp)
        x1 = jnp.where(left[:, None], Tp, T)
        lo = a[:, None] * x0 + b[:, None] * x1
        hi = -b[:, None] * x0 + a[:, None] * x1
        T = jnp.where(touched[:, None],
                      jnp.where(left[:, None], lo, hi), T)
        w = jnp.where(touched, w0_ + w1_, w)
        sub.append((left, right,
                    jnp.minimum(succ, N - 1),
                    jnp.maximum(pr, 0), a, b))
    return T, sub


def _inverse_depth(C, sub):
    """Replay one depth's inverse butterflies with the forward's own
    constants (bitwise the host _inverse3 pair math)."""
    for left, right, succ_c, pred_c, a, b in reversed(sub):
        Cp = jnp.where(left[:, None], C[succ_c], C[pred_c])
        t0 = jnp.where(left[:, None], C, Cp)
        t1 = jnp.where(left[:, None], Cp, C)
        lo = a[:, None] * t0 - b[:, None] * t1
        hi = b[:, None] * t0 + a[:, None] * t1
        C = jnp.where(left[:, None], lo,
                      jnp.where(right[:, None], hi, C))
    return C


@partial(jax.jit, static_argnames=("depth", "quant_mode", "adaptive"))
def praht_device_encode(
    plan: PrahtDevicePlan,
    codes,
    weights,
    tt,
    depth: int,
    steps,
    *,
    quant_mode: str = "mid",
    qf=0.3,
    rec_delta=0.12,
    adaptive: bool = True,
):
    """Closed-loop predicted-RAHT encode, one step, all on device.

    ``tt`` is the (N, D) true-coefficient matrix in padded slot layout —
    the standard forward transform of ``attributes * sqrt(weights)``
    (see module docstring). ``steps`` is (1,) or (D,). Returns
    ``(sym (N, D) int32 slot layout, predict_mask uint32, rec (N, D))``;
    gather ``sym`` with the frame's pads-last RA-GFT order to obtain the
    stream symbol matrix (identical layout to the host encoder's).
    """
    N, D = tt.shape
    fdtype = tt.dtype
    levels = num_levels(depth, N)
    drop = plan.drop
    ws = plan.subtree_w
    st = steps.astype(fdtype)
    st = st[None, :] if st.shape[0] > 1 else st
    f = jnp.asarray(qf, fdtype)
    dl = jnp.asarray(rec_delta, fdtype)
    real = weights > 0

    # DC: the root survivor's coefficient sits at slot 0
    q0 = _quant_dev(tt[0][None, :], st, quant_mode, f)
    sqrt_w0 = jnp.sqrt(plan.w_stack[0, 0])
    m = jnp.zeros((N, D), fdtype).at[0].set(
        (_dequant_dev(q0, st, quant_mode, dl, fdtype) / sqrt_w0)[0]
    )
    sym = jnp.zeros((N, D), jnp.int32).at[0].set(q0[0])

    def body(d, carry):
        m, sym, maskbits = carry
        shift = 3 * (depth - d)
        alive_d = real & ((drop == 0) | (drop > shift))
        alive_p = real & ((drop == 0) | (drop > shift + 3))
        ac = real & (drop > shift) & (drop <= shift + 3)
        sq_d = jnp.sqrt(lax.dynamic_index_in_dim(
            plan.w_stack, d, 0, keepdims=False))
        sq_p = jnp.sqrt(lax.dynamic_index_in_dim(
            plan.w_stack, d - 1, 0, keepdims=False))

        # ---- prediction (host accumulation order, lane-unrolled), then
        # the depth's forward butterflies of pred * sq
        pred = _predict_lanes(plan, d, m, fdtype)
        w = lax.dynamic_index_in_dim(plan.w_stack, d, 0, keepdims=False)
        T_pred, sub = _forward_depth(
            codes, drop, levels, pred * sq_d[:, None], w, shift, N, fdtype)

        # ---- quantize: residual vs plain, signalled per-depth decision by
        # the exact codelength proxy (encoder-only; strict <, host ties)
        q_pred = _quant_dev(tt - T_pred, st, quant_mode, f)
        q_plain = _quant_dev(tt, st, quant_mode, f)
        if adaptive:
            acD = ac[:, None]
            proxy_p = jnp.sum(jnp.where(acD, _codelen_bits(q_pred), 0))
            proxy_0 = jnp.sum(jnp.where(acD, _codelen_bits(q_plain), 0))
            use_pred = proxy_p < proxy_0
        else:
            use_pred = jnp.asarray(True)
        q = jnp.where(use_pred, q_pred, q_plain)
        sym = jnp.where(ac[:, None], q, sym)
        maskbits = maskbits | (
            use_pred.astype(jnp.uint32) << (d - 1).astype(jnp.uint32))

        # ---- reconstruct
        deq = _dequant_dev(q, st, quant_mode, dl, fdtype)
        C = jnp.where(ac[:, None],
                      jnp.where(use_pred, T_pred + deq, deq),
                      jnp.zeros((), fdtype))
        C = jnp.where(alive_p[:, None], sq_p[:, None] * m, C)
        C = _inverse_depth(C, sub)
        m_next = C / jnp.where(sq_d > 0, sq_d, 1)[:, None]
        m = jnp.where(alive_d[:, None], m_next, jnp.zeros((), fdtype))
        return m, sym, maskbits

    m, sym, maskbits = lax.fori_loop(
        1, depth + 1, body, (m, sym, jnp.uint32(0)))
    rec = jnp.where(real[:, None], m, jnp.zeros((), fdtype))
    return sym, maskbits, rec


@partial(jax.jit, static_argnames=("depth", "quant_mode", "fdtype"))
def praht_device_decode(
    plan: PrahtDevicePlan,
    codes,
    weights,
    sym,
    predict_mask,
    depth: int,
    steps,
    *,
    quant_mode: str = "mid",
    rec_delta=0.12,
    fdtype=jnp.float32,
):
    """NON-NORMATIVE device decode of a predicted-RAHT symbol matrix.

    The frozen host loop (``ops/praht.py:praht_decode``) is the decode
    spec; this program reconstructs the same stream to within float ulps
    (identical op structure, device float contraction may differ in the
    last bit). Use it ONLY where ulp-level drift is harmless and the
    reconstruction stays out of closed loops — the serving path
    (``models/serving.py``), where attributes feed a renderer and never
    leave the chip. Everything normative (codec.decode, temporal chains,
    byte-parity tooling) must keep using the host loop.

    ``sym`` is the (N, D) int32 symbol matrix in padded SLOT layout
    (stream matrix routed through the inverse pads-last RA-GFT
    permutation, exactly like the plain path's ``_dequant_gather_device``
    input); ``predict_mask`` the stream's signalled per-depth bits.
    Returns the (N, D) reconstruction (pad rows zero).
    """
    N, D = sym.shape
    levels = num_levels(depth, N)
    drop = plan.drop
    st = steps.astype(fdtype)
    st = st[None, :] if st.shape[0] > 1 else st
    dl = jnp.asarray(rec_delta, fdtype)
    real = weights > 0
    mask32 = jnp.asarray(predict_mask, jnp.uint32)

    sqrt_w0 = jnp.sqrt(plan.w_stack[0, 0])
    m = jnp.zeros((N, D), fdtype).at[0].set(
        (_dequant_dev(sym[0][None, :], st, quant_mode, dl, fdtype)
         / sqrt_w0)[0]
    )

    def body(d, m):
        shift = 3 * (depth - d)
        alive_d = real & ((drop == 0) | (drop > shift))
        alive_p = real & ((drop == 0) | (drop > shift + 3))
        ac = real & (drop > shift) & (drop <= shift + 3)
        sq_d = jnp.sqrt(lax.dynamic_index_in_dim(
            plan.w_stack, d, 0, keepdims=False))
        sq_p = jnp.sqrt(lax.dynamic_index_in_dim(
            plan.w_stack, d - 1, 0, keepdims=False))
        use_pred = ((mask32 >> (d - 1).astype(jnp.uint32)) & 1) > 0

        pred = _predict_lanes(plan, d, m, fdtype)
        w = lax.dynamic_index_in_dim(plan.w_stack, d, 0, keepdims=False)
        T_pred, sub = _forward_depth(
            codes, drop, levels, pred * sq_d[:, None], w, shift, N, fdtype)

        deq = _dequant_dev(sym, st, quant_mode, dl, fdtype)
        C = jnp.where(ac[:, None],
                      jnp.where(use_pred, T_pred + deq, deq),
                      jnp.zeros((), fdtype))
        C = jnp.where(alive_p[:, None], sq_p[:, None] * m, C)
        C = _inverse_depth(C, sub)
        m_next = C / jnp.where(sq_d > 0, sq_d, 1)[:, None]
        return jnp.where(alive_d[:, None], m_next, jnp.zeros((), fdtype))

    m = lax.fori_loop(1, depth + 1, body, m)
    return jnp.where(real[:, None], m, jnp.zeros((), fdtype))
