"""Closed-form ("span") RAHT — no per-level loop at all.

The per-level formulations (ops/raht.py and variants) advance a dense state
through ~3J butterfly levels; on TPU each level costs several kernel
launches and a gather, and the loop dominates runtime. But for *sorted
unique* codes the entire merge tree is determined in closed form:

- Let ``B[i] = msb(code[i-1] ^ code[i])``. Adjacent actives pair at level
  ``B+1``, and (no-triple invariant, see ops/raht.py) node ``i`` merges
  right-into-left at exactly ``drop[i] = B[i] + 1``.
- Node ``i``'s subtree at its drop is the contiguous span ``[i, next_ge[i])``
  where ``next_ge`` is the next position with B >= B[i]; its left partner is
  ``prev_ge[i]`` (previous position with B >= B[i]), whose side spans
  ``[prev_ge[i], i)``.
- A subtree's accumulated value is ``sum(sqrt(w_k) c_k) / sqrt(sum w_k)``
  over its leaves (invariant of the butterfly), so every pair's inputs are
  prefix-sum differences:

      x1 = (S[r) - S[i)) / sqrt(w1),   x0 = (S[i) - S[p)) / sqrt(w0)
      T[i] = -b x0 + a x1,             T[0] = S[N) / sqrt(W)  (the DC)

  — the whole forward transform is ``msb`` + two batched nearest->= scans +
  prefix sums + elementwise math. No level loop, no data-dependent state.

- The inverse is an affine recursion along parent pointers: the parent
  value of pair ``i`` is ``x1[prev_ge[i]]`` when this is the partner's last
  merge, else ``x0[next_ge[i]]`` — i.e. ``Y[i] = g[i] * Y[par[i]] + d[i]``,
  solved for every node simultaneously with ~log2(3J) pointer-doubling
  steps. Leaves read off as ``x0[k+1]`` or ``x1[k]``.

Numerics: naive float32 prefix sums would suffer catastrophic cancellation
in the differences, so span sums run in compensated double-single float32
by default (~48 mantissa bits at native f32 speed — f64 is emulated on
TPU; ``RAHT3DGS_SPAN_SUMS=f64`` selects true float64 instead). Outputs
match the level-loop implementations to ~1e-9 (f64 I/O); they are not
bitwise identical (different summation order), so the "dense" impl remains
the golden path for 1e-12 crosschecks.

Padding behaves exactly as in ops/raht.py: zero-weight slots produce a=1,
b=0 no-ops (guarded divisions) and sentinel codes keep them out of the real
octree.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from raht3dgs_tpu.ops.raht import (
    RahtForwardResult,
    RahtStructure,
    num_levels,
)


def _msb(x: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Position of the most significant set bit (x > 0), exact.

    Uses the float32 exponent as a first guess and corrects the
    round-up-to-power-of-two case; for >31-bit inputs the high half is
    handled separately.
    """

    def msb32(v):  # v: int32/int64 with value < 2^31, v >= 0
        vf = v.astype(jnp.float32)
        # exponent = floor(log2) except when rounding carried upward
        e = (
            (lax.bitcast_convert_type(vf, jnp.int32) >> 23) & 0xFF
        ) - 127
        e = jnp.clip(e, 0, 31).astype(jnp.int32)
        # shift dtype must match v: uint64 >> int32 would promote to f64
        carry = (v >> e.astype(v.dtype)) == 0  # rounded up: true msb is e-1
        return jnp.where(carry, e - 1, e)

    if bits <= 31:
        return msb32(x & jnp.asarray(0x7FFFFFFF, dtype=x.dtype))
    # 32..64-bit inputs (uint64 covers the depth-21 sentinel bit 63):
    # split into two 32-bit halves — msb32's clip+carry logic is exact for
    # values up to 2^32 - 1
    xu = x.astype(jnp.uint64)
    hi = xu >> 32
    lo = xu & 0xFFFFFFFF
    return jnp.where(hi > 0, 32 + msb32(hi), msb32(lo)).astype(jnp.int32)


def _nearest_ge_flat(B: jnp.ndarray, n_vals: int, W: jnp.ndarray = None):
    """prev_ge[i] (previous j with B[j] >= B[i], else -1) and next_ge[i]
    (next k with B[k] >= B[i], else N), batched over the value alphabet.

    ``B`` is small (< n_vals ≈ 3J+2), so one (V, N) cummax/cummin computes
    "last/next position with B >= v" for every threshold v at once; a
    one-hot contraction selects each element's own threshold row.

    When ``W`` (an ``(N+1,)`` *nondecreasing* prefix array, e.g. weight
    prefix sums) is given, additionally returns ``W[max(prev_ge, 0)]`` and
    ``W[next_ge]`` — computed by propagating W *values* through the same
    cummax/cummin structure instead of gathering. Monotonicity makes the
    position-scan and the value-scan select the same element, so the
    results are bitwise identical to the gathers while costing two more
    cheap (V, N) scans instead of two 1-lane gathers (which waste 127/128
    lanes on TPU — docs/performance.md).
    """
    N = B.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    vals = jnp.arange(n_vals, dtype=B.dtype)
    ge = B[None, :] >= vals[:, None]                      # (V, N)
    last = lax.cummax(jnp.where(ge, idx[None, :], -1), axis=1)
    nxt = lax.cummin(
        jnp.where(ge, idx[None, :], N), axis=1, reverse=True
    )
    onehot = (B[None, :] == vals[:, None]).astype(jnp.int32)
    # strictly-before / strictly-after via shifts of the inclusive scans
    last_excl = jnp.concatenate(
        [jnp.full((n_vals, 1), -1, jnp.int32), last[:, :-1]], axis=1
    )
    next_excl = jnp.concatenate(
        [nxt[:, 1:], jnp.full((n_vals, 1), N, jnp.int32)], axis=1
    )
    # dtype pinned: integer jnp.sum otherwise accumulates in int64 under
    # jax_enable_x64 — emulated arithmetic on TPU for a (V, N) hot array
    prev_ge = jnp.sum(onehot * last_excl, axis=0, dtype=jnp.int32)
    next_ge = jnp.sum(onehot * next_excl, axis=0, dtype=jnp.int32)
    if W is None:
        return prev_ge, next_ge

    Wrow = W[:N]            # W at position j
    w_total = W[N]
    # fill 0 == W[0]: "no previous" maps to W[max(-1, 0)]; fill w_total ==
    # W[N]: "no next" maps to W[N]. Both fills respect the scan direction's
    # extremum because 0 <= W <= w_total.
    lastW = lax.cummax(
        jnp.where(ge, Wrow[None, :], jnp.zeros((), Wrow.dtype)), axis=1
    )
    nxtW = lax.cummin(
        jnp.where(ge, Wrow[None, :], w_total), axis=1, reverse=True
    )
    lastW_excl = jnp.concatenate(
        [jnp.zeros((n_vals, 1), Wrow.dtype), lastW[:, :-1]], axis=1
    )
    nextW_excl = jnp.concatenate(
        [nxtW[:, 1:], jnp.full((n_vals, 1), 1.0, Wrow.dtype) * w_total],
        axis=1,
    )
    onef = onehot.astype(Wrow.dtype)
    w_prev = jnp.sum(onef * lastW_excl, axis=0)
    w_next = jnp.sum(onef * nextW_excl, axis=0)
    return prev_ge, next_ge, w_prev, w_next


def _nge_stage(Bc, orig, lo: int, hi: int, n_slots: int,
               Wc=None, w_total=None):
    """Nearest->= scans for threshold rows ``[lo, hi)`` over one compact
    subsequence.

    ``Bc (M,)`` are the B values of the subsequence, ``orig (M,)`` their
    ORIGINAL positions (strictly ascending for real rows; padding rows
    carry ``Bc == -1`` / ``orig == n_slots`` and never win a scan). The
    cummax/cummin propagate ``orig`` directly, so outputs are global
    positions — for the full array (``orig == arange``) this is exactly
    the flat kernel restricted to rows [lo, hi). Returns per-element
    (prev_ge, next_ge[, w_prev, w_next]) — valid only where
    ``lo <= Bc < hi`` (other rows contract to 0 and must be masked).
    """
    vals = jnp.arange(lo, hi, dtype=Bc.dtype)
    ge = Bc[None, :] >= vals[:, None]                     # (V, M)
    nrows = hi - lo
    last = lax.cummax(jnp.where(ge, orig, -1), axis=1)
    nxt = lax.cummin(
        jnp.where(ge, orig, n_slots), axis=1, reverse=True
    )
    onehot = (Bc[None, :] == vals[:, None]).astype(jnp.int32)
    last_excl = jnp.concatenate(
        [jnp.full((nrows, 1), -1, jnp.int32), last[:, :-1]], axis=1
    )
    next_excl = jnp.concatenate(
        [nxt[:, 1:], jnp.full((nrows, 1), n_slots, jnp.int32)], axis=1
    )
    prev_ge = jnp.sum(onehot * last_excl, axis=0, dtype=jnp.int32)
    next_ge = jnp.sum(onehot * next_excl, axis=0, dtype=jnp.int32)
    if Wc is None:
        return prev_ge, next_ge
    lastW = lax.cummax(
        jnp.where(ge, Wc[None, :], jnp.zeros((), Wc.dtype)), axis=1
    )
    nxtW = lax.cummin(jnp.where(ge, Wc[None, :], w_total), axis=1,
                      reverse=True)
    lastW_excl = jnp.concatenate(
        [jnp.zeros((nrows, 1), Wc.dtype), lastW[:, :-1]], axis=1
    )
    nextW_excl = jnp.concatenate(
        [nxtW[:, 1:], jnp.full((nrows, 1), 1.0, Wc.dtype) * w_total],
        axis=1,
    )
    onef = onehot.astype(Wc.dtype)
    w_prev = jnp.sum(onef * lastW_excl, axis=0)
    w_next = jnp.sum(onef * nextW_excl, axis=0)
    return prev_ge, next_ge, w_prev, w_next


def _nge_tier_plan(N: int, n_vals: int):
    """Static tier plan [(lo, hi, M), ...] for :func:`_nearest_ge_tiered`,
    or None when tiering cannot help (small N or alphabet).

    The bound making this exact: codes are sorted and unique, so positions
    with ``B[i] >= v`` (adjacent pairs differing at bit >= v) number at
    most ``#distinct(codes >> v) <= 2^(levels - v)``, plus the row-0
    sentinel. High-threshold rows therefore scan a provably small compact
    subsequence instead of all N.
    """
    levels = n_vals - 2
    if N < 8192:
        return None
    # first boundary: the smallest threshold whose candidate-set bound is
    # <= N/8 (an 8x first cut; below t1 the bound exceeds N/8 and full-N
    # rows are unavoidable)
    t1 = levels - (max(N // 8, 1)).bit_length() + 1
    if t1 < 2 or t1 >= n_vals - 1:
        return None
    plan = [(0, t1, N)]
    lo = t1
    while lo < n_vals:
        bound = (1 << max(levels - lo, 0)) + 1          # +1: sentinel row
        M = min(N, -(-bound // 256) * 256)              # lane-align
        if M <= 2048 or lo + 3 >= n_vals:
            plan.append((lo, n_vals, M))
            break
        plan.append((lo, lo + 3, M))
        lo += 3
    return plan


def _nearest_ge_tiered(B: jnp.ndarray, n_vals: int, W: jnp.ndarray = None):
    """Tiered :func:`_nearest_ge_flat`: identical outputs (bitwise — all
    scans are selection ops picking the same elements), but high-threshold
    rows run over compacted candidate subsequences whose sizes are bounded
    by the sorted-unique-code structure (see :func:`_nge_tier_plan`),
    cutting the (V, N) scan volume from ``(3J+2)*N`` to roughly
    ``(levels - log2 N + 3)*N`` plus a geometric tail.
    """
    N = B.shape[0]
    plan = _nge_tier_plan(N, n_vals)
    if plan is None:
        return _nearest_ge_flat(B, n_vals, W)
    idx = jnp.arange(N, dtype=jnp.int32)
    Wrow = None if W is None else W[:N]
    w_total = None if W is None else W[N]

    # stage 0 over the full array writes the outputs directly (elements
    # with B >= t1 contract to 0 there and are overwritten by their own
    # tier's scatter below — every element belongs to exactly one tier)
    lo0, hi0, _ = plan[0]
    out = _nge_stage(B, idx, lo0, hi0, N, Wrow, w_total)
    prev_ge, next_ge = out[0], out[1]
    if W is not None:
        w_prev, w_next = out[2], out[3]

    Bc, orig, Wc, Mc = B, idx, Wrow, N
    for lo, hi, M in plan[1:]:
        # compact the candidates for thresholds >= lo; padding rows get
        # B=-1 (never >= lo), orig=N (the dummy scatter slot)
        mask = Bc >= lo
        sel = jnp.nonzero(mask, size=M, fill_value=Mc)[0]
        Bp = jnp.concatenate([Bc, jnp.full((1,), -1, Bc.dtype)])
        op = jnp.concatenate([orig, jnp.full((1,), N, jnp.int32)])
        Bc, orig, Mc = Bp[sel], op[sel], M
        if W is not None:
            Wp = jnp.concatenate([Wc, jnp.zeros((1,), Wc.dtype)])
            Wc = Wp[sel]
        out = _nge_stage(Bc, orig, lo, hi, N, Wc, w_total)
        in_range = (Bc >= lo) & (Bc < jnp.asarray(hi, Bc.dtype))
        tgt = jnp.where(in_range, orig, N)              # N = dummy slot
        pair = jnp.stack([out[0], out[1]], axis=1)
        ipad = jnp.concatenate(
            [jnp.stack([prev_ge, next_ge], axis=1),
             jnp.zeros((1, 2), jnp.int32)]
        ).at[tgt].set(pair)
        prev_ge, next_ge = ipad[:N, 0], ipad[:N, 1]
        if W is not None:
            wpair = jnp.stack([out[2], out[3]], axis=1)
            wpad = jnp.concatenate(
                [jnp.stack([w_prev, w_next], axis=1),
                 jnp.zeros((1, 2), w_prev.dtype)]
            ).at[tgt].set(wpair)
            w_prev, w_next = wpad[:N, 0], wpad[:N, 1]
    if W is None:
        return prev_ge, next_ge
    return prev_ge, next_ge, w_prev, w_next


# flat|tiered — read ONCE at import (jitted programs cache per mode); the
# two produce bitwise-identical outputs (test_raht_span.py pins it), so
# this is purely a performance A/B.
import os as _os  # noqa: E402  (also imported below for _SUM_MODE)

_NGE_MODE = _os.environ.get("RAHT3DGS_NEARESTGE", "flat")


def _nearest_ge(B: jnp.ndarray, n_vals: int, W: jnp.ndarray = None):
    if _NGE_MODE == "tiered":
        return _nearest_ge_tiered(B, n_vals, W)
    return _nearest_ge_flat(B, n_vals, W)


def _span_topology(codes, depth: int, W=None):
    """Closed-form B / drop levels / prev_ge / next_ge (codes only).

    With ``W`` (the ``(N+1,)`` weight prefix) also returns the propagated
    ``W[max(prev_ge, 0)]`` / ``W[next_ge]`` values (see :func:`_nearest_ge`).
    """
    N = codes.shape[0]
    levels = num_levels(depth, N)
    code_bits = levels  # codes < 2^levels by construction

    diff = codes[1:] ^ codes[:-1]
    B = jnp.concatenate(
        [
            jnp.full((1,), levels + 1, dtype=jnp.int32),  # sentinel: node 0
            _msb(diff, code_bits).astype(jnp.int32),
        ]
    )
    drop = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (B[1:] + 1).astype(jnp.int32)]
    )
    if W is None:
        prev_ge, next_ge = _nearest_ge(B, levels + 2)
        return drop, prev_ge, next_ge, levels, B
    prev_ge, next_ge, w_prev, w_next = _nearest_ge(B, levels + 2, W)
    return drop, prev_ge, next_ge, levels, w_prev, w_next, B


def _weight_prefix(weights, fdtype=jnp.float64):
    """Exclusive prefix sums (W[i] = sum w[:i]), length N+1.

    float64 accumulation unless the caller runs float32, where a
    double-single compensated scan keeps the sums exact at native speed
    (node weights are typically integer counts anyway).
    """
    if fdtype == jnp.float32 and _SUM_MODE != "f64":
        hi, lo = _ds_cumsum(weights.astype(jnp.float32)[:, None])
        Wincl = (hi + lo)[:, 0]
        W = jnp.concatenate([jnp.zeros((1,), jnp.float32), Wincl])
        return W, Wincl[-1]
    Wincl = jnp.cumsum(weights.astype(jnp.float64))
    W = jnp.concatenate([jnp.zeros((1,), jnp.float64), Wincl])
    return W, Wincl[-1]


def _pair_weights(codes, weights, depth: int, fdtype):
    """Per-pair side weights (w0, w1, w_total) plus topology — BITWISE
    identical to the values :func:`raht_forward_span` derives from its
    fused prefix pack (the pack's weight column is an independent ds
    cumsum column, so a standalone ds prefix + boundary gathers reproduces
    it exactly; in f64 mode the monotone-W propagation equals the gathers
    bitwise, pinned by test_nearest_ge_value_propagation_matches_gathers).
    The ``weight_desc`` stream order depends on this encoder==decoder
    bitwise identity.

    Returns (drop, prev_ge, next_ge, levels, B, w0, w1, w_total).
    """
    N = codes.shape[0]
    use_ds = fdtype == jnp.float32 and _SUM_MODE != "f64"
    if use_ds:
        drop, prev_ge, next_ge, levels, B = _span_topology(codes, depth)
        # the SAME layout helper the forward's fused pack uses — the
        # bitwise-identity contract must live in exactly one place
        P = _prefix_pack(weights.astype(jnp.float32)[:, None], True)
        # (N+1, 2): [hi, lo] exclusive prefix
        here = P[:N]
        g_next = P[next_ge]
        g_prev = P[jnp.maximum(prev_ge, 0)]
        w1 = _prefix_diff(
            g_next[:, :1], g_next[:, 1:], here[:, :1], here[:, 1:]
        )[:, 0]
        w0 = _prefix_diff(
            here[:, :1], here[:, 1:], g_prev[:, :1], g_prev[:, 1:]
        )[:, 0]
        w_total = P[N, 0] + P[N, 1]
        return drop, prev_ge, next_ge, levels, B, w0, w1, w_total
    W, w_total = _weight_prefix(weights, fdtype)
    drop, prev_ge, next_ge, levels, w_prev, w_next, B = _span_topology(
        codes, depth, W
    )
    W_here = W[:N]
    return (
        drop, prev_ge, next_ge, levels, B,
        W_here - w_prev, w_next - W_here, w_total,
    )


# ---------------------------------------------------------------------------
# Double-single (two-float32) prefix sums.
#
# float64 is software-emulated on TPU; the span transform only needs wide
# accumulators for the *prefix sums* (differences of nearby prefixes must
# not cancel catastrophically). An error-free two-sum compensated pair of
# float32s carries ~48 mantissa bits at native-f32 speed. XLA does not
# reassociate floating point, so the two-sum identities hold compiled.
# Selected via RAHT3DGS_SPAN_SUMS=ds|dsflat|f64 — read ONCE at import; set
# it before importing the package (jitted programs cache per traced mode).
# "ds" (default) = blocked compensated scan; "dsflat" = the round-1 flat
# association (same accuracy, slower, kept for A/B); "f64" = plain float64.
# ---------------------------------------------------------------------------
import os as _os

_SUM_MODE = _os.environ.get("RAHT3DGS_SPAN_SUMS", "ds")


def _two_sum(a, b):
    s = a + b
    bv = s - a
    err = (a - (s - bv)) + (b - bv)
    return s, err


def _ds_combine(x, y):
    """Associative double-single addition over (hi, lo) pairs."""
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def _ds_cumsum_flat(values_f32):
    """Flat-association compensated prefix sums (the round-1 default)."""
    zeros = jnp.zeros_like(values_f32)
    return lax.associative_scan(_ds_combine, (values_f32, zeros), axis=0)


def _ds_cumsum(values_f32, block: int = 256):
    """Compensated prefix sums along axis 0; returns (hi, lo) float32.

    Default (round 2): a block-decomposed scan — intra-block ds scan over
    ``block`` rows, ds scan of block totals, one combine pass. A custom-
    combiner ``lax.associative_scan`` lowers to odd/even slicing passes
    whose cost scales with the scanned axis; two short axes over regular
    layouts measured ~10x faster than the flat scan at 500k x 4 f32 on
    v5e (scripts/exp_vox_pieces.py). Every operation stays compensated
    (~48 mantissa bits), and integer-valued lanes (the RAHT weight
    column) are EXACT under any association while partials are < 2**24 —
    so the encoder==decoder bitwise weight contract (``_pair_weights``)
    is association-independent. Float lanes' low bits differ from the
    flat association — legal because decode needs no cross-version
    agreement on these sums (the default f64 golden never touches this
    path; the f32 fast path has its OWN stream golden,
    tests/test_pipeline.py::test_stream_format_frozen_f32, which a
    deliberate association change must re-pin).

    RAHT3DGS_SPAN_SUMS=dsflat restores the round-1 flat association.
    RAHT3DGS_PALLAS=1 switches to the single-pass Pallas kernel with an
    on-chip carry (ops/pallas_scan.py); =2 uses the transposed variant
    (K rows x N on the lane axis). Both Pallas paths are correct on v5e
    but measured slower than the blocked scan at codec shapes.
    """
    mode = _os.environ.get("RAHT3DGS_PALLAS", "0")
    if mode in ("1", "2") and jax.default_backend() != "cpu":
        from raht3dgs_tpu.ops.pallas_scan import (
            ds_cumsum_pallas,
            ds_cumsum_pallas_t,
        )

        kern = ds_cumsum_pallas_t if mode == "2" else ds_cumsum_pallas
        return kern(values_f32)
    N, K = values_f32.shape
    if _SUM_MODE == "dsflat" or N <= 2 * block:
        return _ds_cumsum_flat(values_f32)
    nb = -(-N // block)
    pad = nb * block - N
    v = jnp.pad(values_f32, ((0, pad), (0, 0))).reshape(nb, block, K)
    hi, lo = lax.associative_scan(
        _ds_combine, (v, jnp.zeros_like(v)), axis=1
    )
    bh, bl = lax.associative_scan(
        _ds_combine, (hi[:, -1, :], lo[:, -1, :]), axis=0
    )
    zrow = jnp.zeros((1, K), values_f32.dtype)
    bh = jnp.concatenate([zrow, bh[:-1]])[:, None, :]
    bl = jnp.concatenate([zrow, bl[:-1]])[:, None, :]
    oh, ol = _ds_combine((bh, bl), (hi, lo))
    return (
        oh.reshape(nb * block, K)[:N],
        ol.reshape(nb * block, K)[:N],
    )


def _prefix_pack(body, use_ds: bool):
    """Exclusive prefix sums of ``body (N, K)`` with a leading zero row.

    Returns (P, dtype) where P is (N+1, K[, 2 lanes folded]) — in ds mode
    hi/lo are interleaved as extra columns so gathers stay wide; use
    :func:`_prefix_diff` to subtract prefixes exactly.
    """
    if not use_ds:
        P = jnp.concatenate(
            [jnp.zeros((1, body.shape[1]), jnp.float64),
             jnp.cumsum(body.astype(jnp.float64), axis=0)]
        )
        return P
    hi, lo = _ds_cumsum(body.astype(jnp.float32))
    P = jnp.concatenate([hi, lo], axis=1)  # (N, 2K)
    return jnp.concatenate([jnp.zeros((1, P.shape[1]), jnp.float32), P])


def _prefix_diff(g_hi_row, g_lo_row, h_hi_row, h_lo_row):
    """(g - h) for double-single prefixes, compensated."""
    # negate h and ds-add
    s, e = _two_sum(g_hi_row, -h_hi_row)
    e = e + (g_lo_row - h_lo_row)
    return s + e


from raht3dgs_tpu.ops.raht import _butterfly_ab as _safe_ab  # one definition


@partial(jax.jit, static_argnames=("depth",))
def raht_structure_span(codes, weights, depth: int) -> RahtStructure:
    """Closed-form structure pass (decoder prelude). Same contract as
    ops/raht.py:raht_structure."""
    N = codes.shape[0]
    fdtype = weights.dtype
    drop, _, _, _, _, w0, w1, w_total = _pair_weights(
        codes, weights, depth, fdtype
    )
    node_w = jnp.where(
        jnp.arange(N, dtype=jnp.int32) == 0, w_total, w0 + w1
    ).astype(fdtype)
    subtree = jnp.where(jnp.arange(N, dtype=jnp.int32) == 0, w_total, w1).astype(fdtype)
    return RahtStructure(
        drop_level=drop, subtree_w=subtree, node_weights=node_w
    )


@partial(jax.jit, static_argnames=("depth",))
def raht_forward_span(codes, attributes, weights, depth: int) -> RahtForwardResult:
    """Closed-form forward RAHT. Same contract as ops/raht.py:raht_forward.

    The weight column rides the fused prefix pack; its values are bitwise
    reproducible by the decoder through :func:`_pair_weights` (standalone
    ds prefix + boundary gathers), which is what the ``weight_desc``
    stream order depends on.
    """
    N, D = attributes.shape
    fdtype = attributes.dtype
    drop, prev_ge, next_ge, _, _B = _span_topology(codes, depth)
    idx = jnp.arange(N, dtype=jnp.int32)

    # Fused prefix pack: attribute sums (D) + weight sums (1) ride the same
    # two wide gathers (sqrt(w)-scaled values: the butterfly invariant).
    # float32 mode uses double-single compensated sums (native speed, ~48
    # mantissa bits); float64 mode keeps plain f64 sums for crosscheck work.
    use_ds = fdtype == jnp.float32 and _SUM_MODE != "f64"
    acc_dt = jnp.float32 if use_ds else jnp.float64
    w_acc = weights.astype(acc_dt)
    sw = jnp.sqrt(w_acc)[:, None]
    body = jnp.concatenate([sw * attributes.astype(acc_dt), w_acc[:, None]], axis=1)
    K = D + 1
    SW = _prefix_pack(body, use_ds)

    SW_here = SW[:N]                        # slice, not a gather
    g_next = SW[next_ge]                    # one wide gather
    g_prev = SW[jnp.maximum(prev_ge, 0)]    # one wide gather
    if use_ds:
        sub = _prefix_diff(g_next[:, :K], g_next[:, K:],
                           SW_here[:, :K], SW_here[:, K:])
        sub1, w1 = sub[:, :D], sub[:, D]
        sub = _prefix_diff(SW_here[:, :K], SW_here[:, K:],
                           g_prev[:, :K], g_prev[:, K:])
        sub0, w0 = sub[:, :D], sub[:, D]
        totals = SW[N, :K] + SW[N, K:]
        w_total = totals[D]
        total_S = totals[:D]
    else:
        sub1 = g_next[:, :D] - SW_here[:, :D]
        sub0 = SW_here[:, :D] - g_prev[:, :D]
        w1 = g_next[:, D] - SW_here[:, D]
        w0 = SW_here[:, D] - g_prev[:, D]
        w_total = SW[N, D]
        total_S = SW[N, :D]
    x1 = jnp.where(w1[:, None] > 0, sub1 / jnp.sqrt(jnp.where(w1 > 0, w1, 1.0))[:, None], 0.0)
    x0 = jnp.where(w0[:, None] > 0, sub0 / jnp.sqrt(jnp.where(w0 > 0, w0, 1.0))[:, None], 0.0)
    a, b = _safe_ab(w0, w1)
    detail = (-b[:, None] * x0 + a[:, None] * x1).astype(fdtype)

    dc = (total_S / jnp.sqrt(jnp.where(w_total > 0, w_total, 1.0))).astype(fdtype)
    T = jnp.where((idx == 0)[:, None], dc[None, :], detail)

    node_w = jnp.where(idx == 0, w_total, w0 + w1).astype(fdtype)
    subtree = jnp.where(idx == 0, w_total, w1).astype(fdtype)
    return RahtForwardResult(
        coeffs=T,
        weights=node_w,
        structure=RahtStructure(
            drop_level=drop, subtree_w=subtree, node_weights=node_w
        ),
    )


def _last_write_fill(has, val, reverse: bool = False):
    """Last-write-wins scan along axis 1.

    ``has``: (V, N) float {0, 1} write mask; ``val``: (V, N, D) written
    values. Returns the inclusive forward (or backward) fill: at each
    position, the value of the nearest write at-or-before (at-or-after when
    ``reverse``) that position, 0 where no write has occurred yet.
    """

    def comb(x, y):
        xh, xv = x
        yh, yv = y
        return jnp.maximum(xh, yh), jnp.where(yh[..., None] > 0, yv, xv)

    return lax.associative_scan(comb, (has, val), axis=1, reverse=reverse)[1]


@partial(jax.jit, static_argnames=("depth",))
def _raht_inverse_span_fill(coeffs, codes, weights, depth: int) -> jnp.ndarray:
    """Scan-only inverse: the orthonormal expansion as interval sums.

    The transform matrix ``A`` (``T = A c`` with ``A_ij = -b_i
    sqrt(w_j)/sqrt(w0_i)`` on the left span, ``a_i sqrt(w_j)/sqrt(w1_i)``
    on the right, ``sqrt(w_j)/sqrt(W)`` for the DC row) is orthogonal in
    plain l2 — row norms telescope to ``a^2 + b^2 = 1`` because the
    sqrt(w_j) factors sum to the side weights. Hence ``c = A^T T`` expands
    each leaf as ``sqrt(w_k)`` times a sum of *interval-constant* node
    contributions:

        c_k = sqrt(w_k) * ( sum_{i: k in [p_i, i)} u_i
              + sum_{i: k in [i, q_i)} v_i + T_0 / sqrt(W_total) )
        u_i = -b_i T_i / sqrt(w0_i),   v_i = a_i T_i / sqrt(w1_i)

    For a fixed merge level ``x``, the spans of nodes with ``B_i == x`` are
    disjoint (consecutive ``B >= x`` positions), so for each leaf and level
    at most one node contributes — and it is exactly the nearest position
    with ``B >= x`` (before/after the leaf) *when that position's B equals
    x*. Both selections are last-write-wins fills over the same (V, N)
    threshold-row structure the topology pass already builds: two
    associative scans and a V-axis reduction replace the pointer-doubling
    chain (5 unrolled rounds of wide gathers) and the leaf shift entirely
    — no gathers at all remain in the inverse.

    Memory: the fill operand is (V, N, D); wide-channel workloads (3DGS
    D=56) are chunked along D to bound the live footprint.
    """
    N, D = coeffs.shape
    fdtype = coeffs.dtype
    # propagation-based weights: the butterfly gains have NO bitwise
    # requirement (only the structure pass's node_weights order does — see
    # _pair_weights); the (V, N) propagation is the cheap path here
    W, w_total = _weight_prefix(weights, fdtype)
    drop, prev_ge, next_ge, levels, w_prev, w_next, B = _span_topology(
        codes, depth, W
    )
    W_here = W[:N]
    w1 = w_next - W_here
    w0 = W_here - w_prev
    a, b = _safe_ab(w0, w1)
    acc_dt = jnp.float64 if fdtype == jnp.float64 else jnp.float32
    T = coeffs.astype(acc_dt)
    a = a.astype(acc_dt)
    b = b.astype(acc_dt)

    inv_s0 = jnp.where(w0 > 0, 1.0 / jnp.sqrt(jnp.where(w0 > 0, w0, 1.0)), 0.0)
    inv_s1 = jnp.where(w1 > 0, 1.0 / jnp.sqrt(jnp.where(w1 > 0, w1, 1.0)), 0.0)
    idx = jnp.arange(N, dtype=jnp.int32)
    not0 = (idx != 0).astype(acc_dt)[:, None]
    u = (-b * inv_s0.astype(acc_dt))[:, None] * T * not0
    v = (a * inv_s1.astype(acc_dt))[:, None] * T * not0

    n_vals = levels + 2
    vals = jnp.arange(n_vals, dtype=B.dtype)
    ge = B[None, :] >= vals[:, None]                       # (V, N)
    eq = (B[None, :] == vals[:, None])[..., None]          # (V, N, 1)
    has = ge.astype(jnp.float32)

    # chunk the channel axis: the fill operand is (V, N, Dc)
    max_elems = 1 << 27  # ~512 MB of f32 live per fill operand
    dc = max(1, min(D, max_elems // max(1, n_vals * N)))
    v_parts = []
    u_parts = []
    for c0 in range(0, D, dc):
        vk = v[:, c0 : c0 + dc]
        uk = u[:, c0 : c0 + dc]
        vfill = _last_write_fill(has, jnp.where(eq, vk[None], 0.0))
        v_parts.append(jnp.sum(vfill, axis=0))
        ufill = _last_write_fill(has, jnp.where(eq, uk[None], 0.0), reverse=True)
        u_parts.append(jnp.sum(ufill, axis=0))
    v_sum = jnp.concatenate(v_parts, axis=1) if len(v_parts) > 1 else v_parts[0]
    u_incl = jnp.concatenate(u_parts, axis=1) if len(u_parts) > 1 else u_parts[0]
    # u intervals [p_i, i) exclude i itself: take the backward fill at k+1
    u_sum = jnp.concatenate([u_incl[1:], jnp.zeros((1, D), u_incl.dtype)])

    dc_term = T[0] / jnp.sqrt(jnp.where(w_total > 0, w_total, 1.0)).astype(acc_dt)
    swk = jnp.sqrt(weights.astype(acc_dt))
    out = (v_sum + u_sum + dc_term[None, :]) * swk[:, None]
    return out.astype(fdtype)


@partial(jax.jit, static_argnames=("depth",))
def _raht_inverse_span_chain(coeffs, codes, weights, depth: int) -> jnp.ndarray:
    """Affine pointer-doubling inverse over the merge tree.

    Recomputes the closed-form structure from ``codes``+``weights`` — the
    decoder has both — and resolves every pair's parent-span value in
    O(log levels) doubling steps.
    """
    N, D = coeffs.shape
    fdtype = coeffs.dtype
    # propagation-based weights (see the fill inverse's note: no bitwise
    # requirement on butterfly gains; cheapest shared topology pass)
    W, w_total = _weight_prefix(weights, fdtype)
    drop, prev_ge, next_ge, levels, w_prev, w_next, _B = _span_topology(
        codes, depth, W
    )
    W_here = W[:N]
    w1 = w_next - W_here
    w0 = W_here - w_prev
    idx = jnp.arange(N, dtype=jnp.int32)
    a, b = _safe_ab(w0, w1)
    # work in the I/O precision: the affine chain is a product of gains <= 1
    # over <= levels steps (relative error ~levels*eps — negligible vs any
    # quantization step); float64 crosscheck mode stays float64
    T64 = coeffs.astype(jnp.float64 if fdtype == jnp.float64 else fdtype)

    p = prev_ge
    q = next_ge
    p_c = jnp.maximum(p, 0)
    q_c = jnp.minimum(q, N - 1)

    # Pack everything a neighbor lookup needs into one per-node table so
    # the p/q lookups are two WIDE row gathers — the previous formulation's
    # seven 1-lane gathers (b[p_c], a[q_c], next_ge[p_c], ...) each waste
    # 127/128 lanes on TPU (docs/performance.md). next_ge rides as a float
    # lane: exact for N <= 2^24 (bucketed frames are far below; f64 mode is
    # exact to 2^53). Enforced:
    lane_limit = 1 << (jnp.finfo(T64.dtype).nmant + 1)
    if N > lane_limit:
        raise NotImplementedError(
            f"{T64.dtype} chain inverse supports N <= {lane_limit} slots "
            f"(got {N}): pointer lanes ride as exact float values — use "
            "float64 I/O or RAHT3DGS_SPAN_INVERSE=fill"
        )
    nf = next_ge.astype(T64.dtype)
    Z = jnp.concatenate([a[:, None], b[:, None], T64, nf[:, None]], axis=1)
    Zp = Z[p_c]
    Zq = Z[q_c]
    a_p, b_p, T_p = Zp[:, 0], Zp[:, 1], Zp[:, 2 : 2 + D]
    a_q, b_q, T_q = Zq[:, 0], Zq[:, 1], Zq[:, 2 : 2 + D]
    # last-merge test: i is its left partner's final merge iff the merged
    # span [p, q) is exactly p's own subtree span [p, next_ge[p])
    last_merge = Zp[:, 2 + D] == q.astype(T64.dtype)

    # Affine recursion Y[i] = g[i] * Y[par[i]] + d[i]:
    #   last merge, p > 0:  Y[i] = x1[p] = b_p Y[p] + a_p T[p]
    #   last merge, p == 0: Y[i] = DC = T[0]              (terminal)
    #   else:               Y[i] = x0[q] = a_q Y[q] - b_q T[q]
    par = jnp.where(last_merge, p_c, q_c).astype(jnp.int32)
    g = jnp.where(last_merge, b_p, a_q)
    d = jnp.where(
        last_merge[:, None],
        a_p[:, None] * T_p,
        -b_q[:, None] * T_q,
    )
    root_child = last_merge & (p == 0)
    g = jnp.where(root_child, 0.0, g)
    d = jnp.where(root_child[:, None], T64[0][None, :], d)
    # node 0 itself: terminal no-op (elementwise select — .at[0].set lowers
    # to a scatter, which costs milliseconds on TPU; see docs/performance.md)
    is0 = idx == 0
    g = jnp.where(is0, jnp.zeros((), g.dtype), g)
    d = jnp.where(is0[:, None], T64[0][None, :], d)
    par = jnp.where(is0, jnp.int32(0), par).astype(jnp.int32)

    # pointer doubling: compose Y = g*(parent chain) + d until converged.
    # A chain ascends >= 1 merge level per hop and terminates at node 0, so
    # its length is <= levels; 2^steps >= levels suffices (at J=10 this is
    # 5 rounds, not 6 — levels+1 = 32 is a power of two). The staircase
    # test (test_span_inverse_maximum_chain_depth) pins this bound.
    import math

    steps = max(1, math.ceil(math.log2(levels + 1)))

    acc = T64.dtype

    def dbl(_, state):
        par, g, d = state
        pack = jnp.concatenate(
            [g[:, None].astype(acc), d, par[:, None].astype(acc)],
            axis=1,
        )
        gp = pack[par]
        g2 = g * gp[:, 0]
        d2 = d + g[:, None] * gp[:, 1 : 1 + D]
        par2 = gp[:, 1 + D].astype(jnp.int32)
        return par2, g2, d2

    # static round count: unroll instead of fori_loop (a while-loop in HLO
    # serializes against surrounding fusion; straight-line rounds pipeline)
    state = (par, g, d)
    for _ in range(steps):
        state = dbl(0, state)
    par, g, d = state
    Y = d  # all chains terminate at node 0 whose g == 0

    x0 = a[:, None] * Y - b[:, None] * T64
    x1 = b[:, None] * Y + a[:, None] * T64

    # leaf k: value of span [k, k+1). x0[k+1] is a unit shift — express it
    # as slice+concat (contiguous copy), not a gather of indices idx+1.
    nxt_is_child = jnp.concatenate(
        [prev_ge[1:] == idx[:-1], jnp.zeros((1,), bool)]
    )
    x0_next = jnp.concatenate([x0[1:], x0[-1:]])
    out = jnp.where(nxt_is_child[:, None], x0_next, x1)
    # N == 1: the lone root's value is the DC itself (Y[0] == T[0])
    lone = (idx == 0) & ~nxt_is_child
    out = jnp.where(lone[:, None], Y, out)
    return out.astype(fdtype)


def raht_inverse_span(coeffs, codes, weights, depth: int) -> jnp.ndarray:
    """Closed-form inverse RAHT (decoder side of :func:`raht_forward_span`).

    Two equivalent formulations, selected by ``RAHT3DGS_SPAN_INVERSE``
    (read on every call — the dispatcher is deliberately un-jitted so a
    mid-process env change cannot be shadowed by a stale jit cache entry;
    each formulation is jitted separately):

    - ``chain`` (default): affine pointer-doubling along parent pointers
      (see :func:`_raht_inverse_span_chain`).
    - ``fill``: interval-sum expansion via last-write-wins scans — zero
      gathers (see :func:`_raht_inverse_span_fill`). **Measured 180x
      slower than chain on TPU v5e** (0.085 vs 15.3 Mpts/s roundtrip at
      524k): ``lax.associative_scan`` with a custom pytree combiner lowers
      to ~log2(N) odd/even slicing passes over the (V, N, D) operand,
      which defeats TPU tiling — only ``cummax``/``cumsum``-class scans
      get the native reduce-window lowering the topology pass relies on.
      Kept as an independently-derived correctness oracle
      (test_span_inverse_fill_matches_chain) and for non-TPU backends.

    Both recompute the structure from ``codes``+``weights`` — exactly what
    the decoder has after entropy-decoding positions.
    """
    mode = _os.environ.get("RAHT3DGS_SPAN_INVERSE", "chain")
    if mode == "fill":
        return _raht_inverse_span_fill(coeffs, codes, weights, depth)
    return _raht_inverse_span_chain(coeffs, codes, weights, depth)
