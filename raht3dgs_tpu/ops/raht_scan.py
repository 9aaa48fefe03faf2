"""Scan-only RAHT: no gathers, no scatters on the hot path.

Third formulation of the forward transform (see ops/raht.py dense-masked and
ops/raht_compact.py compaction). Random-access gathers/scatters can be the
slowest memory primitive on TPU; associative scans are among the fastest.
Here the *values* of each node's neighbors are propagated directly with two
value-carrying segmented scans per level:

- ``pull_next``: for every position, the (code, T, w) of the nearest active
  position at-or-after it — a reverse "first-valid" scan;
- ``pull_prev``: symmetric forward scan.

A left sibling reads its partner from ``pull_next`` one slot to the right;
a right sibling reads its partner from ``pull_prev`` one slot to the left.
Everything else (pair detection, butterfly, bookkeeping) is elementwise.
Cost per level: 2 scans carrying D+3 lanes + O(N·D) elementwise — best for
small/medium D (the 3-channel color path); for D=56 prefer the other
formulations.

Same pairing as ops/raht.py (bitwise-identical structure); coefficients agree to 1e-12 (fp contraction differs between compiled programs) — verified in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from raht3dgs_tpu.ops.raht import (
    RahtForwardResult,
    RahtStructure,
    _butterfly_ab,
    _level_mask,
    num_levels,
)


def _bcast(mask, x):
    return mask if x.ndim == mask.ndim else mask[..., None]


def _latest_valid(a, b):
    """Keep the latest valid entry in scan order. JAX implements
    ``reverse=True`` as flip-scan-flip, so this single combiner yields the
    nearest valid at-or-before (forward) and at-or-after (reverse)."""
    bv = b[0]
    return tuple(jnp.where(_bcast(bv, y), y, x) for x, y in zip(a, b))


def _pull(active, payloads, reverse):
    """For each position: (valid, payloads...) of the nearest active
    position at-or-before (forward) / at-or-after (reverse) it. Payloads are
    garbage where ``valid`` is False — callers must mask."""
    tup = (active,) + tuple(payloads)
    out = lax.associative_scan(_latest_valid, tup, reverse=reverse)
    return out


def _shift_fwd(x, fill):
    """x[i-1] with fill at i=0."""
    pad = jnp.full((1,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:-1]])


def _shift_bwd(x, fill):
    """x[i+1] with fill at i=N-1."""
    pad = jnp.full((1,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x[1:], pad])


@partial(jax.jit, static_argnames=("depth",))
def raht_forward_scan(
    codes: jnp.ndarray,
    attributes: jnp.ndarray,
    weights: jnp.ndarray,
    depth: int,
) -> RahtForwardResult:
    """Forward RAHT with scan-propagated neighbor values. Same contract as
    ops/raht.py:raht_forward."""
    if codes.dtype == jnp.uint64:
        raise NotImplementedError(
            "the scan formulation does not support the uint64 depth-21 code "
            "tier (its -1 sentinels and signed guards assume a signed "
            "dtype); use the span or dense implementation"
        )
    N, D = attributes.shape
    levels = num_levels(depth, N)
    fdtype = attributes.dtype
    bad_code = jnp.asarray(-1, dtype=codes.dtype)

    def body(j, state):
        T, w, active, drop, ws = state
        mask = _level_mask(codes.dtype, j, levels)

        # nearest-active payloads at-or-after / at-or-before each position
        nv, nc, nT, nw = _pull(active, (codes, T, w), reverse=True)
        pv, pc, pT, pw = _pull(active, (codes, T, w), reverse=False)
        nc = jnp.where(nv, nc, bad_code)
        pc = jnp.where(pv, pc, bad_code)
        # strictly-after / strictly-before via one shift
        succ_c = _shift_bwd(nc, bad_code)
        succ_T = _shift_bwd(nT, 0)
        succ_w = _shift_bwd(nw, 0)
        pred_c = _shift_fwd(pc, bad_code)
        pred_T = _shift_fwd(pT, 0)
        pred_w = _shift_fwd(pw, 0)

        left = active & (succ_c >= 0) & (((codes ^ succ_c) & mask) == 0)
        # right iff the previous active pairs with us
        right = active & (pred_c >= 0) & (((codes ^ pred_c) & mask) == 0) & (
            ~left
        )
        # NB: for sorted unique codes left and right are exclusive except the
        # impossible triple case; the ~left guard also makes the pad-root /
        # chain edge deterministic.

        partner_T = jnp.where(left[:, None], succ_T, pred_T)
        partner_w = jnp.where(left, succ_w, pred_w)
        w0 = jnp.where(left, w, partner_w)
        w1 = jnp.where(left, partner_w, w)
        a, b = _butterfly_ab(w0, w1)
        x0 = jnp.where(left[:, None], T, partner_T)
        x1 = jnp.where(left[:, None], partner_T, T)
        touched = left | right
        lo = a[:, None] * x0 + b[:, None] * x1
        hi = -b[:, None] * x0 + a[:, None] * x1
        T = jnp.where(touched[:, None], jnp.where(left[:, None], lo, hi), T)
        ws = jnp.where(right, w, ws)
        w = jnp.where(touched, w0 + w1, w)
        drop = jnp.where(right, j.astype(jnp.int32), drop)
        active = active & ~right
        return T, w, active, drop, ws

    init = (
        attributes,
        weights.astype(fdtype),
        jnp.ones((N,), dtype=bool),
        jnp.zeros((N,), dtype=jnp.int32),
        jnp.zeros((N,), dtype=fdtype),
    )
    T, w, active, drop, ws = lax.fori_loop(1, levels + 1, body, init)
    ws = jnp.where(active, w, ws)
    return RahtForwardResult(
        coeffs=T,
        weights=w,
        structure=RahtStructure(drop_level=drop, subtree_w=ws, node_weights=w),
    )
