"""Compaction-based RAHT: gather-free butterfly levels.

Alternative formulation of ops/raht.py tuned for TPU memory behavior. The
dense-masked version finds each node's sibling with successor/predecessor
index scans plus random gathers. Here the active nodes are instead kept
*compacted to a prefix* of a fixed-size buffer, in sorted-code order. Then:

- sibling pairs are **adjacent elements** (k, k+1) — partner access is a
  shift, not a gather (sorted unique codes guarantee no two adjacent pairs
  overlap; see the invariant discussion in ops/raht.py);
- the per-level shrink is a single monotone compaction scatter driven by a
  cumsum (scatter indices sorted + unique — TPU-friendly);
- merged right-siblings scatter their detail coefficient and structure
  entry once into their final output slot (original position), exactly
  where the dense formulation leaves them.

All scatters write through a trash slot (index N of an N+1 buffer) for
inactive rows, so no duplicate-index write ever races a real one.

Outputs are bitwise-compatible with ops/raht.py (same pairing and
arithmetic), asserted in tests; ``raht_inverse`` consumes the structure
unchanged.
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


@partial(jax.jit, static_argnames=("depth",))
def raht_forward_compact(
    codes: jnp.ndarray,
    attributes: jnp.ndarray,
    weights: jnp.ndarray,
    depth: int,
) -> RahtForwardResult:
    """Forward RAHT via per-level compaction. Same contract as
    ops/raht.py:raht_forward (sorted unique codes; zero-weight padding)."""
    if codes.dtype == jnp.uint64:
        raise NotImplementedError(
            "the compact formulation does not support the uint64 depth-21 code "
            "tier (its -1 sentinels and signed guards assume a signed "
            "dtype); use the span or dense implementation"
        )
    N, D = attributes.shape
    levels = num_levels(depth, N)
    fdtype = attributes.dtype
    idx = jnp.arange(N, dtype=jnp.int32)
    sentinel = jnp.asarray(-1, dtype=codes.dtype)  # never pairs

    # Output buffers in ORIGINAL slot space, with one trash slot at index N.
    T_out0 = jnp.concatenate([attributes, jnp.zeros((1, D), fdtype)])
    w_out0 = jnp.concatenate([weights.astype(fdtype), jnp.zeros((1,), fdtype)])
    drop0 = jnp.zeros((N + 1,), dtype=jnp.int32)
    ws0 = jnp.zeros((N + 1,), dtype=fdtype)

    state = (
        codes,                      # compact codes (prefix live)
        attributes,                 # compact T
        weights.astype(fdtype),     # compact w
        idx,                        # compact -> original slot
        jnp.int32(N),               # live count
        T_out0, w_out0, drop0, ws0,
    )

    def body(j, s):
        c_codes, T, w, orig, count, T_out, w_out, drop, ws = s
        live = idx < count
        mask = _level_mask(c_codes.dtype, j, levels)
        c = jnp.where(live, c_codes, sentinel)
        nxt = jnp.concatenate([c[1:], jnp.full((1,), sentinel)])
        left = live & (nxt >= 0) & (((c ^ nxt) & mask) == 0)
        right = jnp.concatenate([jnp.zeros((1,), bool), left[:-1]])

        Tn = jnp.concatenate([T[1:], jnp.zeros((1, D), fdtype)])
        wn = jnp.concatenate([w[1:], jnp.zeros((1,), fdtype)])
        a, b = _butterfly_ab(w, wn)                  # valid on left rows
        lo = a[:, None] * T + b[:, None] * Tn        # new left value
        detail_at_left = -b[:, None] * T + a[:, None] * Tn
        detail = jnp.concatenate(
            [jnp.zeros((1, D), fdtype), detail_at_left[:-1]]
        )                                            # detail at right rows
        w_pair = w + wn
        w_pair_at_right = jnp.concatenate([jnp.zeros((1,), fdtype), w_pair[:-1]])

        # ---- write dropped right nodes to their final output slots ----
        out_slot = jnp.where(right, orig, jnp.int32(N))  # trash for others
        T_out = T_out.at[out_slot].set(detail)
        w_out = w_out.at[out_slot].set(w_pair_at_right)
        drop = drop.at[out_slot].set(jnp.int32(1) * j)
        ws = ws.at[out_slot].set(w)                  # subtree weight at drop

        # ---- compact survivors to the prefix ----
        T_new = jnp.where(left[:, None], lo, T)
        w_new = jnp.where(left, w_pair, w)
        keep = live & ~right
        pos = (jnp.cumsum(keep.astype(jnp.int32)) - 1).astype(jnp.int32)
        dest = jnp.where(keep, pos, jnp.int32(N))    # trash for dropped/dead
        count_new = jnp.sum(keep.astype(jnp.int32)).astype(jnp.int32)

        codes_c = jnp.full((N + 1,), sentinel, dtype=c_codes.dtype).at[dest].set(c_codes)[:N]
        T_c = jnp.zeros((N + 1, D), fdtype).at[dest].set(T_new)[:N]
        w_c = jnp.zeros((N + 1,), fdtype).at[dest].set(w_new)[:N]
        orig_c = jnp.zeros((N + 1,), jnp.int32).at[dest].set(orig)[:N]

        return (codes_c, T_c, w_c, orig_c, count_new, T_out, w_out, drop, ws)

    s = lax.fori_loop(1, levels + 1, body, state)
    c_codes, T, w, orig, count, T_out, w_out, drop, ws = s

    # survivors: final values back to their original slots
    live = idx < count
    out_slot = jnp.where(live, orig, jnp.int32(N))
    T_out = T_out.at[out_slot].set(T)
    w_out = w_out.at[out_slot].set(w)
    ws = ws.at[out_slot].set(w)

    return RahtForwardResult(
        coeffs=T_out[:N],
        weights=w_out[:N],
        structure=RahtStructure(
            drop_level=drop[:N], subtree_w=ws[:N], node_weights=w_out[:N]
        ),
    )
