"""Inter-frame attribute prediction over sorted Morton codes.

The reference encodes every frame of a dynamic sequence independently
(``/root/reference/python/encode_dataset.py`` — one intra encode per
frame). Dynamic scans are temporally coherent, so this module adds the
codec's inter mode: predict frame t's attributes from frame t-1's
*reconstruction*, then RAHT-code the (small) residual.

TPU-first correspondence: no KD-tree, no dynamic shapes. Each current
voxel probes a fixed set of neighbor offsets (itself + the 6 face
neighbors, optionally the full 3x3x3 shell), Morton-encodes each probe
(bit math), and binary-searches the previous frame's sorted code vector
(``searchsorted`` lowers to a vectorized O(log N) chain on TPU). The
nearest occupied probe wins. Everything is deterministic from
(codes_t, codes_prev, recon_prev), all of which the decoder also has —
so encoder and decoder compute bitwise-identical predictions and the
loop stays closed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.ops.morton import morton_decode, morton_encode

# probe sets: offset tuples ordered by squared distance (ties: fixed order)
_FACE7 = (
    (0, 0, 0),
    (-1, 0, 0), (1, 0, 0),
    (0, -1, 0), (0, 1, 0),
    (0, 0, -1), (0, 0, 1),
)
_SHELL27 = tuple(
    sorted(
        (
            (dx, dy, dz)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ),
        key=lambda o: (o[0] * o[0] + o[1] * o[1] + o[2] * o[2], o),
    )
)


def _join_impl() -> str:
    """Probe-membership implementation: "search" (searchsorted, the
    golden reference) or "sort" (two-pass lax.sort join — ~5x faster on
    TPU, where searchsorted's log2(N) gather chain pays per-row DMA cost
    per step while XLA's sort is a fused network). "auto" (default)
    picks "sort" on TPU backends. Both produce bitwise-identical
    results (pinned by tests), so encoder and decoder may differ."""
    import os

    v = os.environ.get("RAHT3DGS_TEMPORAL_JOIN", "auto")
    if v in ("search", "sort"):
        return v
    return "sort" if jax.default_backend() in ("tpu", "axon") else "search"


def _probe_codes(P, offsets, lim, depth, code_dtype):
    """(N, K) probe codes: clip(P + offset) morton-encoded per offset."""
    offs = jnp.asarray(offsets, dtype=P.dtype)              # (K, 3)
    Q = jnp.clip(P[:, None, :] + offs[None, :, :], 0, lim)  # (N, K, 3)
    K = offs.shape[0]
    return morton_encode(
        Q.reshape(-1, 3), depth
    ).astype(code_dtype).reshape(-1, K)


def _probe_match_search(codes_probe, codes_prev, occ_prev):
    """(hit (N,K) bool, idx (N,K) int32) via per-column searchsorted."""
    nprev = codes_prev.shape[0]
    hits, idxs = [], []
    for k in range(codes_probe.shape[1]):
        c = codes_probe[:, k]
        idx = jnp.clip(
            jnp.searchsorted(codes_prev, c), 0, nprev - 1
        ).astype(jnp.int32)
        hits.append((codes_prev[idx] == c) & occ_prev[idx])
        idxs.append(idx)
    return jnp.stack(hits, axis=1), jnp.stack(idxs, axis=1)


def _probe_match_sort(codes_probe, codes_prev, occ_prev):
    """Same result as :func:`_probe_match_search` via a two-sort join.

    Sort [prev codes ++ flattened probe codes] by (code, tag) with prev
    tags ordered first; prev codes are UNIQUE and already sorted, so the
    r-th prev entry in the sorted merge IS ``codes_prev[r]`` — a plain
    ``cumsum(is_prev) - 1`` therefore indexes each probe's candidate
    match with no scan or scatter. A second sort by tag restores the
    (N, K) layout. All integer ops -> bitwise identical to the
    searchsorted path."""
    N, K = codes_probe.shape
    nprev = codes_prev.shape[0]
    q = codes_probe.reshape(-1)
    key = jnp.concatenate([codes_prev, q])
    tag = jnp.arange(key.shape[0], dtype=jnp.int32)
    k_s, t_s = jax.lax.sort((key, tag), num_keys=2)
    is_prev = t_s < nprev
    rank = jnp.cumsum(is_prev.astype(jnp.int32)) - 1
    rank_c = jnp.clip(rank, 0, nprev - 1)
    hit_s = (
        (codes_prev[rank_c] == k_s) & (rank >= 0) & occ_prev[rank_c]
        & ~is_prev
    )
    _, hit2, idx2 = jax.lax.sort(
        (t_s, hit_s.astype(jnp.int32), rank_c), num_keys=1
    )
    return (
        hit2[nprev:].reshape(N, K).astype(bool),
        idx2[nprev:].reshape(N, K),
    )


def _probe_match(codes_probe, codes_prev, occ_prev, join):
    if join == "sort":
        return _probe_match_sort(codes_probe, codes_prev, occ_prev)
    return _probe_match_search(codes_probe, codes_prev, occ_prev)


def estimate_global_motion(codes_t, weights_t, codes_prev, weights_prev,
                           depth: int, join: str = None):
    """Derive the dominant integer translation between two frames.

    Both the encoder and the decoder hold both frames' positions
    (geometry travels out of band), so the motion vector is DERIVED, not
    transmitted: occupied-centroid delta, refined by picking the integer
    rounding (8 floor/ceil candidates per axis + zero) that maximizes
    voxel overlap. Only OCCUPIED current voxels vote — pad sentinels
    decode to in-range positions and would otherwise make the derived
    vector depend on the padded array size, which the stream does not
    record (the round-2 review's bucket-mismatch bug). Pure integer
    comparisons -> bitwise identical on both sides. Returns a (3,) int32
    shift such that frame t's content sits near ``previous + shift``."""
    return _estimate_global_motion_jit(
        codes_t, weights_t, codes_prev, weights_prev, depth,
        join or _join_impl(),
    )


@partial(jax.jit, static_argnames=("depth", "join"))
def _estimate_global_motion_jit(codes_t, weights_t, codes_prev,
                                weights_prev, depth, join):
    lim = jnp.int32(2**depth - 1)
    P_t = morton_decode(codes_t, depth)
    P_p = morton_decode(codes_prev, depth)
    occ_tf = (weights_t > 0).astype(jnp.float64)
    occ_pf = (weights_prev > 0).astype(jnp.float64)
    c_t = (P_t * occ_tf[:, None]).sum(0) / jnp.maximum(occ_tf.sum(), 1.0)
    c_p = (P_p * occ_pf[:, None]).sum(0) / jnp.maximum(occ_pf.sum(), 1.0)
    delta = c_t - c_p
    lo = jnp.floor(delta).astype(jnp.int32)
    corners = [jnp.zeros((3,), jnp.int32)] + [
        lo + jnp.asarray([bx, by, bz], jnp.int32)
        for bx in (0, 1) for by in (0, 1) for bz in (0, 1)
    ]
    cands = jnp.stack(corners)                              # (9, 3)
    cp = _probe_codes(P_t, -cands.astype(P_t.dtype), lim, depth,
                      codes_prev.dtype)
    hit, _ = _probe_match(cp, codes_prev, weights_prev > 0, join)
    counts = jnp.sum(hit & (weights_t > 0)[:, None], axis=0)
    # fixed candidate order + argmax's first-max rule = deterministic
    return cands[jnp.argmax(counts)]


def refine_block_motion(codes_t, weights_t, codes_prev, weights_prev,
                        depth: int, motion, block_side_log: int = 4,
                        probes: int = 27, min_hits: int = 8,
                        join: str = None):
    """Per-voxel integer motion refinement over octree blocks.

    Non-rigid content deforms locally beyond the global vector: this pass
    probes with the global ``motion``, averages each block's WINNING probe
    offsets (the local residual motion field, observable from geometry
    alone), rounds, and returns a per-voxel extra shift — one value per
    ``2^block_side_log``-voxel-side octree block (blocks are contiguous
    runs of the sorted codes: top code bits). Blocks with fewer than
    ``min_hits`` matched voxels keep the global vector (a noisy mean
    would hurt). Deterministic (fixed probe order, compensated segment
    sums, one rounding) -> decoder-replayable, zero signalling.
    """
    return _refine_block_motion_jit(
        codes_t, weights_t, codes_prev, weights_prev, depth, motion,
        block_side_log, probes, min_hits, join or _join_impl(),
    )


@partial(jax.jit, static_argnames=(
    "depth", "block_side_log", "probes", "min_hits", "join"))
def _refine_block_motion_jit(codes_t, weights_t, codes_prev, weights_prev,
                             depth, motion, block_side_log, probes,
                             min_hits, join):
    from raht3dgs_tpu.ops.segment import sorted_segment_sums

    offsets = {7: _FACE7, 27: _SHELL27}[probes]
    P0 = morton_decode(codes_t, depth)
    P = P0 - jnp.broadcast_to(
        jnp.asarray(motion, P0.dtype), P0.shape
    )
    lim = jnp.int32(2**depth - 1)

    cp = _probe_codes(P, offsets, lim, depth, codes_prev.dtype)
    hit, _ = _probe_match(cp, codes_prev, weights_prev > 0, join)
    found = jnp.any(hit, axis=1)
    # offsets are d2-ordered with fixed tie order, so the first hit IS
    # the nearest-probe winner
    win = jnp.argmax(hit, axis=1)
    woff = jnp.asarray(offsets, jnp.float64)[win] * found[:, None]
    valid = found & (weights_t > 0)

    # block = top code bits; sorted codes => contiguous runs
    shift = 3 * (depth - block_side_log) if depth > block_side_log else 0
    bid = (codes_t >> shift) if shift else jnp.zeros_like(codes_t)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), bid[1:] != bid[:-1]]
    )
    vals = jnp.concatenate(
        [
            woff * valid[:, None],
            valid[:, None].astype(jnp.float64),
        ],
        axis=1,
    )
    # FROZEN (v2 derived-motion replay): decode re-runs this arithmetic,
    # so the reduction must never change association. All lanes here are
    # integer-valued f64 (offsets/counts — exact under any association),
    # but the frozen path pins the round-1 method anyway.
    sums, _, _, _ = sorted_segment_sums(vals, first, method="prefix")
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    cnt = sums[seg, 3]
    mean = sums[seg, :3] / jnp.maximum(cnt, 1.0)[:, None]
    extra = jnp.where(
        (cnt >= min_hits)[:, None], jnp.round(mean), 0.0
    ).astype(jnp.int32)
    # the winning offsets point from the compensated position TOWARD the
    # prev content: content sits at P - motion + mean_off, so the refined
    # per-voxel motion is motion - mean_off
    return jnp.broadcast_to(
        jnp.asarray(motion, jnp.int32), extra.shape
    ) - extra


def search_block_motion(codes_t, attrs_t, weights_t, codes_prev,
                        attrs_prev, weights_prev, depth: int, motion,
                        block_side_log: int = 4, iters: int = 2,
                        min_hits: int = 8, join: str = None,
                        stride: int = 1):
    """Encoder-side per-block motion estimation against the TRUE residual.

    :func:`refine_block_motion` must be bitwise-replayable by the decoder,
    so its displacement witness is purely geometric — the d²-nearest hit
    probe — which saturates at ~zero once the surfaces overlap (a probe
    at offset 0 usually hits even when the *content* moved). This
    estimator instead lets the CURRENT frame's attributes pick each
    voxel's witness (the hit probe with the smallest attribute error —
    texture identifies the correspondence), then aggregates witnesses
    per octree block exactly like rev 1 (mean over the block, round,
    re-center) and ITERATES, reaching ±``iters`` voxels (Chebyshev)
    around the global vector. It needs frame t's attributes, so it runs
    on the encoder only and the resulting field is SIGNALLED in the
    stream (container v3), ~3 near-zero RLGR symbols per occupied block.

    Measured alternatives that lost (keep them dead): per-block argmax
    overlap and per-block argmin SSE — both collapse the block's
    fractional displacement distribution to whichever single integer
    shift wins a tally, where mean-then-round tracks it
    (docs/rd_temporal.md).

    The result is block-constant (pad slots share their block's vector
    and never vote — weight 0), so slicing row 0 of each occupied block
    recovers exactly the signalled field.

    ``stride`` > 1 votes with every stride-th row only (Morton order ==
    spatially stratified sampling): the 27-probe match and the 27
    attribute gathers — the search's E-sized cost — shrink by the
    stride while each block still aggregates tens of witnesses.
    Encoder-side free (the field is signalled); ``min_hits`` keeps its
    full-resolution meaning (sampled counts are scaled back up).

    Returns an (N, 3) int32 per-voxel motion field (content sits near
    ``position - motion`` in the previous frame).
    """
    return _search_block_motion_jit(
        codes_t, attrs_t, weights_t, codes_prev, attrs_prev, weights_prev,
        depth, motion, block_side_log, iters, min_hits,
        join or _join_impl(), stride,
    )


def _witness_offsets(P_rows, at_rows, occ_rows, mv_rows, codes_prev,
                     attrs_prev, occ_p, lim, depth, join):
    """Per-row displacement witness: among the HIT probes of the
    compensated positions, the one whose previous-frame attributes best
    match the row's — the attributes carry the correspondence (texture)
    that a purely geometric nearest-probe winner cannot see. (Block-level
    argmin/argmax criteria — max overlap, matched-mean SSE — were all
    measured worse: they collapse the block's fractional displacement
    distribution to whichever single integer shift wins a tally, where
    the mean-then-round aggregation tracks it; see docs/rd_temporal.md.)

    ONE definition for the exact and strided searches — stride must stay
    a pure sampling knob, never a different metric. Returns (woff (N,3)
    f64 zeroed on invalid rows, valid (N,) bool)."""
    P = P_rows - mv_rows
    cp = _probe_codes(P, _SHELL27, lim, depth, codes_prev.dtype)
    hit, idx = _probe_match(cp, codes_prev, occ_p, join)
    err_cols = []
    for k in range(len(_SHELL27)):
        pk = attrs_prev[idx[:, k]].astype(jnp.float64)
        e = jnp.sum((pk - at_rows) ** 2, axis=1)
        err_cols.append(jnp.where(hit[:, k], e, jnp.inf))
    err = jnp.stack(err_cols, axis=1)                    # (N, 27)
    win = jnp.argmin(err, axis=1)                        # first min
    valid = jnp.any(hit, axis=1) & occ_rows
    woff = jnp.asarray(_SHELL27, jnp.float64)[win] * valid[:, None]
    return woff, valid


@partial(jax.jit, static_argnames=(
    "depth", "block_side_log", "iters", "min_hits", "join", "stride"))
def _search_block_motion_jit(codes_t, attrs_t, weights_t, codes_prev,
                             attrs_prev, weights_prev, depth, motion,
                             block_side_log, iters, min_hits, join,
                             stride=1):
    from raht3dgs_tpu.ops.segment import sorted_segment_sums

    P0 = morton_decode(codes_t, depth)
    lim = jnp.int32(2**depth - 1)
    occ_t = weights_t > 0
    occ_p = weights_prev > 0
    offs_i = jnp.asarray(_SHELL27, jnp.int32)               # (27, 3)
    at = attrs_t.astype(jnp.float64)

    first = block_first(codes_t, depth, block_side_log)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1

    if stride > 1:
        return _search_strided(
            P0, at, occ_t, seg, codes_prev, attrs_prev, occ_p, depth,
            motion, lim, iters, min_hits, join, stride
        )

    mv = jnp.broadcast_to(jnp.asarray(motion, jnp.int32), P0.shape)
    for _ in range(iters):                                   # static unroll
        P = P0 - mv
        cp = _probe_codes(P, _SHELL27, lim, depth, codes_prev.dtype)
        hit, idx = _probe_match(cp, codes_prev, occ_p, join)
        # per-voxel displacement witness: among the HIT probes, the one
        # whose previous-frame attributes best match this voxel's — the
        # attributes carry the correspondence (texture) that a purely
        # geometric nearest-probe winner cannot see. (Block-level argmin/
        # argmax criteria — max overlap, matched-mean SSE — were all
        # measured worse: they collapse the block's fractional
        # displacement distribution to whichever integer shift wins a
        # tally, where the mean-then-round below tracks it; see
        # docs/rd_temporal.md.)
        err_cols = []
        for k in range(offs_i.shape[0]):
            pk = attrs_prev[idx[:, k]].astype(jnp.float64)
            e = jnp.sum((pk - at) ** 2, axis=1)
            err_cols.append(jnp.where(hit[:, k], e, jnp.inf))
        err = jnp.stack(err_cols, axis=1)                    # (N, 27)
        win = jnp.argmin(err, axis=1)                        # first min
        found = jnp.any(hit, axis=1)
        valid = found & occ_t
        woff = jnp.asarray(_SHELL27, jnp.float64)[win] * valid[:, None]
        vals = jnp.concatenate(
            [woff, valid[:, None].astype(jnp.float64)], axis=1
        )
        sums, _, _, _ = sorted_segment_sums(vals, first)
        cnt = sums[seg, 3]
        mean = sums[seg, :3] / jnp.maximum(cnt, 1.0)[:, None]
        extra = jnp.where(
            (cnt >= min_hits)[:, None], jnp.round(mean), 0.0
        ).astype(jnp.int32)
        # the winning offset points from the compensated position TOWARD
        # the prev content (content at P - mv + off) => mv' = mv - off
        mv = mv - extra
    return mv


def _search_strided(P0, at, occ_t, seg, codes_prev, attrs_prev, occ_p,
                    depth, motion, lim, iters, min_hits, join, stride):
    """Strided-witness variant of the block-motion search: probe matching
    and attribute-error witness selection run on every ``stride``-th row;
    block means aggregate the sampled witnesses and are mapped back to all
    rows with one searchsorted over the sampled blocks' ids (scatter-free,
    exact). Sampled hit counts scale by ``stride`` against ``min_hits``."""
    from raht3dgs_tpu.ops.segment import sorted_segment_sums

    sel = slice(0, None, stride)
    P0s = P0[sel]
    ats = at[sel]
    occ_ts = occ_t[sel]
    segs = seg[sel]
    Ns = P0s.shape[0]
    first_s = jnp.concatenate(
        [jnp.ones((1,), bool), segs[1:] != segs[:-1]]
    )
    sentinel = jnp.int32(np.iinfo(np.int32).max)

    mv = jnp.broadcast_to(jnp.asarray(motion, jnp.int32), P0.shape)
    for _ in range(iters):                                   # static unroll
        woff, valid = _witness_offsets(
            P0s, ats, occ_ts, mv[sel], codes_prev, attrs_prev, occ_p, lim,
            depth, join,
        )
        vals = jnp.concatenate(
            [woff, valid[:, None].astype(jnp.float64)], axis=1
        )
        # f64 accumulator carries the int32 block id exactly
        sums_s, blk_extra, _, n_seg_s = sorted_segment_sums(
            vals, first_s, extra_rows=segs[:, None].astype(jnp.float64)
        )
        blk = jnp.where(
            jnp.arange(Ns) < n_seg_s,
            blk_extra[:, 0].astype(jnp.int32), sentinel,
        )
        r = jnp.minimum(jnp.searchsorted(blk, seg), Ns - 1)
        present = blk[r] == seg
        cnt = jnp.where(present, sums_s[r, 3], 0.0)
        mean = sums_s[r, :3] / jnp.maximum(cnt, 1.0)[:, None]
        extra = jnp.where(
            ((cnt * stride >= min_hits) & present)[:, None],
            jnp.round(mean), 0.0,
        ).astype(jnp.int32)
        mv = mv - extra
    return mv


def block_first(codes, depth: int, block_side_log: int = 4):
    """(N,) bool marking the first row of each octree block (top-code-bit
    run) of the sorted ``codes``. The SAME rule on encoder and decoder
    maps signalled per-block motion symbols to voxels: blocks are defined
    by code bits, not array layout, so the mapping is bucket-size
    independent."""
    import numpy as np

    xp = jnp if isinstance(codes, jax.Array) else np
    if depth > block_side_log:
        # cast the shift to the code dtype: uint64 >> int32 silently
        # promotes to float64 in numpy (CLAUDE.md invariant)
        bid = codes >> codes.dtype.type(3 * (depth - block_side_log))
    else:
        bid = xp.zeros_like(codes)
    return xp.concatenate(
        [xp.ones((1,), bool), bid[1:] != bid[:-1]]
    )


def predict_from_previous(codes_t, codes_prev, attrs_prev, weights_prev,
                          depth: int, probes: int = 7, motion=None,
                          join: str = None):
    """Per-voxel attribute prediction from the previous frame.

    Args:
        codes_t: (N,) current frame's padded sorted Morton codes.
        codes_prev: (Np,) previous frame's padded sorted codes (pad
            sentinels sort last, as ``prepare_voxel_frame`` builds them).
        attrs_prev: (Np, D) previous frame's RECONSTRUCTED attributes
            (zeros in pad slots).
        weights_prev: (Np,) previous weights (0 marks padding).
        probes: 7 (self + face neighbors) or 27 (full 3x3x3 shell).
        motion: optional (3,) int32 dominant translation
            (:func:`estimate_global_motion`) — probes search around
            ``position - motion`` so few-voxel-wavelength detail stays
            correlated under motion.

    Returns:
        (pred (N, D), found (N,) bool) — ``pred`` is the nearest occupied
        probe's attributes (zeros where no probe hit); ``found`` marks
        voxels with any hit. Pad slots of the current frame may carry
        arbitrary values — mask with the current weights before use.
    """
    return _predict_from_previous_jit(
        codes_t, codes_prev, attrs_prev, weights_prev, depth, probes,
        motion, join or _join_impl(),
    )


@partial(jax.jit, static_argnames=("depth", "probes", "join"))
def _predict_from_previous_jit(codes_t, codes_prev, attrs_prev,
                               weights_prev, depth, probes, motion, join):
    offsets = {7: _FACE7, 27: _SHELL27}[probes]
    P = morton_decode(codes_t, depth)                       # (N, 3) int32
    if motion is not None:
        P = P - motion.astype(P.dtype)
    lim = jnp.int32(2**depth - 1)

    cp = _probe_codes(P, offsets, lim, depth, codes_prev.dtype)
    hit, idx = _probe_match(cp, codes_prev, weights_prev > 0, join)
    found = jnp.any(hit, axis=1)
    # offsets are d2-ordered with fixed tie order: first hit = nearest
    win = jnp.argmax(hit, axis=1)
    win_idx = jnp.take_along_axis(idx, win[:, None], axis=1)[:, 0]
    pred = attrs_prev[win_idx] * found[:, None].astype(attrs_prev.dtype)
    return pred, found
