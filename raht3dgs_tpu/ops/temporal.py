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


def _hit_count(P, occ_t, codes_prev, occ_prev, shift, lim, depth):
    """How many occupied current voxels land on an occupied previous
    voxel when displaced by ``-shift``. ``occ_t`` masks the current
    frame's pad slots: their sentinel codes decode to in-range positions
    and would otherwise vote in the motion argmax, making the derived
    vector depend on the padded array size — which the stream does not
    record (the round-2 review's bucket-mismatch bug)."""
    Q = jnp.clip(P - shift, 0, lim)
    c = morton_encode(Q, depth).astype(codes_prev.dtype)
    idx = jnp.clip(
        jnp.searchsorted(codes_prev, c), 0, codes_prev.shape[0] - 1
    )
    return jnp.sum((codes_prev[idx] == c) & occ_prev[idx] & occ_t)


@partial(jax.jit, static_argnames=("depth",))
def estimate_global_motion(codes_t, weights_t, codes_prev, weights_prev,
                           depth: int):
    """Derive the dominant integer translation between two frames.

    Both the encoder and the decoder hold both frames' positions
    (geometry travels out of band), so the motion vector is DERIVED, not
    transmitted: occupied-centroid delta, refined by picking the integer
    rounding (8 floor/ceil candidates per axis + zero) that maximizes
    voxel overlap. Pure integer comparisons -> bitwise identical on both
    sides. Returns a (3,) int32 shift such that frame t's content sits
    near ``previous + shift``."""
    lim = jnp.int32(2**depth - 1)
    P_t = morton_decode(codes_t, depth)
    P_p = morton_decode(codes_prev, depth)
    occ_t = (weights_t > 0).astype(jnp.float64)
    occ_p = (weights_prev > 0).astype(jnp.float64)
    c_t = (P_t * occ_t[:, None]).sum(0) / jnp.maximum(occ_t.sum(), 1.0)
    c_p = (P_p * occ_p[:, None]).sum(0) / jnp.maximum(occ_p.sum(), 1.0)
    delta = c_t - c_p
    lo = jnp.floor(delta).astype(jnp.int32)
    occ_prev = weights_prev > 0
    cands = [jnp.zeros((3,), jnp.int32)]
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                cands.append(lo + jnp.asarray([bx, by, bz], jnp.int32))
    counts = jnp.stack([
        _hit_count(P_t, weights_t > 0, codes_prev, occ_prev,
                   s.astype(P_t.dtype), lim, depth)
        for s in cands
    ])
    # fixed candidate order + argmax's first-max rule = deterministic
    return jnp.stack(cands)[jnp.argmax(counts)]


@partial(jax.jit, static_argnames=("depth", "block_side_log", "probes"))
def refine_block_motion(codes_t, weights_t, codes_prev, weights_prev,
                        depth: int, motion, block_side_log: int = 4,
                        probes: int = 27, min_hits: int = 8):
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
    from raht3dgs_tpu.ops.segment import sorted_segment_sums

    offsets = {7: _FACE7, 27: _SHELL27}[probes]
    P0 = morton_decode(codes_t, depth)
    P = P0 - jnp.broadcast_to(
        jnp.asarray(motion, P0.dtype), P0.shape
    )
    lim = jnp.int32(2**depth - 1)
    nprev = codes_prev.shape[0]
    occ_prev = weights_prev > 0

    best = jnp.full(codes_t.shape[0], jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)
    woff = jnp.zeros((codes_t.shape[0], 3), dtype=jnp.float64)
    found = jnp.zeros(codes_t.shape[0], dtype=bool)
    for off in offsets:
        d2 = jnp.int32(off[0] ** 2 + off[1] ** 2 + off[2] ** 2)
        Q = jnp.clip(P + jnp.asarray(off, dtype=P.dtype), 0, lim)
        c = morton_encode(Q, depth).astype(codes_prev.dtype)
        idx = jnp.clip(
            jnp.searchsorted(codes_prev, c), 0, nprev - 1
        ).astype(jnp.int32)
        hit = (codes_prev[idx] == c) & occ_prev[idx]
        take = hit & (d2 < best)
        woff = jnp.where(
            take[:, None], jnp.asarray(off, jnp.float64)[None, :], woff
        )
        best = jnp.where(take, d2, best)
        found |= hit
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
    sums, _, _, _ = sorted_segment_sums(vals, first)
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


@partial(jax.jit, static_argnames=("depth", "probes"))
def predict_from_previous(codes_t, codes_prev, attrs_prev, weights_prev,
                          depth: int, probes: int = 7, motion=None):
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
    offsets = {7: _FACE7, 27: _SHELL27}[probes]
    P = morton_decode(codes_t, depth)                       # (N, 3) int32
    if motion is not None:
        P = P - motion.astype(P.dtype)
    lim = jnp.int32(2**depth - 1)
    nprev = codes_prev.shape[0]

    pred = jnp.zeros((codes_t.shape[0], attrs_prev.shape[1]),
                     dtype=attrs_prev.dtype)
    found = jnp.zeros(codes_t.shape[0], dtype=bool)
    best = jnp.full(codes_t.shape[0], jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)
    occ_prev = weights_prev > 0
    for off in offsets:                                     # static unroll
        d2 = jnp.int32(off[0] ** 2 + off[1] ** 2 + off[2] ** 2)
        Q = jnp.clip(P + jnp.asarray(off, dtype=P.dtype), 0, lim)
        c = morton_encode(Q, depth).astype(codes_prev.dtype)
        idx = jnp.clip(
            jnp.searchsorted(codes_prev, c), 0, nprev - 1
        ).astype(jnp.int32)
        hit = (codes_prev[idx] == c) & occ_prev[idx]
        take = hit & (d2 < best)
        pred = jnp.where(take[:, None], attrs_prev[idx], pred)
        best = jnp.where(take, d2, best)
        found |= hit
    return pred, found
