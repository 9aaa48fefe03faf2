"""Segment reductions over *sorted* data without scatters.

``jax.ops.segment_sum`` lowers to scatter-add — measured ~250x slower than
elementwise on TPU v5e (tiles are row-granular and colliding). But the
codec's segments are always runs of a *sorted* array (points sorted by
Morton code), which admits a scatter-free evaluation:

- segment starts are flagged by ``first`` (boundary mask);
- ``argsort(~first)`` compacts the boundary row indices to the front in
  ascending order (stable sort of a boolean key — cheap on TPU);
- per-segment sums are either segmented shifted-adds (the "shift"
  default: log2(max run) masked add passes + ONE boundary gather — no
  prefix cancellation, so no compensated lanes) or differences of
  compensated/f64 prefix sums gathered at consecutive boundaries (the
  "prefix" method, pinned by frozen-replay callers). See
  :func:`sorted_segment_sums`.

Results are padded to N slots (segment k in slot k, zeros after), matching
the padded-voxel convention used across the framework.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _ds_cumsum_blocked(values_f32, block: int = 256):
    """Compensated (double-single) prefix sums — the blocked scan shared
    with the span transform (``raht_span._ds_cumsum``, measured ~10x the
    flat custom-combiner scan at 500k x 4 f32 on v5e; full voxelize
    17.6 -> 11.0 ms with this plus the shifted end-gather below,
    scripts/exp_vox_pieces.py). Integer-valued lanes (counts/weights)
    stay exact under any association while partials are < 2**24."""
    from raht3dgs_tpu.ops.raht_span import _ds_cumsum

    return _ds_cumsum(values_f32, block=block)


def segment_starts(first: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row index of each segment's first element, compacted to the front.

    Returns (starts (N,) int32 — valid for slots < n_segments, N afterwards;
    n_segments () int32)."""
    N = first.shape[0]
    n_seg = jnp.sum(first.astype(jnp.int32))
    starts = jnp.argsort(~first, stable=True).astype(jnp.int32)
    slot = jnp.arange(N, dtype=jnp.int32)
    return jnp.where(slot < n_seg, starts, jnp.int32(N)), n_seg


_SEGSUM_DEFAULT = os.environ.get("RAHT3DGS_SEGSUM", "shift")


def sorted_segment_sums(
    values: jnp.ndarray,
    first: jnp.ndarray,
    extra_rows: Optional[jnp.ndarray] = None,
    method: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-segment sums of run-partitioned ``values`` (N, K), scatter-free.

    ``first[i]`` marks the start of a new segment (first[0] must be True).
    ``extra_rows`` (N, E), if given, is sampled at each segment's first row
    (e.g. the segment's sort key) through the same gather.

    ``method`` selects the reduction:

    - ``"shift"`` (default, ``RAHT3DGS_SEGSUM`` overrides): segmented
      Hillis-Steele doubling — ``log2(max run length)`` masked shifted-add
      passes, then one (N, K) gather at segment starts. No prefix
      cancellation exists, so float32 needs NO compensated lanes and the
      boundary gather is HALF the prefix path's width; the stride loop is
      a ``lax.while_loop`` bounded by the measured max run length (~1-4
      iterations for typical voxel multiplicities). Measured 22 -> ~9 ms
      at (524k, 60) f32 on v5e (scripts/exp_gsvox_pieces.py).
    - ``"prefix"``: compensated prefix-sum differences (the round-1 path).
      Callers with a FROZEN numeric contract pin this explicitly: the
      temporal v2 derived-motion pipeline replays encoder-side arithmetic
      at decode time, so its segment sums must never change association
      (ops/temporal.py; CLAUDE.md "v2 inter streams DERIVE motion").

    Integer-valued lanes are exact under either method while partials are
    < 2**24; float lanes differ in low bits between the two (both are
    deterministic, so any encoder==decoder replay contract holds within
    one method).

    Returns (sums (N, K) — segment k in slot k, zeros in empty slots;
    firsts_extra (N, E) or None; starts (N,); n_segments ()).
    """
    if method is None:
        method = _SEGSUM_DEFAULT
    if method == "shift":
        return _sorted_segment_sums_shift(values, first, extra_rows)
    N, K = values.shape
    starts, n_seg = segment_starts(first)
    # float32 inputs use double-single compensated prefixes (float64 is
    # software-emulated on TPU); see ops/raht_span.py for the machinery.
    use_ds = values.dtype == jnp.float32
    if use_ds:
        from raht3dgs_tpu.ops.raht_span import _two_sum

        hi, lo = _ds_cumsum_blocked(values)
        prefix = jnp.concatenate(
            [jnp.zeros((1, 2 * K), jnp.float32),
             jnp.concatenate([hi, lo], axis=1)]
        )  # (N+1, 2K)
        acc_dt = jnp.float32
        pk = 2 * K
    else:
        prefix = jnp.concatenate(
            [
                jnp.zeros((1, K), jnp.float64),
                jnp.cumsum(values.astype(jnp.float64), axis=0),
            ]
        )  # (N+1, K): row i = sum over [:i)
        acc_dt = jnp.float64
        pk = K
    # extras ride the boundary gather ONLY when the accumulator dtype holds
    # them exactly (f32 carries 24 mantissa bits: values < 2^24). Wider
    # extras (e.g. float64 cluster ids beyond 16.7M) take a separate exact
    # gather instead of being silently rounded into neighboring segments.
    fuse_extras = extra_rows is not None and (
        not use_ds or extra_rows.dtype == np.float32
        or extra_rows.dtype == jnp.float32
    )
    if fuse_extras:
        E = extra_rows.shape[1]
        pad = jnp.zeros((1, E), extra_rows.dtype)
        pack = jnp.concatenate(
            [prefix, jnp.concatenate([extra_rows, pad]).astype(acc_dt)],
            axis=1,
        )
    else:
        pack = prefix

    starts_c = jnp.minimum(starts, N)
    g_start = pack[starts_c]
    # Segment k ends where segment k+1 starts (ends[k] = starts_c[k+1],
    # with prefix[N] for the last slot) — so the end-prefix rows are the
    # start-gather's rows shifted up one slot. One (N, pk) row gather
    # instead of two; bitwise-identical values (same rows gathered).
    g_end = jnp.concatenate([g_start[1:, :pk], prefix[-1:]], axis=0)
    if extra_rows is not None and not fuse_extras:
        extra_pad = jnp.concatenate(
            [extra_rows, jnp.zeros((1, extra_rows.shape[1]), extra_rows.dtype)]
        )
        extra_exact = extra_pad[starts_c]

    valid = (jnp.arange(N, dtype=jnp.int32) < n_seg)[:, None]
    if use_ds:
        sm, er = _two_sum(g_end[:, :K], -g_start[:, :K])
        er = er + (g_end[:, K : 2 * K] - g_start[:, K : 2 * K])
        sums = jnp.where(valid, sm + er, 0.0)
    else:
        sums = jnp.where(valid, g_end - g_start[:, :K], 0.0)
    if extra_rows is None:
        extra = None
    elif fuse_extras:
        extra = g_start[:, pk:]
    else:
        extra = extra_exact
    return sums, extra, starts, n_seg


def _sorted_segment_sums_shift(
    values: jnp.ndarray,
    first: jnp.ndarray,
    extra_rows: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Segmented Hillis-Steele suffix doubling (see sorted_segment_sums).

    Invariant after step with stride ``s``: ``x[i]`` holds the sum of
    ``values[i : i+s) ∩ segment(i)`` — so once ``s >= max run length``,
    every segment's FIRST row holds its full sum. Strides double; the
    loop-carried buffer is (2N, K) with a permanently-zero tail so the
    dynamic-stride shift is a static-size ``lax.dynamic_slice``.
    """
    from jax import lax

    N, K = values.shape
    starts, n_seg = segment_starts(first)
    starts_c = jnp.minimum(starts, N)
    ends = jnp.concatenate([starts_c[1:], jnp.full((1,), N, jnp.int32)])
    max_run = jnp.max(ends - starts_c)  # invalid slots give N - N = 0

    seg = jnp.cumsum(first.astype(jnp.int32))
    seg_pad = jnp.concatenate([seg, jnp.full((N,), -1, jnp.int32)])
    x_pad = jnp.concatenate([values, jnp.zeros((N, K), values.dtype)])

    def cond(state):
        stride, _ = state
        return stride < max_run

    def body(state):
        stride, x_pad = state
        shifted = lax.dynamic_slice(x_pad, (stride, jnp.int32(0)), (N, K))
        seg_sh = lax.dynamic_slice(seg_pad, (stride,), (N,))
        add = jnp.where((seg_sh == seg)[:, None], shifted, 0)
        new_x = x_pad[:N] + add
        return stride * 2, lax.dynamic_update_slice(x_pad, new_x, (0, 0))

    _, x_pad = lax.while_loop(cond, body, (jnp.int32(1), x_pad))

    # one boundary gather; extras ride it when they fit the value dtype
    # exactly (same contract as the prefix path)
    fuse_extras = extra_rows is not None and (
        extra_rows.dtype == values.dtype
        or (values.dtype == jnp.float32
            and extra_rows.dtype in (np.float32, jnp.float32))
    )
    if fuse_extras:
        E = extra_rows.shape[1]
        pack = jnp.concatenate(
            [x_pad[: N + 1],
             jnp.concatenate(
                 [extra_rows.astype(values.dtype),
                  jnp.zeros((1, E), values.dtype)])],
            axis=1,
        )
    else:
        pack = x_pad[: N + 1]
    g = pack[starts_c]
    valid = (jnp.arange(N, dtype=jnp.int32) < n_seg)[:, None]
    sums = jnp.where(valid, g[:, :K], 0)
    if extra_rows is None:
        extra = None
    elif fuse_extras:
        extra = g[:, K:]
    else:
        extra_pad = jnp.concatenate(
            [extra_rows,
             jnp.zeros((1, extra_rows.shape[1]), extra_rows.dtype)]
        )
        extra = extra_pad[starts_c]
    return sums, extra, starts, n_seg
