"""Rate-targeted encoding: find the quantization step hitting a bpp budget.

Not present in the reference (its drivers sweep a fixed step grid and the
user picks a point afterwards). Strategy: evaluate the on-device rate model
(``ops/rate_model.py``) over a log-spaced step grid in ONE vmapped device
call (sequential bisection would pay per-probe dispatch latency ~19 times;
the grid is embarrassingly parallel and the model is monotone in step),
then verify/refine with at most a couple of true encodes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.models.pipeline import AttributeCodec, EncodedFrame, VoxelFrame
from raht3dgs_tpu.ops.quantize import quantize
from raht3dgs_tpu.ops.rate_model import estimate_bpp


@jax.jit
def _estimate_bpp_grid(coeffs, steps_grid, valid, n_voxels):
    """Rate estimates for a whole (S, D') grid of candidate steps at once."""
    return jax.vmap(
        lambda st: estimate_bpp(quantize(coeffs, st), n_voxels, valid=valid)
    )(steps_grid)


@dataclass
class RateSearchResult:
    step: float
    bpp: float
    target_bpp: float
    encoded: EncodedFrame
    probes: int


# The surrogate over-estimates the adaptive coder by a stable factor
# (~1.6x measured on RAHT coefficient statistics across steps); calibrating
# the bisection target gets the first true encode close to budget.
MODEL_CALIBRATION = 1.6


def search_step_for_bpp(
    frame: VoxelFrame,
    target_bpp: float,
    codec: Optional[AttributeCodec] = None,
    lo: float = 0.25,
    hi: float = 4096.0,
    grid_size: int = 64,
    refine: int = 4,
    steps_fn=None,
) -> RateSearchResult:
    """Find the largest-quality (smallest) step with rate <= target_bpp.

    One vmapped device call estimates the rate at ``grid_size`` log-spaced
    candidate steps; the finest qualifying step seeds up to ``refine`` true
    encodes that correct the model's residual bias against the actual RLGR
    size. ``steps_fn(step) -> scalar or (D,) vector`` maps the searched
    scalar to per-channel steps (e.g. the 3DGS per-attribute multipliers);
    identity by default.
    """
    if not np.isfinite(target_bpp) or target_bpp <= 0:
        raise ValueError(f"target_bpp must be positive, got {target_bpp}")
    codec = codec or AttributeCodec(frame.depth)
    if steps_fn is None:
        steps_fn = lambda s: s  # noqa: E731
    coeffs, order, _, _ = codec.transform(frame)
    valid = jnp.arange(frame.codes.shape[0]) < frame.n_voxels
    nvox = frame.n_voxels

    est_target = target_bpp * MODEL_CALIBRATION

    grid = np.geomspace(lo, hi, grid_size)
    steps_mat = np.stack(
        [np.atleast_1d(np.asarray(steps_fn(s), dtype=np.float64)) for s in grid]
    )
    ests = np.asarray(_estimate_bpp_grid(
        coeffs, jnp.asarray(steps_mat, dtype=coeffs.dtype), valid, nvox
    ))
    probes = 1
    fits = ests <= est_target
    # estimates decrease with step: the first qualifying grid point is the
    # finest (highest-quality) step within budget
    step = float(grid[int(np.argmax(fits))]) if fits.any() else hi

    # refine against true encodes
    enc = codec.encode(frame, steps=steps_fn(step), coeffs=coeffs, order=order)
    for _ in range(refine):
        actual = enc.stream.bpp()
        if target_bpp * 0.9 <= actual <= target_bpp:
            break
        ratio = actual / target_bpp
        if ratio <= 1.0 and step <= lo:
            break
        new_step = float(np.clip(step * ratio**1.4, lo, hi))
        if new_step == step:
            break  # pinned at a bound: re-encoding is byte-identical
        step = new_step
        enc = codec.encode(frame, steps=steps_fn(step), coeffs=coeffs, order=order)
    # guarantee the budget if possible
    while enc.stream.bpp() > target_bpp and step < hi:
        step = float(min(step * 1.3, hi))
        enc = codec.encode(frame, steps=steps_fn(step), coeffs=coeffs, order=order)
    return RateSearchResult(
        step=float(step),
        bpp=enc.stream.bpp(),
        target_bpp=target_bpp,
        encoded=enc,
        probes=probes,
    )
