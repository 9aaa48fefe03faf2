"""Uniform and per-attribute-group scalar quantization.

The reference quantizes with round-half-up ``floor(x/step + 0.5)``
(``/root/reference/python/encode_ply.py:148``) and, for 3DGS payloads,
supports per-attribute-group steps derived from an importance-weighted level
budget (``/root/reference/python/encode_3dgs_debug.py:328-371``). Here both
are expressed through one primitive: a per-channel step vector.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# 3DGS 56-channel attribute layout (reference encode_3dgs_debug.py:328-333):
# [quats(4), scales(3), opacity(1), colors(48)].
GS_ATTRIBUTE_GROUPS: Dict[str, Tuple[int, int]] = {
    "quats": (0, 4),
    "scales": (4, 7),
    "opacity": (7, 8),
    "colors": (8, 56),
}


def gs_attribute_groups(n_channels: int) -> Dict[str, Tuple[int, int]]:
    """Attribute groups for an ``n_channels``-wide payload.

    The reference derives ``colors = (8, n_channels)`` and skips groups
    that start past the payload (``encode_3dgs_debug.py:328-333``); the
    fixed 56-channel table above is the common case."""
    out: Dict[str, Tuple[int, int]] = {}
    for name, (lo, hi) in GS_ATTRIBUTE_GROUPS.items():
        if lo >= n_channels:
            continue
        out[name] = (lo, n_channels if name == "colors" else min(hi, n_channels))
    return out

# Rendering-PSNR ablation results used as importance weights (reference
# encode_3dgs_debug.py:338-343): lower PSNR when reconstructed alone => the
# attribute matters more => finer quantization.
GS_ABLATION_PSNR_DB: Dict[str, float] = {
    "quats": 21.93,
    "scales": 26.36,
    "opacity": 42.22,
    "colors": 38.67,
}


def quantize(x: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Round-half-up uniform quantization. ``step`` is scalar or ``(D,)``."""
    return jnp.floor(x / step + 0.5).astype(jnp.int32)


def dequantize(q: jnp.ndarray, step: jnp.ndarray, dtype=jnp.float64) -> jnp.ndarray:
    return q.astype(dtype) * step


def quantize_deadzone(
    x: jnp.ndarray, step: jnp.ndarray, f: jnp.ndarray
) -> jnp.ndarray:
    """Sign-symmetric dead-zone uniform quantization (opt-in RD improver).

    ``q = sign(x) * floor(|x|/step + f)`` with rounding offset ``f`` in
    (0, 0.5]: the zero bin widens to ``2*(1-f)*step`` and every other bin
    shifts outward, trading a little distortion for fewer coded nonzeros —
    the classic Laplacian-source win over the reference's mid-tread
    ``floor(x/step + 0.5)`` (``/root/reference/python/encode_ply.py:148``).
    ``f = 0.5`` recovers mid-tread bins (up to sign symmetry at exact
    negative midpoints, which is why parity mode keeps :func:`quantize`).
    """
    return (
        jnp.sign(x) * jnp.floor(jnp.abs(x) / step + f)
    ).astype(jnp.int32)


def dequantize_biased(
    q: jnp.ndarray, step: jnp.ndarray, delta: jnp.ndarray,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """Reconstruct at ``sign(q) * (|q| + delta) * step``.

    ``delta`` places nonzero reconstructions inside their (shifted)
    dead-zone bins: the bin midpoint sits at ``0.5 - f``, the Laplacian
    centroid slightly below it. ``delta = 0`` is the plain inverse."""
    qf = q.astype(dtype)
    return jnp.sign(qf) * (jnp.abs(qf) + delta) * step


def channel_steps(
    n_channels: int,
    base_step: float,
    group_steps: Mapping[str, float] | None = None,
    groups: Mapping[str, Tuple[int, int]] = GS_ATTRIBUTE_GROUPS,
) -> np.ndarray:
    """Build a ``(D,)`` per-channel step vector from per-group overrides."""
    steps = np.full((n_channels,), float(base_step), dtype=np.float64)
    if group_steps:
        for name, s in group_steps.items():
            lo, hi = groups[name]
            steps[lo:hi] = float(s)
    return steps


def importance_allocated_steps(
    n_channels: int,
    level_budget: float = 1024.0,
    ablation_psnr: Mapping[str, float] = GS_ABLATION_PSNR_DB,
    groups: Mapping[str, Tuple[int, int]] = GS_ATTRIBUTE_GROUPS,
    coeff_ranges: Mapping[str, float] | None = None,
) -> np.ndarray:
    """Distribute a total quantization-level budget across attribute groups.

    Follows the reference's importance-weighted allocation EXACTLY
    (``encode_3dgs_debug.py:338-371``): importance ∝ 1/ablation-PSNR,
    ``levels = int(budget * importance / total)`` (integer truncation),
    per-group ``step = range / max(levels - 1, 1)``. The same formula as
    ``models/gs_quant_analysis.strategy_importance_weighted`` (tested to
    agree). ``coeff_ranges`` maps group name -> coefficient dynamic range
    (defaults to 1.0, i.e. the returned steps are relative and can be
    rescaled by the caller).
    """
    importance = {k: 1.0 / ablation_psnr[k] for k in groups}
    total = sum(importance.values())
    steps: Dict[str, float] = {}
    for name in groups:
        levels = max(int(level_budget * importance[name] / total), 2)
        rng = 1.0 if coeff_ranges is None else float(coeff_ranges[name])
        steps[name] = max(rng / max(levels - 1, 1), 1e-6)
    return channel_steps(n_channels, 1.0, steps, groups)
