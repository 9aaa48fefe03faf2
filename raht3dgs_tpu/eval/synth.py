"""Synthetic evaluation workloads with realistic attribute statistics.

White-noise attributes make RAHT spectra flat: every moderate
quantization step lands in the all-zeros regime and RD comparisons
degenerate (the round-1 verdict's Missing #4). Real scans and trained
3DGS scenes have spatially smooth fields, so these generators build
band-limited (1/f^beta) random fields over the voxel cube at the
reference's attribute scales (unit quats, linear scales ~ exp(log-space),
sigmoid opacity, SH ~ N(0, 0.3) — reference
``python/test_voxelize_3dgs.py:58-114``).
"""

from __future__ import annotations

import numpy as np


def _unique_morton_voxels(rng, n, depth):
    import jax.numpy as jnp

    from raht3dgs_tpu.ops.morton import morton_decode
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    pts = rng.integers(0, 2**depth, size=(2 * n, 3))
    codes = np.unique(morton_codes_np(pts, depth))[:n]
    V = np.asarray(morton_decode(jnp.asarray(codes), depth),
                   dtype=np.float64)
    return V


def smooth_field_fn(rng, V, depth):
    """Returns ``field(d, octaves=7, waves=4, beta=1.0)`` sampling fractal
    (1/f^beta) random fields at the voxel positions ``V``, unit variance
    per column. The multi-octave spectrum makes RAHT coefficient
    magnitudes decay gradually, so a quantization sweep removes a
    different shell of coefficients at every step — a realistic RD spread
    instead of white noise's all-zeros cliff."""
    n = len(V)

    def smooth_field(d, octaves=7, waves=4, beta=1.0):
        out = np.zeros((n, d))
        for o in range(octaves):
            f = rng.uniform(0.5, 1.0, size=(3, waves)) * (2.0**o)
            f *= rng.choice([-1, 1], size=(3, waves)) / (2**depth)
            phase = rng.uniform(0, 2 * np.pi, size=waves)
            basis = np.cos(2 * np.pi * (V @ f) + phase)        # (n, waves)
            mix = rng.normal(size=(waves, d)) * 2.0 ** (-beta * o)
            out += basis @ mix
        return out / out.std(axis=0, keepdims=True)

    return smooth_field


def synthetic_gs_frame(n=20000, depth=10, seed=0):
    """Morton-ordered voxelized 3DGS frame: (V int positions (n,3),
    attrs (n,56) = [quats(4), scales(3), opacity(1), SH(48)]).

    EXACT rng call order matters: ``scripts/rd_parity_3dgs.py`` pins its
    published parity table to this generator."""
    rng = np.random.default_rng(seed)
    V = _unique_morton_voxels(rng, n, depth)
    n = len(V)
    smooth_field = smooth_field_fn(rng, V, depth)

    quats = smooth_field(4) + 0.05 * rng.normal(size=(n, 4))
    quats[:, 0] += 2.0  # bias toward identity, as trained scenes are
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = np.exp(np.log(0.01) + 0.5 * smooth_field(3)
                    + 0.05 * rng.normal(size=(n, 3)))
    opacity = 1.0 / (1.0 + np.exp(-(1.0 + smooth_field(1))))
    sh_dc = 0.5 + 0.3 * smooth_field(3) + 0.03 * rng.normal(size=(n, 3))
    sh_rest = 0.15 * smooth_field(45) + 0.02 * rng.normal(size=(n, 45))
    attrs = np.concatenate([quats, scales, opacity, sh_dc, sh_rest], axis=1)
    return V, attrs


def synthetic_color_frame(n=20000, depth=10, seed=0):
    """Morton-ordered voxel cloud with smooth [0, 255] RGB colors —
    the encode_ply workload shape."""
    rng = np.random.default_rng(seed)
    V = _unique_morton_voxels(rng, n, depth)
    smooth_field = smooth_field_fn(rng, V, depth)
    rgb = 128.0 + 48.0 * smooth_field(3) + 4.0 * rng.normal(
        size=(len(V), 3)
    )
    return V, np.clip(rgb, 0.0, 255.0)
