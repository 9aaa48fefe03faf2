"""Quality metrics for reconstructed attributes and renders.

Counterpart of the reference's ``compute_attribute_metrics`` / PSNR helpers
(``/root/reference/python/quality_eval.py:120-191,356-370`` and the
per-attribute-group PSNR of ``encode_3dgs.py:297-310``), in numpy over the
framework's packed layouts.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from raht3dgs_tpu.ops.quantize import GS_ATTRIBUTE_GROUPS, gs_attribute_groups


def compute_attribute_metrics(
    original: Dict[str, np.ndarray],
    merged: Dict[str, np.ndarray],
    cluster_labels: np.ndarray,
) -> Dict[str, float]:
    """Per-attribute error between original Gaussians and their cluster
    representatives (broadcast back through ``cluster_labels``).

    Metrics match the reference: position/opacity/color MSE+RMSE, quaternion
    geodesic distance ``1 - <q1,q2>^2``, scale error in log space.
    """
    lab = np.asarray(cluster_labels)
    rec = {k: np.asarray(merged[k])[lab] for k in merged}

    out: Dict[str, float] = {}
    pos_mse = float(np.mean((original["means"] - rec["means"]) ** 2))
    out["position_mse"] = pos_mse
    out["position_rmse"] = float(np.sqrt(pos_mse))

    dot = np.abs(np.sum(original["quats"] * rec["quats"], axis=1))
    qd = 1.0 - dot**2
    out["quaternion_mean_dist"] = float(np.mean(qd))
    out["quaternion_max_dist"] = float(np.max(qd))

    slog = np.log(np.asarray(original["scales"]) + 1e-8)
    slog_r = np.log(np.asarray(rec["scales"]) + 1e-8)
    s_mse = float(np.mean((slog - slog_r) ** 2))
    out["scale_log_mse"] = s_mse
    out["scale_log_rmse"] = float(np.sqrt(s_mse))

    o_mse = float(np.mean((original["opacities"] - rec["opacities"]) ** 2))
    out["opacity_mse"] = o_mse
    out["opacity_rmse"] = float(np.sqrt(o_mse))

    c_mse = float(np.mean((original["colors"] - rec["colors"]) ** 2))
    out["color_mse"] = c_mse
    out["color_rmse"] = float(np.sqrt(c_mse))
    return out


def gs_group_psnr(
    original: np.ndarray,
    reconstructed: np.ndarray,
    groups: Optional[Mapping[str, Tuple[int, int]]] = None,
) -> Dict[str, float]:
    """Overall + per-group PSNR over a packed (N, D) attribute matrix.

    PSNR definition matches the reference exactly:
    ``-10 * log10(mse + 1e-10)`` (``encode_3dgs.py:297-310``). Groups
    default to the reference layout adapted to the payload width
    (colors = (8, D); groups past D are skipped) so non-56-channel
    payloads neither drop channels nor average empty slices.
    """
    if groups is None:
        groups = gs_attribute_groups(original.shape[1])
    out: Dict[str, float] = {}

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return -10.0 * np.log10(mse + 1e-10), mse

    p, m = psnr(original, reconstructed)
    out["psnr_all"] = p
    out["mse_all"] = m
    for name, (lo, hi) in groups.items():
        p, m = psnr(original[:, lo:hi], reconstructed[:, lo:hi])
        out[f"psnr_{name}"] = p
        out[f"mse_{name}"] = m
    return out


def image_psnr(img1: np.ndarray, img2: np.ndarray, peak: float = 1.0) -> float:
    """PSNR between renders in [0, peak] (``quality_eval.py:356-370``)."""
    mse = float(np.mean((np.asarray(img1) - np.asarray(img2)) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(peak / np.sqrt(mse))
