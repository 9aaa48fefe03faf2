"""Gaussian cluster merging as XLA segmented reductions.

TPU-native replacement for the reference's custom CUDA kernel
(``/root/reference/cuda/merge_cluster.cu`` + its wrapper/Python API): the
one-thread-per-cluster member loops become scatter-free sorted segment
reductions (``ops/segment.py:sorted_segment_sums`` — segment-boundary
prefix-sum differences, which XLA lowers far better on TPU than
``segment_sum``'s scatter-adds; see docs/performance.md) — no custom
kernel needed, and it vectorizes over any number of attribute channels.

Merge semantics (matching the kernel):
- member weight = opacity (``weight_by_opacity=True``) or 1;
- means/quats/scales/colors: weighted mean (total weight 0 -> zeros, same
  as the kernel's ``total_weight = 1`` fallback);
- quats: renormalized, zero-norm falls back to identity (0,0,0,1);
- opacity: plain sum clamped to 1.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_clusters", "weight_by_opacity"))
def merge_gaussian_clusters(
    means: jnp.ndarray,       # (N, 3)
    quats: jnp.ndarray,       # (N, 4)
    scales: jnp.ndarray,      # (N, 3)
    opacities: jnp.ndarray,   # (N,)
    colors: jnp.ndarray,      # (N, C)
    cluster_ids: jnp.ndarray,  # (N,) int — cluster of each Gaussian
    num_clusters: int,
    weight_by_opacity: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge Gaussians sharing a cluster id. Returns per-cluster params.

    ``num_clusters`` is static (pad clusters for bucketing if needed; empty
    clusters produce zero means/scales/colors, identity quats, opacity 0).
    """
    from raht3dgs_tpu.ops.segment import sorted_segment_sums

    N = means.shape[0]
    C = colors.shape[1]
    w = opacities if weight_by_opacity else jnp.ones_like(opacities)

    # Sort members by cluster id once (cheap on TPU), then reduce the runs
    # scatter-free (ops/segment.py). The cluster id of each run rides the
    # boundary gather so results land in their cluster's slot via one
    # monotone re-index.
    order = jnp.argsort(cluster_ids).astype(jnp.int32)
    cid_s = cluster_ids[order]
    vals = jnp.concatenate(
        [
            w[:, None] * means,
            w[:, None] * quats,
            w[:, None] * scales,
            w[:, None] * colors,
            w[:, None],
            opacities[:, None],
        ],
        axis=1,
    )[order]
    first = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    sums, cid_rows, _, n_seg = sorted_segment_sums(
        vals, first, cid_s[:, None].astype(jnp.float64)
    )
    # place run k's sums into cluster slot cid_rows[k] — runs have unique,
    # increasing cluster ids, so this gather-by-inverse is conflict-free
    run_cid = jnp.where(
        jnp.arange(N) < n_seg, cid_rows[:, 0].astype(jnp.int32), num_clusters
    )
    out = jnp.zeros((num_clusters + 1, sums.shape[1]))
    out = out.at[run_cid].set(sums)  # unique slots: no scatter collisions
    sums = out[:num_clusters].astype(means.dtype)

    tw = sums[:, 10 + C]
    tw_safe = jnp.where(tw > 0, tw, 1.0)[:, None]
    m_means = sums[:, 0:3] / tw_safe
    q_acc = sums[:, 3:7]
    m_scales = sums[:, 7:10] / tw_safe
    m_colors = sums[:, 10 : 10 + C] / tw_safe
    q_norm = jnp.linalg.norm(q_acc, axis=1, keepdims=True)
    identity = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=quats.dtype)
    m_quats = jnp.where(q_norm > 0, q_acc / jnp.where(q_norm > 0, q_norm, 1.0),
                        identity[None, :])
    m_opac = jnp.minimum(sums[:, 11 + C], 1.0)
    return m_means, m_quats, m_scales, m_opac, m_colors


def prepare_cluster_data(
    cluster_labels: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR view of arbitrary cluster labels (API parity with the reference's
    ``prepare_cluster_data``, ``cuda/merge_cluster_cuda/__init__.py:30-74``).

    Returns ``(cluster_indices, cluster_offsets)``: member indices grouped by
    cluster, and boundaries with ``offsets[k]..offsets[k+1]`` spanning
    cluster k. The JAX merge path doesn't need this (it consumes labels
    directly); provided for migration and for CSR-shaped callers.
    """
    labels = np.asarray(cluster_labels)
    _, inverse = np.unique(labels, return_inverse=True)
    order = np.argsort(inverse, kind="stable")
    sorted_ids = inverse[order]
    boundaries = np.concatenate(
        [[0], np.nonzero(np.diff(sorted_ids))[0] + 1, [len(order)]]
    )
    return order.astype(np.int32), boundaries.astype(np.int32)


def merge_gaussian_clusters_with_indices(
    means, quats, scales, opacities, colors,
    cluster_indices: np.ndarray,
    cluster_offsets: np.ndarray,
    weight_by_opacity: bool = True,
):
    """CSR-input merge (parity with the reference low-level entry point,
    ``cuda/merge_cluster_cuda/__init__.py:149-204``): converts the CSR form
    to per-member cluster ids and runs the segment-reduce merge."""
    cluster_indices = np.asarray(cluster_indices)
    cluster_offsets = np.asarray(cluster_offsets)
    k = len(cluster_offsets) - 1
    sizes = np.diff(cluster_offsets)
    member_cluster = np.repeat(np.arange(k), sizes)
    # cluster_indices maps CSR slots -> original rows; invert to per-row
    # ids over ALL N rows. The reference contract allows a PARTIAL CSR
    # (total_clustered <= N, cuda/merge_cluster_cuda/__init__.py:149-204):
    # rows outside the CSR get the merge's trash slot id (= k) and are
    # dropped — an np.empty sized by the CSR would crash on subset input
    # and leave garbage ids on duplicates.
    n = int(np.asarray(means).shape[0])
    ids = np.full(n, k, dtype=np.int64)
    ids[cluster_indices] = member_cluster
    return merge_gaussian_clusters(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(colors),
        jnp.asarray(ids), num_clusters=k,
        weight_by_opacity=weight_by_opacity,
    )
