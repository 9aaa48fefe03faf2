"""3DGS N -> Nvox compression: voxelize Gaussian means + merge per voxel.

The reference's ``test_voxelize_3dgs.py::compress_to_nvox`` (a driver in
spite of its name, SURVEY.md §2 #24): voxelize the means at depth J, build
per-voxel clusters from the Morton sort, merge Gaussian attributes per
cluster (opacity-weighted), and save original/compressed PLYs with voxel
metadata. Here the voxelize + merge is one fused jitted program over padded
static shapes — the cluster CSR construction and the custom CUDA kernel
disappear into segment reductions.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.io.ply import save_ply_3dgs
from raht3dgs_tpu.ops.voxelize import voxelize
from raht3dgs_tpu.utils.timing import StageTimer


@dataclass
class CompressedGaussians:
    """Padded voxelized scene; real voxels occupy slots ``[0, n_voxels)``."""

    positions_int: np.ndarray   # (Np, 3) integer voxel coords
    quats: np.ndarray           # (Np, 4)
    scales: np.ndarray          # (Np, 3)
    opacities: np.ndarray       # (Np,)
    colors: np.ndarray          # (Np, C)
    means_world: np.ndarray     # (Np, 3) merged world-space means
    n_voxels: int
    n_input: int
    voxel_size: float
    vmin: np.ndarray
    width: float
    cluster_of_input: np.ndarray  # (N,) voxel slot of each input Gaussian
    timer: StageTimer


@partial(jax.jit, static_argnames=("depth", "weight_by_opacity"))
def _voxelize_merge_device(
    means, quats, scales, opacities, colors, depth, weight_by_opacity=True
):
    """Fused voxelize + per-voxel Gaussian merge (padded to N slots).

    All per-voxel reductions are scatter-free prefix-sum differences over
    the Morton-sorted member runs (ops/segment.py) — one fused (N, 12+C)
    value matrix instead of seven segment_sum scatters.
    """
    from raht3dgs_tpu.ops.segment import sorted_segment_sums

    N = means.shape[0]
    C = colors.shape[1]
    vox = voxelize(means, depth)
    sort_idx = vox.sort_idx

    # ONE wide (N, 11+C) row gather instead of five with identical indices
    # — row gathers cost per-row DMA regardless of width, and XLA does not
    # merge separate gather ops (docs/performance.md)
    packed = jnp.concatenate(
        [quats, scales, opacities[:, None], colors, means], axis=1
    )[sort_idx]
    q_s = packed[:, 0:4]
    s_s = packed[:, 4:7]
    o_s = packed[:, 7]
    c_s = packed[:, 8 : 8 + colors.shape[1]]
    m_s = packed[:, 8 + colors.shape[1] :]

    w = o_s if weight_by_opacity else jnp.ones_like(o_s)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), vox.point_voxel[1:] != vox.point_voxel[:-1]]
    )
    vals = jnp.concatenate(
        [
            w[:, None] * m_s,                 # 0:3   weighted means
            w[:, None] * q_s,                 # 3:7   weighted quats
            w[:, None] * s_s,                 # 7:10  weighted scales
            w[:, None] * c_s,                 # 10:10+C weighted colors
            w[:, None],                       # total weight
            o_s[:, None],                     # opacity sum
        ],
        axis=1,
    )
    sums, _, _, _ = sorted_segment_sums(vals, first)
    sums = sums.astype(means.dtype)
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

    # per-input cluster id in ORIGINAL input order (for quality metrics).
    # inverse permutation as a gather through argsort — scatter .at[].set
    # costs ~70x an argsort on TPU (docs/performance.md)
    cluster_of_input = vox.point_voxel[jnp.argsort(sort_idx)]

    return (
        vox.positions, m_quats, m_scales, m_opac, m_colors, m_means,
        vox.nvox, vox.voxel_size, vox.vmin, vox.width, cluster_of_input,
    )


def compress_to_nvox(
    params: Dict[str, np.ndarray],
    depth: int = 10,
    weight_by_opacity: bool = True,
    output_dir: Optional[str] = None,
) -> CompressedGaussians:
    """Voxelize + merge a 3DGS scene (reference ``compress_to_nvox``).

    ``params``: dict with means/quats/scales/opacities/colors (numpy, from
    ``io.gsplat_ckpt.load_gsplat_checkpoint`` or a PLY). If ``output_dir``
    is given, writes ``original_N_gaussians.ply`` and
    ``compressed_Nvox_gaussians.ply`` (integer voxel positions + metadata),
    matching the reference file contract that ``encode_3dgs`` consumes.
    """
    timer = StageTimer()
    args = [jnp.asarray(np.asarray(params[k]), dtype=jnp.float32)
            for k in ("means", "quats", "scales", "opacities", "colors")]
    out = timer.time(
        "voxelize_merge", _voxelize_merge_device, *args, depth,
        weight_by_opacity,
    )
    (pos, quats, scales, opac, colors, means_w, nvox, voxel_size, vmin,
     width, cluster) = [np.asarray(x) for x in out]
    nvox = int(nvox)

    result = CompressedGaussians(
        positions_int=pos,
        quats=quats,
        scales=scales,
        opacities=opac,
        colors=colors,
        means_world=means_w,
        n_voxels=nvox,
        n_input=len(params["means"]),
        voxel_size=float(voxel_size),
        vmin=vmin,
        width=float(width),
        cluster_of_input=cluster,
        timer=timer,
    )

    if output_dir is not None:
        t0 = time.perf_counter()
        from pathlib import Path

        outp = Path(output_dir)
        outp.mkdir(parents=True, exist_ok=True)
        save_ply_3dgs(
            outp / "original_N_gaussians.ply",
            params["means"], params["quats"], params["scales"],
            params["opacities"], params["colors"],
        )
        r = slice(0, nvox)
        save_ply_3dgs(
            outp / "compressed_Nvox_gaussians.ply",
            result.positions_int[r].astype(np.float32),
            result.quats[r], result.scales[r], result.opacities[r],
            result.colors[r],
            voxel_size=result.voxel_size, vmin=result.vmin,
        )
        timer.add("save_ply", time.perf_counter() - t0)
    return result


def world_positions(c: CompressedGaussians) -> np.ndarray:
    """Voxel centers in world space: ``(V + 0.5) * voxel_size + vmin``
    (reference ``test_voxelize_3dgs.py:277-278``)."""
    r = slice(0, c.n_voxels)
    return (c.positions_int[r] + 0.5) * c.voxel_size + c.vmin
