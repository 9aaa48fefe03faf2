"""Morton-order voxelization with duplicate-voxel attribute merging.

TPU-native counterpart of the reference's ``voxelize_pc_batched``
(``/root/reference/python/voxelize_pc.py:62-172``): shift by ``vmin``,
quantize by ``width / 2**J`` with clamp, sort by Morton code, detect voxel
boundaries, and average attributes per voxel — but expressed as one jittable
XLA program with **static shapes**: instead of returning ``Nvox``-sized arrays
(data-dependent!), every per-voxel output is padded to the input length ``N``
with explicitly invalid slots (zero weight + sentinel codes that the RAHT
treats as no-ops), and the true voxel count is returned as a device scalar.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from functools import partial

import jax
import jax.numpy as jnp

from raht3dgs_tpu.ops.morton import (
    code_dtype,
    morton_encode,
    pad_code,
)
from raht3dgs_tpu.ops.raht import _code_lanes, _lanes_code
from raht3dgs_tpu.ops.segment import sorted_segment_sums


def _vox_sort_mode() -> str:
    """"payload" (default): narrow payloads ride the sort as extra
    operands; "pair": always (code, row) sort + post-sort row gather.
    The env var is read at TRACE time and the jit cache key does not
    include it — set it before the first voxelize() call at a given
    shape, or ``jax.clear_caches()`` between A/B legs (as the equality
    test does)."""
    import os

    return os.environ.get("RAHT3DGS_VOX_SORT", "payload")


class VoxelizeResult(NamedTuple):
    """Padded, Morton-sorted voxelization output (all shapes static in N).

    Slots ``[0, nvox)`` of the per-voxel arrays are real voxels in ascending
    Morton order; slots ``[nvox, N)`` are padding with ``counts == 0`` and
    sentinel ``codes`` that sort above every real code.
    """

    codes: jnp.ndarray        # (N,) int64 voxel Morton codes (pad: sentinels)
    positions: jnp.ndarray    # (N, 3) int64 integer voxel coords (pad: 0)
    attributes: jnp.ndarray   # (N, D) per-voxel mean attributes (pad: 0)
    counts: jnp.ndarray       # (N,) float — points per voxel (pad: 0)
    nvox: jnp.ndarray         # () int32 — number of real voxels
    sort_idx: jnp.ndarray     # (N,) int32 — permutation sorting points by code
    point_voxel: jnp.ndarray  # (N,) int32 — voxel slot of each *sorted* point
    delta_pos: jnp.ndarray    # (N, 3) float — sorted-point position residuals
    delta_attr: jnp.ndarray   # (N, D) float — sorted-point attribute residuals
    voxel_size: jnp.ndarray   # () float
    vmin: jnp.ndarray         # (3,) float
    width: jnp.ndarray        # () float


def voxelize_pc(PC, param: dict):
    """Legacy dict-parameter interface (reference ``voxelize_pc``,
    ``/root/reference/python/voxelize_pc.py:175-283``): returns the 4-tuple
    ``(PCvox, PCsorted, voxel_indices, DeltaPC)`` with real (unpadded)
    shapes, and optionally dumps the voxelized cloud + metadata files.

    ``param`` keys: ``J`` (required), ``vmin``, ``width``,
    ``writeFileOut``, ``filename``.
    """
    import numpy as np

    depth = param["J"]
    vmin = param.get("vmin")
    if vmin is not None:
        vmin = jnp.asarray(np.asarray(vmin, dtype=float))
    width = param.get("width")
    res = voxelize(jnp.asarray(PC), depth, vmin=vmin, width=width)
    nvox = int(res.nvox)
    n = PC.shape[0]

    pos = np.asarray(res.positions)[:nvox].astype(float)
    attrs = np.asarray(res.attributes)[:nvox]
    PCvox = np.concatenate([pos, attrs], axis=1) if attrs.size else pos
    sort_idx = np.asarray(res.sort_idx)
    PCsorted = np.asarray(PC)[sort_idx]
    first = np.asarray(res.point_voxel)
    voxel_indices = np.concatenate([[0], np.nonzero(np.diff(first))[0] + 1])
    DeltaPC = np.concatenate(
        [np.asarray(res.delta_pos), np.asarray(res.delta_attr)], axis=1
    )

    if param.get("writeFileOut"):
        filename = param.get("filename")
        if not filename:
            raise ValueError("'filename' required when writeFileOut=True")
        from raht3dgs_tpu.io.ply import save_ply_ascii

        vs = float(res.voxel_size)
        vmin_used = np.asarray(res.vmin)
        centers = (pos + 0.5) * vs + vmin_used
        colors = attrs[:, :3] if attrs.shape[1] >= 3 else None
        if colors is not None:
            # the writer's uchar columns need 0..255: the reference
            # normalizes to [0, 1] when max > 1 (voxelize_pc.py:251-253)
            # and its PLY layer rescales — net effect reproduced here
            c01 = (
                colors / 255.0
                if colors.size and colors.max() > 1.0 else colors
            )
            colors = np.clip(np.round(c01 * 255.0), 0, 255)
        save_ply_ascii(f"{filename}_vox.ply", centers, colors)
        with open(f"{filename}_data.txt", "w") as f:
            f.write(
                f"{vmin_used[0]} {vmin_used[1]} {vmin_used[2]} "
                f"{float(res.width)} {depth} {nvox} {n} "
                f"{int(attrs.shape[1] > 0)}\n"
            )
            np.savetxt(f, voxel_indices, fmt="%d")
            np.savetxt(f, DeltaPC, fmt="%.6f")

    return PCvox, PCsorted, voxel_indices, DeltaPC


@partial(jax.jit, static_argnames=("depth",))
def voxelize(
    PC: jnp.ndarray,
    depth: int,
    vmin: Optional[jnp.ndarray] = None,
    width: Optional[jnp.ndarray] = None,
    n_valid: Optional[jnp.ndarray] = None,
) -> VoxelizeResult:
    """Voxelize a point cloud onto a ``2**depth`` cubic grid.

    Args:
        PC: ``(N, 3+D)`` float array — positions followed by D attributes.
        depth: octree depth J (static).
        vmin: optional ``(3,)`` minimum corner; defaults to per-axis min.
        width: optional scalar bounding-box width; defaults to max extent.
        n_valid: optional scalar — number of valid leading rows; trailing rows
            are treated as padding (they sort last and produce pad voxels).

    Returns:
        :class:`VoxelizeResult` with all arrays padded to length N.
    """
    N = PC.shape[0]
    D = PC.shape[1] - 3
    fdtype = PC.dtype
    V = PC[:, :3]
    C = PC[:, 3:]

    row = jnp.arange(N, dtype=jnp.int32)
    if n_valid is None:
        valid_in = jnp.ones((N,), dtype=bool)
    else:
        valid_in = row < jnp.asarray(n_valid, dtype=jnp.int32)

    if vmin is None:
        vmin = jnp.min(jnp.where(valid_in[:, None], V, jnp.inf), axis=0)
    else:
        vmin = jnp.asarray(vmin, dtype=fdtype)
    V0 = V - vmin[None, :]
    if width is None:
        width = jnp.max(jnp.where(valid_in[:, None], V0, -jnp.inf))
    else:
        width = jnp.asarray(width, dtype=fdtype)

    voxel_size = width / (2 ** depth)
    # clip in the float domain (floor yields integer-valued floats, exact in
    # f32 below 2**24 >> 2**depth), then cast straight to int32 — coordinates
    # fit int32 at every supported depth, and int64 elementwise is emulated
    # on TPU (docs/performance.md)
    Vint = jnp.clip(
        jnp.floor(V0 / voxel_size), 0, (1 << depth) - 1
    ).astype(jnp.int32)
    M = morton_encode(Vint, depth)
    # Codes and sentinels must share the exact code dtype BEFORE the where:
    # mixing int64 codes with the uint64 depth-21 sentinels would promote
    # to float64 and round 63-bit codes (silent corruption).
    M = M.astype(code_dtype(depth, N))
    # Invalid input rows get sentinel codes so they sort after every real code.
    M = jnp.where(valid_in, M, pad_code(depth, N, row))

    # one sort yields both the sorted codes and the permutation (argsort
    # alone would leave M[sort_idx] as an extra 1-lane gather)
    PCall = jnp.concatenate([V0, C], axis=1)
    if _vox_sort_mode() == "payload" and PCall.shape[1] <= 6:
        # carry the payload THROUGH the sort as extra operands: the
        # post-sort (N, 3+D) row gather was ~2.5 ms of the 500k program
        # (per-row DMA); the sort network's compare-exchanges move the
        # same lanes for ~1 ms instead (pair+gather 6.69 ms -> payload
        # sort 5.07 ms on v5e, scripts/exp_vox_payload_sort.py). lax.sort
        # is STABLE by default and one permutation applies to every
        # operand, so the outputs are BITWISE the gather formulation's,
        # duplicate-code ties included (pinned in test_voxelize). Wide
        # attribute sets (3DGS's 56 channels) keep the gather: dozens of
        # sort operands cost more than one row DMA.
        out = jax.lax.sort(
            (M, row) + tuple(PCall[:, i] for i in range(PCall.shape[1])),
            num_keys=1,
        )
        Ms, sort_idx = out[0], out[1]
        PCs = jnp.stack(out[2:], axis=1)
    else:
        Ms, sort_idx = jax.lax.sort((M, row), num_keys=1)
        # one wide (N, 3+D) row gather instead of two narrow ones — row
        # gathers cost about the same regardless of width on TPU
        # (docs/performance.md)
        PCs = PCall[sort_idx]
    V0s = PCs[:, :3]
    Cs = PCs[:, 3:]
    # pads carry sentinel codes that sort after every real code, so the
    # sorted validity mask is simply a prefix test — no gather
    n_valid_total = jnp.sum(valid_in.astype(jnp.int32))
    valid_s = row < n_valid_total

    first = jnp.concatenate([jnp.ones((1,), bool), Ms[1:] != Ms[:-1]])
    point_voxel = (jnp.cumsum(first.astype(jnp.int32)) - 1).astype(jnp.int32)
    nvox = jnp.sum((first & valid_s).astype(jnp.int32))

    slot = row
    # Scatter-free per-voxel reduction: points are Morton-sorted, so voxel
    # sums are prefix differences at run boundaries (ops/segment.py); the
    # voxel's code AND its integer coordinates ride the same gather as
    # exact float lanes (< 2**24, exact in f32), so no morton_decode pass
    # is needed at all — the sorted points' own quantized coordinates are
    # bitwise the codes' decode (same clip(floor(.)) on the same values).
    vals = jnp.concatenate(
        [
            jnp.where(valid_s[:, None], Cs, 0),
            valid_s.astype(fdtype)[:, None],
        ],
        axis=1,
    )
    Vint_f = jnp.floor(V0s / voxel_size)  # shared with `corner` below
    extra = jnp.concatenate(
        [
            _code_lanes(Ms, fdtype),
            jnp.clip(Vint_f, 0, (1 << depth) - 1).astype(fdtype),
        ],
        axis=1,
    )
    sums, extra_rows, _, _ = sorted_segment_sums(vals, first, extra)
    counts = sums[:, D].astype(fdtype)
    Cvox = (sums[:, :D] / jnp.maximum(sums[:, D], 1.0)[:, None]).astype(fdtype)

    real = slot < nvox
    codes = _lanes_code(extra_rows[:, :3], code_dtype(depth, N), fdtype)
    codes = jnp.where(real, codes, pad_code(depth, N, slot))
    pos_dtype = (
        jnp.int32 if code_dtype(depth, N) == jnp.int32 else jnp.int64
    )
    positions = jnp.where(
        real[:, None], extra_rows[:, 3:].astype(pos_dtype), 0
    )
    counts = jnp.where(real, counts, 0)
    Cvox = jnp.where(real[:, None], Cvox, 0)

    corner = voxel_size * Vint_f
    delta_pos = jnp.where(valid_s[:, None], V0s - corner, 0)
    delta_attr = jnp.where(valid_s[:, None], Cs - Cvox[point_voxel], 0)

    return VoxelizeResult(
        codes=codes,
        positions=positions,
        attributes=Cvox,
        counts=counts,
        nvox=nvox,
        sort_idx=sort_idx,
        point_voxel=point_voxel,
        delta_pos=delta_pos,
        delta_attr=delta_attr,
        voxel_size=jnp.asarray(voxel_size, dtype=fdtype),
        vmin=vmin.astype(fdtype),
        width=jnp.asarray(width, dtype=fdtype),
    )
