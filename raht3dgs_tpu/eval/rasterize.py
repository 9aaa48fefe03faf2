"""TPU-native volumetric 3D Gaussian Splatting rasterizer (JAX/XLA).

The reference evaluates rendering quality through ``gsplat``'s CUDA
rasterizer (``/root/reference/python/quality_eval.py:283-353``), which has no
TPU path. This module re-derives the same image formation model as a pure
XLA program built from the framework's scatter-free primitives, so render
PSNR — the reference's headline quality metric for 3DGS — runs natively on
TPU (and on CPU in the test suite):

- **Projection (EWA splatting).** 3D covariance ``Sigma = R S S^T R^T``
  from the unit quaternion and per-axis scales; camera-space mean
  ``t = W p + c``; perspective Jacobian ``J``; 2D covariance
  ``Sigma' = J W Sigma W^T J^T + eps2d * I`` with the same ``eps2d = 0.3``
  pixel dilation gsplat applies (no opacity compensation —
  ``antialiased=False`` parity).
- **Spherical harmonics** color evaluation up to degree 3 along the
  camera->gaussian direction, with the 3DGS ``+0.5`` offset and
  clamp-at-zero convention.
- **Tile binning without scatters.** Gaussians are depth-sorted once
  (ascending camera z), then expanded into a *static* ``(N, max_tiles)``
  grid of (tile, gaussian) entries covering each footprint's tile bounding
  box; sorting the entries by tile id groups them per tile while
  inheriting the depth order. When ``(n_tiles + 1) * 2^ceil(log2(N))``
  fits 32 bits (every codec-scale config) the (tile, depth-rank) pair is
  packed into ONE uint32 key — a single-operand unstable sort with unique
  keys, half the sort bandwidth of the stable (key, value) form — else it
  falls back to a stable two-operand sort. Per-tile windows come from two
  ``searchsorted`` calls — no scatter, no dynamic shapes.
- **Front-to-back alpha compositing with exact early exit.** For each
  16x16 tile the sorted entries are processed in chunks: ``alpha =
  min(0.999, o * exp(-0.5 d^T Sigma'^-1 d))`` (killed below 1/255, gsplat
  parity), and the transmittance ``T_i = prod_{j<i} (1 - alpha_j)`` is an
  *exclusive cumprod along the sorted axis* — the sequential per-pixel
  blending loop of the CUDA implementation becomes a batched prefix
  product, and the color accumulation ``sum_i c_i alpha_i T_i`` a
  tile-batched matmul. The chunk loop is a ``while_loop`` that stops once
  every tile has either exhausted its entries or fully saturated
  (``trans == 0`` for all pixels — in f32 the transmittance *underflows to
  exactly 0*, after which further chunks add exactly 0.0): the result is
  bitwise identical to the full loop, but a mostly-empty tile grid costs
  its true occupancy, not ``max_per_tile``, and table rows are gathered
  per executed chunk instead of materializing the ``(T, K, 10)`` slab.

Exactness: away from the static capacity limits (``max_tiles_per_gauss``
tiles per footprint, ``max_per_tile`` entries per tile — overflows are
counted and returned, never silent) the tiled program computes the same
sum as a dense per-pixel evaluation; :func:`rasterize_dense` is that dense
reference and the test suite pins tiled == dense on randomized scenes.

The entry point :func:`rasterize_gaussians` mirrors the gsplat call the
reference makes (white background, one camera per call).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# 3DGS spherical-harmonics basis constants (degrees 0-3).
_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199
_SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

_ALPHA_MIN = 1.0 / 255.0   # contribution cutoff (gsplat parity)
_ALPHA_MAX = 0.999         # alpha clamp (gsplat parity)
_NEAR_PLANE = 0.01         # near-plane cull (gsplat default)


class RasterMeta(NamedTuple):
    """Capacity diagnostics for one rasterized view (device scalars).

    ``dup_clipped``: tile-footprint entries dropped because a gaussian
    covered more than ``max_tiles_per_gauss`` tiles.
    ``tile_clipped``: entries dropped because a tile held more than
    ``max_per_tile`` gaussians. Both zero => the image is exactly the
    dense blend (see :func:`rasterize_dense`)."""

    dup_clipped: jnp.ndarray
    tile_clipped: jnp.ndarray


def eval_sh(colors: jnp.ndarray, dirs: jnp.ndarray, sh_degree: int) -> jnp.ndarray:
    """Evaluate SH colors (N, K, 3) along unit directions (N, 3).

    Standard 3DGS convention: ``rgb = clamp(SH(dir) + 0.5, min=0)``.
    ``sh_degree`` in [0, 3]; K must be >= (sh_degree + 1)**2.
    """
    x = dirs[:, 0:1]
    y = dirs[:, 1:2]
    z = dirs[:, 2:3]
    res = _SH_C0 * colors[:, 0]
    if sh_degree >= 1:
        res = (
            res
            - _SH_C1 * y * colors[:, 1]
            + _SH_C1 * z * colors[:, 2]
            - _SH_C1 * x * colors[:, 3]
        )
    if sh_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        res = (
            res
            + _SH_C2[0] * xy * colors[:, 4]
            + _SH_C2[1] * yz * colors[:, 5]
            + _SH_C2[2] * (2.0 * zz - xx - yy) * colors[:, 6]
            + _SH_C2[3] * xz * colors[:, 7]
            + _SH_C2[4] * (xx - yy) * colors[:, 8]
        )
    if sh_degree >= 3:
        res = (
            res
            + _SH_C3[0] * y * (3.0 * xx - yy) * colors[:, 9]
            + _SH_C3[1] * xy * z * colors[:, 10]
            + _SH_C3[2] * y * (4.0 * zz - xx - yy) * colors[:, 11]
            + _SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * colors[:, 12]
            + _SH_C3[4] * x * (4.0 * zz - xx - yy) * colors[:, 13]
            + _SH_C3[5] * z * (xx - yy) * colors[:, 14]
            + _SH_C3[6] * x * (xx - 3.0 * yy) * colors[:, 15]
        )
    return jnp.maximum(res + 0.5, 0.0)


def _quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalized quaternions (N, 4) wxyz -> rotation matrices (N, 3, 3).

    Zero-norm quaternions fall back to identity (the cluster-merge
    convention, ``models/gs_merge.py``)."""
    norm = jnp.linalg.norm(quats, axis=1, keepdims=True)
    safe = norm > 1e-12
    q = jnp.where(
        safe,
        quats / jnp.where(safe, norm, 1.0),
        jnp.asarray([1.0, 0.0, 0.0, 0.0], quats.dtype)[None, :],
    )
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=1,
            ),
        ],
        axis=1,
    )


def project_gaussians(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    viewmat: jnp.ndarray,
    Kmat: jnp.ndarray,
    width: int,
    height: int,
    eps2d: float = 0.3,
):
    """EWA projection of 3D gaussians to 2D screen-space splats.

    Returns (means2d (N,2), conics (N,3) = (A, B, C) of the inverse 2D
    covariance [A B; B C], depths (N,), radii (N,), alive mask (N,),
    viewdirs (N,3) camera->gaussian unit directions in world space,
    lam1 (N,) larger eigenvalue of the dilated 2D covariance — the
    reciprocal of the conic's smaller eigenvalue, used for conservative
    per-tile contribution bounds).
    """
    R_w2c = viewmat[:3, :3]
    t_w2c = viewmat[:3, 3]
    cam = means @ R_w2c.T + t_w2c[None, :]
    depths = cam[:, 2]
    alive = depths > _NEAR_PLANE
    zs = jnp.where(alive, depths, 1.0)

    fx, fy = Kmat[0, 0], Kmat[1, 1]
    cx, cy = Kmat[0, 2], Kmat[1, 2]
    mx = fx * cam[:, 0] / zs + cx
    my = fy * cam[:, 1] / zs + cy

    # 3D covariance Sigma = R S S^T R^T, then camera frame M = W Sigma W^T.
    Rg = _quat_to_rotmat(quats)
    RS = Rg * scales[:, None, :]  # columns scaled
    Sigma = RS @ jnp.swapaxes(RS, 1, 2)
    M = R_w2c[None] @ Sigma @ R_w2c.T[None]

    # Perspective Jacobian J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]].
    # gsplat clamps the tangent-plane offsets to limit the linearization
    # error for gaussians far outside the frustum; the clamp only affects
    # off-screen splats so parity inside the image is unchanged.
    lim_x = 1.3 * (width / 2.0) / fx
    lim_y = 1.3 * (height / 2.0) / fy
    tx = zs * jnp.clip(cam[:, 0] / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(cam[:, 1] / zs, -lim_y, lim_y)
    z2 = zs * zs
    zero = jnp.zeros_like(zs)
    J = jnp.stack(
        [
            jnp.stack([fx / zs, zero, -fx * tx / z2], axis=1),
            jnp.stack([zero, fy / zs, -fy * ty / z2], axis=1),
        ],
        axis=1,
    )
    cov2 = J @ M @ jnp.swapaxes(J, 1, 2)
    a = cov2[:, 0, 0] + eps2d
    c = cov2[:, 1, 1] + eps2d
    b = cov2[:, 0, 1]

    det = a * c - b * b
    alive &= det > 0
    det_s = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_s, -b / det_s, a / det_s], axis=1)

    # 3-sigma footprint radius from the larger eigenvalue.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    alive &= radii > 0
    # cull footprints entirely outside the image
    alive &= (mx + radii > 0) & (mx - radii < width)
    alive &= (my + radii > 0) & (my - radii < height)
    alive &= opacities > 0.0

    cam_pos = -R_w2c.T @ t_w2c
    vd = means - cam_pos[None, :]
    vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=1, keepdims=True), 1e-12)
    means2d = jnp.stack([mx, my], axis=1)
    return means2d, conic, depths, radii, alive, vd, lam1


def _colors_to_sh(colors: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """(N, 3K) or (N, K, 3) SH colors -> ((N, K, 3), inferred degree)."""
    if colors.ndim == 2:
        if colors.shape[1] % 3 != 0:
            raise ValueError(f"color channels {colors.shape[1]} not a multiple of 3")
        colors = colors.reshape(colors.shape[0], -1, 3)
    K = colors.shape[1]
    degree = int(np.sqrt(K)) - 1
    if (degree + 1) ** 2 != K or not 0 <= degree <= 3:
        raise ValueError(f"{K} SH coefficients is not a supported degree (0-3)")
    return colors, degree


def _tile_bbox(mx, my, r, tile, tiles_x, tiles_y):
    """Tile-footprint bounding box of each gaussian (clipped to the grid).

    THE bbox formula: the binning pass, the dense golden's membership
    cutoff, and the auto tile budget all call this one definition — the
    tiled==dense and budget>=true-max guarantees depend on them never
    diverging.
    """
    tx0 = jnp.clip(jnp.floor((mx - r) / tile).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor((my - r) / tile).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor((my + r) / tile).astype(jnp.int32), 0, tiles_y - 1)
    return tx0, tx1, ty0, ty1


def _cull_mask(mx, my, cA, cB, cC, opac, etx, ety, tile):
    """Exact-zero entry cull: True for entries whose maximum achievable
    alpha on their tile's pixel-center rectangle can clear the 1/255
    cutoff. ONE definition — the binning pass and the compaction probe
    must never diverge.

    The bound is the EXACT minimum of the blend's quadratic form
    q = A dx^2 + 2B dx dy + C dy^2 (alpha = o * exp(-q/2)) over the
    rectangle: zero when the mean lies inside, else the minimum over the
    four edges, each a 1-D convex quadratic whose clamped stationary point
    is evaluated directly. Anisotropic — an elongated splat's off-axis
    tiles cull even though its major-eigenvalue (isotropic) bound never
    would (the round-1 cull's weakness; measured below on needle scenes).
    Keep iff q_min <= 2*log(2*o/ALPHA_MIN): the 2x opacity factor is the
    same f32-rounding safety margin as the original isotropic bound, and
    the rectangle minimum lower-bounds every pixel center's q, so no
    contributing pixel can be culled. Zero or sub-cutoff opacities give
    -inf thresholds (always culled; dead via the alive mask anyway);
    negative opacities log to NaN whose comparison is False — culled,
    matching their always-zeroed blend."""
    f32 = jnp.float32
    thr = 2.0 * jnp.log((2.0 / _ALPHA_MIN) * opac)
    rx0 = etx.astype(f32) * tile + 0.5
    ry0 = ety.astype(f32) * tile + 0.5
    x0 = rx0 - mx[:, None]
    x1 = x0 + (tile - 1)
    y0 = ry0 - my[:, None]
    y1 = y0 + (tile - 1)
    A = jnp.maximum(cA, 1e-12)[:, None]
    C = jnp.maximum(cC, 1e-12)[:, None]
    B = cB[:, None]

    def q(dx, dy):
        return A * dx * dx + 2.0 * B * dx * dy + C * dy * dy

    inside = (x0 <= 0) & (0 <= x1) & (y0 <= 0) & (0 <= y1)
    q_edges = jnp.minimum(
        jnp.minimum(
            q(x0, jnp.clip(-B * x0 / C, y0, y1)),
            q(x1, jnp.clip(-B * x1 / C, y0, y1)),
        ),
        jnp.minimum(
            q(jnp.clip(-B * y0 / A, x0, x1), y0),
            q(jnp.clip(-B * y1 / A, x0, x1), y1),
        ),
    )
    q_min = jnp.where(inside, 0.0, q_edges)
    return q_min <= thr[:, None]


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "sh_degree",
        "tile",
        "max_tiles_per_gauss",
        "max_per_tile",
        "chunk",
        "compact_tiles",
    ),
)
def _rasterize_tiled(
    means,
    quats,
    scales,
    opacities,
    sh_colors,
    viewmat,
    Kmat,
    background,
    *,
    width: int,
    height: int,
    sh_degree: int,
    tile: int,
    max_tiles_per_gauss: int,
    max_per_tile: int,
    chunk: int,
    compact_tiles: int = None,
):
    N = means.shape[0]
    f32 = jnp.float32
    means2d, conic, depths, radii, alive, vd, lam1 = project_gaussians(
        means.astype(f32),
        quats.astype(f32),
        scales.astype(f32),
        opacities.astype(f32).reshape(-1),
        viewmat.astype(f32),
        Kmat.astype(f32),
        width,
        height,
    )
    rgb = eval_sh(sh_colors.astype(f32), vd, sh_degree)
    opac = opacities.astype(f32).reshape(-1)

    # --- depth order (one sort; ties broken by index for determinism) ---
    order = lax.sort(
        (jnp.where(alive, depths, jnp.inf), jnp.arange(N, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )[1]
    # per-gaussian render table in depth order, one wide row gather
    table = jnp.concatenate(
        [
            means2d,
            conic,
            rgb,
            opac[:, None],
            alive.astype(f32)[:, None],
        ],
        axis=1,
    )[order]
    g_alive = table[:, 9] > 0

    # --- tile footprint bounding boxes (depth order) ---
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    n_tiles = tiles_x * tiles_y
    mx, my, r = table[:, 0], table[:, 1], radii[order]
    tx0, tx1, ty0, ty1 = _tile_bbox(mx, my, r, tile, tiles_x, tiles_y)
    tw = tx1 - tx0 + 1
    th = ty1 - ty0 + 1
    n_cover = jnp.where(g_alive, tw * th, 0)
    dup_clipped = jnp.sum(jnp.maximum(n_cover - max_tiles_per_gauss, 0))

    # static (N, M) duplication grid: entry j of gaussian i covers tile
    # (ty0 + j // tw, tx0 + j % tw); invalid entries get sentinel tile id
    j = jnp.arange(max_tiles_per_gauss, dtype=jnp.int32)[None, :]
    tw_s = jnp.maximum(tw, 1)[:, None]
    ety = ty0[:, None] + j // tw_s
    etx = tx0[:, None] + j % tw_s
    e_valid = (j < n_cover[:, None]) & g_alive[:, None]

    # --- exact-zero per-entry tile culling ---
    # The blend zeroes every contribution below the 1/255 cutoff, so an
    # entry whose *maximum achievable* alpha anywhere on its tile's
    # pixel-center rectangle provably stays below the cutoff adds exactly
    # 0.0 to that tile (acc += 0, trans *= 1).  Dropping it shortens the
    # tile's sorted segment (fewer blend chunks; capacity no longer
    # wasted on zero entries).  Only f32 reduction *grouping* changes:
    # compaction shifts later entries across chunk boundaries, regrouping
    # the blockwise sums/products — the same invariance class as changing
    # ``chunk`` (observed deltas ~1e-7); tiled==dense stays pinned by
    # tests/test_rasterize.py.  Bound: the conic's smallest eigenvalue is
    # 1/lam1, so
    #   alpha <= o * exp(-0.5 * D^2 / lam1)
    # with D the distance from the splat mean to the rectangle of pixel
    # centers.  The RAW opacity must bound the log (not the blend's
    # ALPHA_MAX clamp: ALPHA_MAX > ALPHA_MIN, so clamping can never zero
    # a contribution — with o > ALPHA_MAX a clamped bound would cull
    # pixels whose unclamped alpha still clears the cutoff).  A 2x safety
    # factor absorbs f32 rounding in both this bound and the blend's own
    # quadratic (a ~6% tighter distance threshold — negligible cull-rate
    # cost).  The test runs in the log domain — cull iff
    # D^2 > 2*lam1*log(2*o/ALPHA_MIN) — so the only transcendental is an
    # N-sized log, never an E-sized exp (zero or sub-cutoff opacities
    # give a -inf threshold: always culled, and their entries were dead
    # via the alive mask anyway; negative opacities log to NaN, whose
    # comparison is False — culled, matching their always-zeroed blend).
    if os.environ.get("RAHT3DGS_RASTER_CULL", "1") not in ("", "0"):
        e_valid &= _cull_mask(mx, my, table[:, 2], table[:, 3], table[:, 4],
                              table[:, 8], etx, ety, tile)

    # --- entry compaction: shrink the global binning sort's static width
    # to the post-cull maximum (``compact_tiles``, measured by the caller's
    # probe). Valid entries keep their slot order within the row, so the
    # (tile, depth-rank) key stream — and therefore the blend's segments —
    # are IDENTICAL to the uncompacted program: compaction is bitwise
    # exact, unlike the cull itself (which regroups f32 chunk sums). A
    # per-row sort of width max_tiles_per_gauss buys a global sort of
    # width compact_tiles.
    if compact_tiles is not None and compact_tiles < max_tiles_per_gauss:
        jgrid = jnp.broadcast_to(j, e_valid.shape).astype(jnp.int32)
        jkey = jnp.where(e_valid, jgrid, max_tiles_per_gauss)
        js = lax.sort(jkey, dimension=1)[:, :compact_tiles]
        n_valid = jnp.sum(e_valid, axis=1)
        dup_clipped = dup_clipped + jnp.sum(
            jnp.maximum(n_valid - compact_tiles, 0)
        )
        e_valid = js < max_tiles_per_gauss
        ety = ty0[:, None] + js // tw_s
        etx = tx0[:, None] + js % tw_s

    e_tile = jnp.where(e_valid, ety * tiles_x + etx, n_tiles).astype(jnp.int32)

    # --- binning sort + per-tile windows (scatter-free) ---
    # Preferred form: pack (tile id, depth rank) into one uint32 key.  The
    # duplication grid's row index IS the depth rank (rows are in depth
    # order), keys are unique, so a single-operand unstable sort groups
    # tiles while preserving front-to-back order — half the bandwidth of
    # the stable (tile, gauss) pair sort, which is kept as the fallback
    # for configs whose (tile, rank) product overflows 32 bits.
    rank_bits = max(1, int(N - 1).bit_length())
    tid = jnp.arange(n_tiles, dtype=jnp.int32)
    use_packed = (n_tiles + 1) << rank_bits <= 1 << 32
    if os.environ.get("RAHT3DGS_RASTER_PAIR_SORT", "0") not in ("", "0"):
        # A/B escape hatch (read at trace time — pair it with distinct
        # shapes or ``_rasterize_tiled.clear_cache()`` when toggling)
        use_packed = False
    if use_packed:
        ranks = jnp.arange(N, dtype=jnp.uint32)[:, None]
        packed = (e_tile.astype(jnp.uint32) << rank_bits) | ranks
        packed_s = lax.sort(packed.reshape(-1))
        e_gauss_s = (packed_s & ((1 << rank_bits) - 1)).astype(jnp.int32)
        bounds = (tid.astype(jnp.uint32) << rank_bits)
        starts = jnp.searchsorted(packed_s, bounds, side="left")
        ends = jnp.searchsorted(
            packed_s, bounds + (1 << rank_bits), side="left"
        )
    else:
        e_gauss = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], e_tile.shape
        )
        # stable sort by tile id: rows were emitted in depth order, so
        # entries within a tile stay depth-sorted (row-major flatten
        # preserves row order)
        e_tile_s, e_gauss_s = lax.sort(
            (e_tile.reshape(-1), e_gauss.reshape(-1)), num_keys=1,
            is_stable=True,
        )
        starts = jnp.searchsorted(e_tile_s, tid, side="left")
        ends = jnp.searchsorted(e_tile_s, tid, side="right")
    starts = starts.astype(jnp.int32)
    E = e_gauss_s.shape[0]
    seg_len = ends.astype(jnp.int32) - starts
    tile_clipped = jnp.sum(jnp.maximum(seg_len - max_per_tile, 0))
    seg_capped = jnp.minimum(seg_len, max_per_tile)

    # --- per-tile pixel grid (pixel centers, gsplat convention) ---
    tpx = (tid % tiles_x) * tile
    tpy = (tid // tiles_x) * tile
    p = jnp.arange(tile * tile, dtype=jnp.int32)
    px = tpx[:, None] + (p % tile)[None, :]
    py = tpy[:, None] + (p // tile)[None, :]
    pxf = px.astype(f32) + 0.5
    pyf = py.astype(f32) + 0.5

    # --- front-to-back blend: shrinking-width while_loops over chunks ---
    # Exact early exit: a chunk only changes (acc, trans) for tiles that
    # still have entries (seg_capped > i*chunk) AND are not saturated.
    # Saturation is *exact* in f32 — the transmittance prefix product
    # underflows to 0.0, after which every later contribution is
    # alpha * t * 0.0 == 0.0 — so stopping is bitwise identical to
    # running all chunks, while a mostly-empty or quickly-opaque tile
    # grid pays its true depth, not max_per_tile.  Rows are gathered per
    # executed chunk (never a (T, max_per_tile, 10) slab).
    #
    # Lockstep refinement: tiles are sorted by capped occupancy
    # descending and processed in statically-sized prefix bands
    # (T, ceil(T/4), ceil(T/16), ...).  Each band's while_loop runs until
    # every tile OUTSIDE the next band is finished, then the working set
    # shrinks — so the deep chunks of a few high-depth-complexity tiles
    # (a surface shell's limb tiles) run on 1/4^s of the grid instead of
    # dragging every tile through every chunk.  The chunk counter carries
    # across stages; per-tile math is unchanged, so the image is still
    # bitwise the full-loop result.
    P = tile * tile
    n_chunks = (max_per_tile + chunk - 1) // chunk
    slot_c = jnp.arange(chunk, dtype=jnp.int32)

    occ_perm = lax.sort((-seg_capped, tid), num_keys=1, is_stable=True)[1]
    inv_perm = jnp.argsort(occ_perm)
    starts_o = starts[occ_perm]
    seg_o = seg_capped[occ_perm]
    pxf_o = pxf[occ_perm]
    pyf_o = pyf[occ_perm]

    widths = [n_tiles]
    while widths[-1] > 8:
        widths.append(-(-widths[-1] // 4))

    def _blend_chunk(i, acc, trans, st_w, sg_w, pxf_w, pyf_w):
        W = st_w.shape[0]
        s = i * chunk + slot_c                         # (C,)
        idx = jnp.minimum(st_w[:, None] + s[None, :], E - 1)
        rws = table[e_gauss_s[idx].reshape(-1)].reshape(
            W, chunk, table.shape[1]
        )                                              # (W, C, 10)
        vld = s[None, :] < sg_w[:, None]               # (W, C)
        dx = pxf_w[:, :, None] - rws[:, None, :, 0]    # (W, P, C)
        dy = pyf_w[:, :, None] - rws[:, None, :, 1]
        A = rws[:, None, :, 2]
        B = rws[:, None, :, 3]
        Cc = rws[:, None, :, 4]
        power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
        alpha = jnp.minimum(
            rws[:, None, :, 8] * jnp.exp(jnp.minimum(power, 0.0)), _ALPHA_MAX
        )
        alpha = jnp.where(
            vld[:, None, :] & (power <= 0) & (alpha >= _ALPHA_MIN), alpha, 0.0
        )
        one_m = 1.0 - alpha
        t_excl = jnp.concatenate(
            [jnp.ones_like(one_m[:, :, :1]), jnp.cumprod(one_m, axis=2)[:, :, :-1]],
            axis=2,
        )
        w = alpha * t_excl * trans[:, :, None]          # (W, P, C)
        acc = acc + jnp.einsum("tpc,tck->tpk", w, rws[:, :, 5:8])
        trans = trans * jnp.prod(one_m, axis=2)
        return acc, trans

    i_cur = jnp.int32(0)
    acc_cur = jnp.zeros((n_tiles, P, 3), f32)
    trans_cur = jnp.ones((n_tiles, P), f32)
    done_acc, done_trans = [], []
    for si, Ws in enumerate(widths):
        Wn = widths[si + 1] if si + 1 < len(widths) else 0
        st_w, sg_w = starts_o[:Ws], seg_o[:Ws]
        pxf_w, pyf_w = pxf_o[:Ws], pyf_o[:Ws]

        def cond(state, sg_w=sg_w, Wn=Wn):
            i, _, trans = state
            band_live = jnp.any(trans[Wn:] > 0.0, axis=1)
            band_rem = sg_w[Wn:] > i * chunk
            return (i < n_chunks) & jnp.any(band_live & band_rem)

        def body(state, st_w=st_w, sg_w=sg_w, pxf_w=pxf_w, pyf_w=pyf_w):
            i, acc, trans = state
            acc, trans = _blend_chunk(i, acc, trans, st_w, sg_w, pxf_w, pyf_w)
            return (i + 1, acc, trans)

        i_cur, acc_w, trans_w = lax.while_loop(
            cond, body, (i_cur, acc_cur[:Ws], trans_cur[:Ws])
        )
        done_acc.append(acc_w[Wn:])
        done_trans.append(trans_w[Wn:])
        acc_cur, trans_cur = acc_w[:Wn], trans_w[:Wn]

    acc = jnp.concatenate(done_acc[::-1], axis=0)[inv_perm]
    trans = jnp.concatenate(done_trans[::-1], axis=0)[inv_perm]

    img_tiles = acc + trans[:, :, None] * background[None, None, :]
    img = (
        img_tiles.reshape(tiles_y, tiles_x, tile, tile, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(tiles_y * tile, tiles_x * tile, 3)
    )[:height, :width]
    return img, RasterMeta(dup_clipped, tile_clipped)


@partial(jax.jit, static_argnames=("width", "height", "sh_degree", "tile"))
def _rasterize_dense_jit(
    means, quats, scales, opacities, sh_colors, viewmat, Kmat, background,
    *, width: int, height: int, sh_degree: int, tile: int,
):
    """Dense reference: every gaussian against every pixel, O(H*W*N).

    Memory- and compute-unbounded in N — for tests and small crops only."""
    N = means.shape[0]
    f32 = jnp.float32
    means2d, conic, depths, radii, alive, vd, _ = project_gaussians(
        means.astype(f32), quats.astype(f32), scales.astype(f32),
        opacities.astype(f32).reshape(-1), viewmat.astype(f32),
        Kmat.astype(f32), width, height,
    )
    rgb = eval_sh(sh_colors.astype(f32), vd, sh_degree)
    opac = opacities.astype(f32).reshape(-1)

    order = lax.sort(
        (jnp.where(alive, depths, jnp.inf), jnp.arange(N, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )[1]
    mx, my = means2d[order, 0], means2d[order, 1]
    A, B, Cc = conic[order, 0], conic[order, 1], conic[order, 2]
    col = rgb[order]
    op = opac[order]
    ok = alive[order]
    r = radii[order]

    # tile-membership cutoff, replicated exactly: the tiled program
    # evaluates a gaussian on every pixel of every tile its footprint bbox
    # covers, and the 3-sigma tail can still exceed the 1/255 alpha cutoff
    # — so the dense golden must apply the *same* square cutoff (for the
    # same tile size), not a radius test, for tiled == dense parity.
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    tx0, tx1, ty0, ty1 = _tile_bbox(mx, my, r, tile, tiles_x, tiles_y)

    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1).astype(jnp.int32)
    py = ys.reshape(-1).astype(jnp.int32)
    pxf = px.astype(f32) + 0.5                          # (P,)
    pyf = py.astype(f32) + 0.5
    dx = pxf[:, None] - mx[None, :]                     # (P, N)
    dy = pyf[:, None] - my[None, :]
    ptx = (px // tile)[:, None]
    pty = (py // tile)[:, None]
    inside = (
        (ptx >= tx0[None, :])
        & (ptx <= tx1[None, :])
        & (pty >= ty0[None, :])
        & (pty <= ty1[None, :])
    )
    power = -0.5 * (A[None, :] * dx * dx + Cc[None, :] * dy * dy) - B[None, :] * dx * dy
    alpha = jnp.minimum(op[None, :] * jnp.exp(jnp.minimum(power, 0.0)), _ALPHA_MAX)
    alpha = jnp.where(
        ok[None, :] & inside & (power <= 0) & (alpha >= _ALPHA_MIN), alpha, 0.0
    )
    one_m = 1.0 - alpha
    t_excl = jnp.concatenate(
        [jnp.ones_like(one_m[:, :1]), jnp.cumprod(one_m, axis=1)[:, :-1]], axis=1
    )
    w = alpha * t_excl
    img = w @ col + (t_excl[:, -1] * one_m[:, -1])[:, None] * background[None, :]
    return img.reshape(height, width, 3)


def _probe_bbox(means, quats, scales, opacities, viewmat, Kmat,
                width, height, tile):
    """Shared probe preamble: projection + tile bboxes (THE bbox formula,
    _tile_bbox) — both budget probes must see exactly what the binning
    pass sees."""
    f32 = jnp.float32
    means2d, conic, depths, radii, alive, vd, _ = project_gaussians(
        means.astype(f32), quats.astype(f32), scales.astype(f32),
        opacities.astype(f32).reshape(-1), viewmat.astype(f32),
        Kmat.astype(f32), width, height,
    )
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    mx, my, r = means2d[:, 0], means2d[:, 1], radii
    tx0, tx1, ty0, ty1 = _tile_bbox(mx, my, r, tile, tiles_x, tiles_y)
    tw = tx1 - tx0 + 1
    n_cover = jnp.where(alive, tw * (ty1 - ty0 + 1), 0)
    return mx, my, conic, tx0, ty0, tw, n_cover


@partial(jax.jit, static_argnames=("width", "height", "tile"))
def _max_tile_cover(means, quats, scales, opacities, viewmat, Kmat, *,
                    width, height, tile):
    """Max tiles any alive gaussian covers in this view (same bbox formula
    as the binning pass). A tiny program used to pick the duplication-grid
    budget adaptively."""
    _, _, _, _, _, _, n_cover = _probe_bbox(
        means, quats, scales, opacities, viewmat, Kmat, width, height, tile
    )
    return jnp.max(n_cover)


@partial(jax.jit, static_argnames=("width", "height", "tile", "m"))
def _max_valid_cover(means, quats, scales, opacities, viewmat, Kmat, *,
                     width, height, tile, m):
    """Max per-gaussian count of entries SURVIVING the exact-zero cull
    (same formula as the binning pass via _cull_mask) — the compaction
    width probe. ``m`` is the bbox budget the enumeration runs at (the
    budget must be computed first: the enumeration width is a static
    shape, so the two probes are inherently separate programs)."""
    mx, my, conic, tx0, ty0, tw, n_cover = _probe_bbox(
        means, quats, scales, opacities, viewmat, Kmat, width, height, tile
    )
    j = jnp.arange(m, dtype=jnp.int32)[None, :]
    tw_s = jnp.maximum(tw, 1)[:, None]
    ety = ty0[:, None] + j // tw_s
    etx = tx0[:, None] + j % tw_s
    e_valid = j < n_cover[:, None]
    e_valid &= _cull_mask(
        mx, my, conic[:, 0], conic[:, 1], conic[:, 2],
        opacities.astype(jnp.float32).reshape(-1), etx, ety, tile,
    )
    return jnp.max(jnp.sum(e_valid, axis=1))


def auto_tile_budget(means, quats, scales, opacities, viewmat, Kmat, *,
                     width: int, height: int, tile: int = 16,
                     cap: int = 256) -> int:
    """Adaptive ``max_tiles_per_gauss``: the view's actual per-gaussian max
    tile coverage, rounded up to a power of two (floor 4, capped).

    Typical voxel-grid scenes have tiny splats (coverage 1-4), so the
    binning sort's E = N * budget shrinks 4-8x vs the generous static
    default while keeping the zero-overflow exactness guarantee (budget >=
    the true max, so ``dup_clipped == 0``). One compiled program per
    distinct power of two."""
    need = int(_max_tile_cover(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(viewmat), jnp.asarray(Kmat),
        width=width, height=height, tile=tile,
    ))
    budget = 4
    while budget < need and budget < cap:
        budget *= 2
    return budget


def rasterize_gaussians(
    means,
    quats,
    scales,
    opacities,
    colors,
    viewmat,
    Kmat,
    width: int,
    height: int,
    sh_degree: Optional[int] = None,
    background: Optional[np.ndarray] = None,
    tile: int = 16,
    max_tiles_per_gauss=32,
    max_per_tile: int = 1024,
    chunk: int = 128,
) -> Tuple[np.ndarray, RasterMeta]:
    """Render one view of a 3DGS scene on the default JAX backend.

    Args:
        means/quats/scales/opacities: (N,3)/(N,4 wxyz)/(N,3 linear)/(N,)
            gaussian parameters (activations already applied, the pipeline
            contract — ``/root/reference/python/test_voxelize_3dgs.py:58-114``).
        colors: (N, 3K) flat or (N, K, 3) SH coefficients (K = 1 is the
            DC-only case: ``rgb = max(C0 * sh + 0.5, 0)``).
        viewmat: (4, 4) world-to-camera; Kmat: (3, 3) pinhole intrinsics.
        sh_degree: SH degree; inferred from K when None (K=1 -> degree 0).
        background: (3,) color, white default (reference parity).
        tile / max_tiles_per_gauss / max_per_tile / chunk: capacity knobs;
            overflow counts are returned in :class:`RasterMeta`.
            ``max_tiles_per_gauss="auto"`` measures this view's actual max
            coverage first (:func:`auto_tile_budget`) — smaller binning
            sort, still exact.

    Returns:
        (image (H, W, 3) float32 numpy array, RasterMeta of device
        scalars — convert with ``int(...)`` to inspect).
    """
    compact_tiles = None
    if max_tiles_per_gauss == "auto":
        max_tiles_per_gauss = auto_tile_budget(
            means, quats, scales, opacities, viewmat, Kmat,
            width=width, height=height, tile=tile,
        )
        if (os.environ.get("RAHT3DGS_RASTER_CULL", "1") not in ("", "0")
                and os.environ.get("RAHT3DGS_RASTER_COMPACT", "1")
                not in ("", "0")):
            # default-on (bitwise exact): shrink the binning sort to the
            # post-cull width. Measured on v5e, 131k all-needle scene:
            # 115.1 -> 75.7 ms/view (mtpg=128 -> compact 32); a no-op
            # (null) on isotropic scenes where post-cull max coverage
            # stays at the budget. RAHT3DGS_RASTER_COMPACT=0 disables.
            need = int(_max_valid_cover(
                jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
                jnp.asarray(opacities), jnp.asarray(viewmat),
                jnp.asarray(Kmat), width=width, height=height, tile=tile,
                m=max_tiles_per_gauss,
            ))
            c = 4
            while c < need:
                c *= 2
            if c < max_tiles_per_gauss:
                compact_tiles = c
    sh, inferred = _colors_to_sh(jnp.asarray(colors))
    if sh_degree is None:
        sh_degree = inferred
    if background is None:
        background = np.ones((3,), np.float32)
    img, meta = _rasterize_tiled(
        jnp.asarray(means),
        jnp.asarray(quats),
        jnp.asarray(scales),
        jnp.asarray(opacities),
        sh,
        jnp.asarray(viewmat),
        jnp.asarray(Kmat),
        jnp.asarray(background, dtype=jnp.float32),
        width=width,
        height=height,
        sh_degree=sh_degree,
        tile=tile,
        max_tiles_per_gauss=max_tiles_per_gauss,
        max_per_tile=max_per_tile,
        chunk=chunk,
        compact_tiles=compact_tiles,
    )
    return np.asarray(img), meta


def rasterize_dense(
    means, quats, scales, opacities, colors, viewmat, Kmat,
    width: int, height: int, sh_degree: Optional[int] = None,
    background: Optional[np.ndarray] = None, tile: int = 16,
):
    """Dense (un-tiled) golden renderer — O(H*W*N), small scenes only.

    ``tile`` must match the tiled call under comparison: the per-gaussian
    evaluation cutoff is tile-bbox membership, which depends on the tile
    size."""
    sh, inferred = _colors_to_sh(jnp.asarray(colors))
    if sh_degree is None:
        sh_degree = inferred
    if background is None:
        background = np.ones((3,), np.float32)
    return _rasterize_dense_jit(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), sh, jnp.asarray(viewmat), jnp.asarray(Kmat),
        jnp.asarray(background, dtype=jnp.float32),
        width=width, height=height, sh_degree=sh_degree, tile=tile,
    )
