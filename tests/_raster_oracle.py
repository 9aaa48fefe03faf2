"""Independent brute-force 3DGS rasterizer oracle (pure numpy).

PURPOSE: an external correctness oracle for ``eval/rasterize.py``. All 18
rasterizer tests pin tiled == dense, but both paths share the projection /
conic / SH code — a shared bug passes tiled == dense. The reference's own
oracle is gsplat itself (`/root/reference/python/quality_eval.py:318-353`),
which needs CUDA; this module re-derives the entire image-formation model
from first principles with NO imports from ``raht3dgs_tpu.eval.rasterize``:

- quaternion -> rotation via the outer-product/cross-matrix identity
  ``R = (w^2 - |v|^2) I + 2 v v^T + 2 w [v]_x`` (the production code uses
  the expanded component formula);
- 2D covariance by explicitly building the full 2x3 transform ``T = J W``
  and conics by inverting the 2x2 matrix per gaussian with numpy's
  ``np.linalg.inv`` (production: hand-rolled adjugate over determinant);
- footprint radius from ``np.linalg.eigvalsh`` (production: closed-form
  trace/determinant eigenvalue);
- spherical harmonics evaluated from the associated Legendre recurrence
  with the Condon-Shortley phase (scipy ``lpmv``) and the standard real-SH
  normalization — NOT from the hardcoded svox2/plenoxels constant table
  the production ``eval_sh`` uses, so a typo'd table constant or sign is
  caught;
- per-pixel front-to-back alpha blending as an explicit Python loop over
  depth-sorted gaussians (production: batched exclusive cumprod).

Blend semantics shared with the production dense golden (the contract both
must satisfy, gsplat parity): pixel centers at +0.5; ``alpha =
min(0.999, o * exp(power))`` with ``power = -0.5 d^T Cov'^{-1} d`` killed
when ``power > 0`` or ``alpha < 1/255``; a gaussian contributes only to
pixels of tiles inside its footprint's tile bounding box (3-sigma radius,
``ceil``); near plane 0.01; ``eps2d = 0.3`` dilation; gsplat's 1.3x
tangent-plane clamp in the Jacobian; white-background compositing
``img = sum w_i c_i + T_final * bg``.
"""

from __future__ import annotations

import math

import numpy as np

_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.999
_NEAR = 0.01
_EPS2D = 0.3


def _rotmats(quats: np.ndarray) -> np.ndarray:
    """R = (w^2 - |v|^2) I + 2 v v^T + 2 w [v]_x  (column-vector action)."""
    q = np.asarray(quats, dtype=np.float64)
    n = np.linalg.norm(q, axis=1, keepdims=True)
    q = np.where(n > 1e-12, q / np.where(n > 1e-12, n, 1.0),
                 np.array([1.0, 0.0, 0.0, 0.0])[None])
    out = np.empty((len(q), 3, 3))
    for i, (w, x, y, z) in enumerate(q):
        v = np.array([x, y, z])
        vx = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], dtype=np.float64)
        out[i] = (w * w - v @ v) * np.eye(3) + 2.0 * np.outer(v, v) + 2.0 * w * vx
    return out


def _real_sh(l: int, m: int, dirs: np.ndarray) -> np.ndarray:
    """Real spherical harmonic Y_{l,m} with the Condon-Shortley phase
    (the svox2/plenoxels/3DGS convention), from the associated Legendre
    functions — an independent derivation of the constant table."""
    from scipy.special import lpmv

    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    # lpmv includes the Condon-Shortley (-1)^m factor already
    ct = np.clip(z, -1.0, 1.0)
    phi = np.arctan2(y, x)
    am = abs(m)
    norm = math.sqrt(
        (2 * l + 1) / (4.0 * math.pi)
        * math.factorial(l - am) / math.factorial(l + am)
    )
    P = lpmv(am, l, ct)
    if m > 0:
        return math.sqrt(2.0) * norm * P * np.cos(am * phi)
    if m < 0:
        return math.sqrt(2.0) * norm * P * np.sin(am * phi)
    return norm * P


def eval_sh_oracle(sh: np.ndarray, dirs: np.ndarray, degree: int) -> np.ndarray:
    """(N, K, 3) SH coefficients + (N, 3) unit dirs -> (N, 3) RGB.

    3DGS convention: coefficients ordered (l, m) with m = -l..l, color =
    ``max(sum c_lm Y_lm + 0.5, 0)``. Degree 0 keeps the DC-only form."""
    sh = np.asarray(sh, dtype=np.float64)
    dirs = np.asarray(dirs, dtype=np.float64)
    res = np.zeros((len(sh), 3))
    k = 0
    for l in range(degree + 1):
        for m in range(-l, l + 1):
            basis = _real_sh(l, m, dirs)          # (N,)
            res += basis[:, None] * sh[:, k, :]
            k += 1
    return np.maximum(res + 0.5, 0.0)


def render_oracle(
    means, quats, scales, opacities, sh_colors, viewmat, Kmat,
    width: int, height: int, sh_degree: int,
    background=None, tile: int = 16,
) -> np.ndarray:
    """Brute-force per-pixel renderer. Returns (H, W, 3) float64."""
    means = np.asarray(means, dtype=np.float64)
    quats = np.asarray(quats, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    op = np.asarray(opacities, dtype=np.float64).reshape(-1)
    viewmat = np.asarray(viewmat, dtype=np.float64)
    Kmat = np.asarray(Kmat, dtype=np.float64)
    bg = np.ones(3) if background is None else np.asarray(background, float)
    N = len(means)

    W_r = viewmat[:3, :3]
    t_w2c = viewmat[:3, 3]
    cam = means @ W_r.T + t_w2c[None, :]
    depths = cam[:, 2]

    fx, fy = Kmat[0, 0], Kmat[1, 1]
    cx, cy = Kmat[0, 2], Kmat[1, 2]

    R3 = _rotmats(quats)
    mean2d = np.zeros((N, 2))
    conics = np.zeros((N, 3))          # inverse-covariance (A, B, C)
    radii = np.zeros(N)
    alive = np.zeros(N, dtype=bool)
    lim_x = 1.3 * (width / 2.0) / fx
    lim_y = 1.3 * (height / 2.0) / fy
    for i in range(N):
        z = depths[i]
        if z <= _NEAR or op[i] <= 0.0:
            continue
        S = np.diag(scales[i])
        M3 = R3[i] @ S
        Sigma = M3 @ M3.T                       # world covariance
        Mc = W_r @ Sigma @ W_r.T                # camera-frame covariance
        tx = z * min(max(cam[i, 0] / z, -lim_x), lim_x)
        ty = z * min(max(cam[i, 1] / z, -lim_y), lim_y)
        J = np.array([
            [fx / z, 0.0, -fx * tx / (z * z)],
            [0.0, fy / z, -fy * ty / (z * z)],
        ])
        cov2 = J @ Mc @ J.T + _EPS2D * np.eye(2)
        det = np.linalg.det(cov2)
        if det <= 0:
            continue
        inv = np.linalg.inv(cov2)
        lam_max = np.linalg.eigvalsh(cov2)[-1]
        r = math.ceil(3.0 * math.sqrt(max(lam_max, 0.0)))
        if r <= 0:
            continue
        mx = fx * cam[i, 0] / z + cx
        my = fy * cam[i, 1] / z + cy
        if mx + r <= 0 or mx - r >= width or my + r <= 0 or my - r >= height:
            continue
        mean2d[i] = (mx, my)
        conics[i] = (inv[0, 0], inv[0, 1], inv[1, 1])
        radii[i] = r
        alive[i] = True

    cam_pos = -W_r.T @ t_w2c
    vd = means - cam_pos[None, :]
    vd = vd / np.maximum(np.linalg.norm(vd, axis=1, keepdims=True), 1e-12)
    rgb = eval_sh_oracle(sh_colors, vd, sh_degree)

    order = sorted(range(N), key=lambda i: (not alive[i], depths[i]))

    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    # tile-footprint bbox membership (the dense golden's documented cutoff)
    tb = {}
    for i in range(N):
        if not alive[i]:
            continue
        mx, my = mean2d[i]
        r = radii[i]
        tb[i] = (
            min(max(math.floor((mx - r) / tile), 0), tiles_x - 1),
            min(max(math.floor((mx + r) / tile), 0), tiles_x - 1),
            min(max(math.floor((my - r) / tile), 0), tiles_y - 1),
            min(max(math.floor((my + r) / tile), 0), tiles_y - 1),
        )

    img = np.zeros((height, width, 3))
    for py in range(height):
        for px in range(width):
            ptx, pty = px // tile, py // tile
            pxf, pyf = px + 0.5, py + 0.5
            trans = 1.0
            color = np.zeros(3)
            for i in order:
                if not alive[i]:
                    break              # sorted: dead gaussians at the end
                tx0, tx1, ty0, ty1 = tb[i]
                if not (tx0 <= ptx <= tx1 and ty0 <= pty <= ty1):
                    continue
                dx = pxf - mean2d[i, 0]
                dy = pyf - mean2d[i, 1]
                A, B, C = conics[i]
                power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
                if power > 0:
                    continue
                alpha = min(op[i] * math.exp(power), _ALPHA_MAX)
                if alpha < _ALPHA_MIN:
                    continue
                color += trans * alpha * rgb[i]
                trans *= 1.0 - alpha
                if trans < 1e-12:
                    break
            img[py, px] = color + trans * bg
    return img
