"""External oracle for the volumetric rasterizer.

The 18 tests in test_rasterize.py pin tiled == dense, but both share the
projection/conic/SH code, so a shared bug passes. ``tests/_raster_oracle.py``
re-derives the full image-formation model independently (numpy/scipy, no
imports from eval/rasterize): these tests pin the production renderer
against it end to end, so a projection-pipeline bug that tiled==dense
cannot see IS caught here. Recipe for the gsplat A/B on a CUDA host:
docs/rasterizer_oracle.md.
"""

import numpy as np
import pytest

from raht3dgs_tpu.eval.cameras import generate_random_cameras
from raht3dgs_tpu.eval.rasterize import eval_sh, rasterize_dense

from _raster_oracle import eval_sh_oracle, render_oracle
from test_rasterize import _front_cam, _random_scene


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_sh_table_vs_legendre_derivation(rng, degree):
    """The hardcoded svox2 SH constant table == real spherical harmonics
    derived from the associated Legendre recurrence (Condon-Shortley
    phase): a typo'd constant or flipped sign in either basis fails."""
    import jax.numpy as jnp

    K = (degree + 1) ** 2
    sh = rng.normal(size=(64, K, 3))
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ours = np.asarray(eval_sh(jnp.asarray(sh, jnp.float64), jnp.asarray(d), degree))
    np.testing.assert_allclose(ours, eval_sh_oracle(sh, d, degree), atol=1e-12)


def _compare(means, quats, scales, opac, colors, viewmat, K, W, H,
             sh_degree, max_tol, mean_tol):
    img = np.asarray(rasterize_dense(
        means, quats, scales, opac, colors, viewmat, K, W, H,
        sh_degree=sh_degree,
    ))
    sh = np.asarray(colors, dtype=np.float64).reshape(len(means), -1, 3)
    ref = render_oracle(
        means, quats, scales, opac, sh, viewmat, K, W, H, sh_degree
    )
    diff = np.abs(img - ref)
    assert diff.max() < max_tol, f"max {diff.max():.2e}"
    assert diff.mean() < mean_tol, f"mean {diff.mean():.2e}"


@pytest.mark.parametrize("sh_k", [1, 16])
def test_dense_matches_independent_oracle(rng, sh_k):
    """End-to-end: production dense render == independent numpy renderer
    (projection, conic, footprint, SH, blending all re-derived). f32 vs
    f64 rounding at the 1/255 alpha cutoff bounds the residual."""
    n = 120
    means, quats, scales, opac, colors = _random_scene(rng, n, sh_k=sh_k)
    viewmat, K = _front_cam(width=48, height=40)
    _compare(means, quats, scales, opac, colors, viewmat, K, 48, 40,
             sh_degree=int(np.sqrt(sh_k)) - 1, max_tol=5e-3, mean_tol=2e-4)


def test_dense_matches_oracle_random_cameras(rng):
    """Off-axis cameras exercise the full viewmat path (rotation +
    translation), not just the front-cam special case."""
    n = 90
    means, quats, scales, opac, colors = _random_scene(rng, n, sh_k=4)
    viewmats, Ks, W, H = generate_random_cameras(
        np.zeros(3), 2.5, n_views=2, image_width=40, image_height=40, seed=7
    )
    for i in range(len(viewmats)):
        _compare(means, quats, scales, opac, colors, viewmats[i], Ks[i],
                 W, H, sh_degree=1, max_tol=5e-3, mean_tol=2e-4)


def test_dense_matches_oracle_anisotropic(rng):
    """Needle-like splats stress the EWA Jacobian + conic inversion and
    the anisotropic footprint (where an isotropic-bound bug would hide)."""
    n = 60
    means, quats, scales, opac, colors = _random_scene(
        rng, n, sh_k=1, scale_lo=0.005, scale_hi=0.3
    )
    scales[:, 0] *= 0.05  # strong anisotropy
    viewmat, K = _front_cam(width=40, height=40)
    _compare(means, quats, scales, opac, colors, viewmat, K, 40, 40,
             sh_degree=0, max_tol=5e-3, mean_tol=2e-4)


def test_oracle_catches_injected_projection_bug(rng, monkeypatch):
    """Meta-test of discriminating power: a plausible projection bug
    (rotation transposed in the covariance, Sigma = R^T S S^T R) injected
    into the ORACLE makes the comparison fail loudly — i.e. the pin is
    tight enough to catch a real shared projection bug, which
    tiled==dense never could."""
    import _raster_oracle as oracle_mod

    means, quats, scales, opac, colors = _random_scene(
        rng, 80, sh_k=1, scale_lo=0.02, scale_hi=0.25
    )
    scales[:, 2] *= 0.1  # anisotropy makes orientation observable
    viewmat, K = _front_cam(width=40, height=40)
    img = np.asarray(rasterize_dense(
        means, quats, scales, opac, colors, viewmat, K, 40, 40, sh_degree=0
    ))
    good = oracle_mod._rotmats
    monkeypatch.setattr(
        oracle_mod, "_rotmats",
        lambda q: np.swapaxes(good(q), 1, 2),
    )
    bad = render_oracle(
        means, quats, scales, opac,
        np.asarray(colors, np.float64).reshape(len(means), -1, 3),
        viewmat, K, 40, 40, 0,
    )
    assert np.abs(img - bad).max() > 0.05
