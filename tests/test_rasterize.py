"""TPU-native 3DGS rasterizer: tiled vs dense parity + analytic checks.

The tiled program (sort/searchsorted binning + cumprod compositing) must
produce the same image as the dense per-pixel golden whenever no capacity
limit is hit; compositing, SH evaluation, and depth ordering are pinned
against closed-form expectations.
"""

import numpy as np
import pytest

from raht3dgs_tpu.eval.cameras import generate_random_cameras
from raht3dgs_tpu.eval.rasterize import (
    eval_sh,
    rasterize_dense,
    rasterize_gaussians,
)


def _random_scene(rng, n, sh_k=1, spread=1.0, scale_lo=0.02, scale_hi=0.12):
    means = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(scale_lo, scale_hi, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 1.0, size=(n,)).astype(np.float32)
    colors = rng.normal(0, 0.5, size=(n, sh_k * 3)).astype(np.float32)
    return means, quats, scales, opac, colors


def _front_cam(dist=3.0, width=64, height=64, focal_mult=1.2):
    """Camera at -z looking at the origin (+z forward)."""
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[2, 3] = dist  # world origin maps to z = dist in camera frame
    K = np.array(
        [
            [focal_mult * width, 0, width / 2],
            [0, focal_mult * width, height / 2],
            [0, 0, 1],
        ],
        dtype=np.float32,
    )
    return viewmat, K


@pytest.mark.parametrize("sh_k", [1, 16])
def test_tiled_matches_dense(rng, sh_k):
    n = 160
    means, quats, scales, opac, colors = _random_scene(rng, n, sh_k=sh_k)
    viewmats, Ks, W, H = generate_random_cameras(
        np.zeros(3), 2.5, n_views=2, image_width=64, image_height=64, seed=3
    )
    for i in range(len(viewmats)):
        img, meta = rasterize_gaussians(
            means, quats, scales, opac, colors, viewmats[i], Ks[i], W, H
        )
        assert int(meta.dup_clipped) == 0 and int(meta.tile_clipped) == 0
        ref = rasterize_dense(
            means, quats, scales, opac, colors, viewmats[i], Ks[i], W, H
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)


def test_tiled_matches_dense_super_unit_opacity(rng):
    """Opacities above the ALPHA_MAX clamp widen every splat's visible
    footprint (alpha = min(o*exp(power), ALPHA_MAX) clears the 1/255
    cutoff further out); the tile-cull bound must use the RAW opacity or
    it silently drops those tail pixels (regression: the bound once
    clamped o at ALPHA_MAX, eating the 2x safety factor for o in
    (ALPHA_MAX, 2) and under-culling beyond)."""
    # Exposing geometry: one isotropic splat, screen sigma ~6px at the
    # center of a 64x64 image with 16px tiles.  Its 3-sigma bbox reaches
    # the image's corner tiles, whose pixel rectangles sit ~3.9 sigma
    # away (diagonal) — beyond the clamped threshold (~3.53 sigma) but
    # inside the raw-opacity threshold (~4.47 sigma at o=42), where
    # alpha = 42*exp(-7.55) ~ 0.02 is far above the 1/255 cutoff.
    viewmat, K = _front_cam()  # dist 3, focal 76.8 -> sigma = 76.8*s/3
    means = np.zeros((1, 3), np.float32)
    quats = np.array([[1.0, 0, 0, 0]], np.float32)
    s = 6.0 * 3.0 / 76.8
    scales = np.full((1, 3), s, np.float32)
    opac = np.array([42.0], np.float32)
    colors = np.array([[0.9, 0.3, 0.2]], np.float32)
    img, meta = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 64, 64
    )
    assert int(meta.dup_clipped) == 0 and int(meta.tile_clipped) == 0
    ref = rasterize_dense(means, quats, scales, opac, colors, viewmat, K, 64, 64)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)

    # and a full random scene with super-unit opacities
    means, quats, scales, opac, colors = _random_scene(rng, 96)
    opac = (opac * 40.0 + 2.0).astype(np.float32)  # all >= 2 > ALPHA_MAX
    img, meta = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 64, 64
    )
    assert int(meta.dup_clipped) == 0 and int(meta.tile_clipped) == 0
    ref = rasterize_dense(means, quats, scales, opac, colors, viewmat, K, 64, 64)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)


def test_tiled_matches_dense_nonmultiple_size(rng):
    """Image sizes that are not tile multiples crop correctly."""
    means, quats, scales, opac, colors = _random_scene(rng, 120)
    viewmat, K = _front_cam(width=70, height=50)
    img, meta = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 70, 50
    )
    assert img.shape == (50, 70, 3)
    ref = rasterize_dense(means, quats, scales, opac, colors, viewmat, K, 70, 50)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)


def test_two_gaussian_compositing_closed_form():
    """C = a1 c1 + (1-a1) a2 c2 + (1-a1)(1-a2) bg at the shared center."""
    # two isotropic gaussians stacked along the view axis at the origin
    means = np.array([[0, 0, 0], [0, 0, 0.5]], np.float32)  # z=0 nearer to cam at -3
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
    scales = np.full((2, 3), 0.3, np.float32)
    opac = np.array([0.6, 0.7], np.float32)
    # SH DC for exact colors red / blue: rgb = C0 * sh + 0.5
    C0 = 0.28209479177387814
    c1 = np.array([1.0, 0.25, 0.25])
    c2 = np.array([0.25, 0.25, 1.0])
    colors = np.stack([(c1 - 0.5) / C0, (c2 - 0.5) / C0]).astype(np.float32)

    W = H = 32
    viewmat, K = _front_cam(dist=3.0, width=W, height=H)
    img, meta = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, W, H
    )
    img = np.asarray(img)

    # center pixel (W/2 - 0.5 offset => pixel index W//2 - 1 and W//2 straddle
    # the center; use the analytic alpha at the actual pixel sample position)
    for px, py in [(W // 2, H // 2), (W // 2 - 1, H // 2 - 1)]:
        x = px + 0.5 - K[0, 2]
        y = py + 0.5 - K[1, 2]

        def alpha_at(z_world, op):
            z = 3.0 + z_world
            sigma2 = (K[0, 0] * 0.3 / z) ** 2 + 0.3  # isotropic + dilation
            d2 = x * x + y * y
            return min(0.999, op * np.exp(-0.5 * d2 / sigma2))

        a1 = alpha_at(0.0, 0.6)
        a2 = alpha_at(0.5, 0.7)
        expect = a1 * c1 + (1 - a1) * a2 * c2 + (1 - a1) * (1 - a2) * 1.0
        np.testing.assert_allclose(img[py, px], expect, atol=1e-3)


def test_depth_ordering_front_wins():
    """An opaque front gaussian hides one behind it regardless of input order."""
    means = np.array([[0, 0, 0.8], [0, 0, 0.0]], np.float32)  # [0] is FARTHER
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
    scales = np.full((2, 3), 0.25, np.float32)
    opac = np.array([1.0, 1.0], np.float32)
    C0 = 0.28209479177387814
    far_c = np.array([1.0, 0.0, 0.0])
    near_c = np.array([0.0, 1.0, 0.0])
    colors = np.stack([(far_c - 0.5) / C0, (near_c - 0.5) / C0]).astype(np.float32)
    viewmat, K = _front_cam(dist=2.5, width=32, height=32)
    img, _ = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 32, 32
    )
    center = np.asarray(img)[16, 16]
    assert center[1] > 0.9 and center[0] < 0.1  # near (green) wins


def test_sh_evaluation_matches_direct_formula(rng):
    n = 50
    sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(eval_sh(sh, d, 3))

    # independent direct evaluation (classic 3DGS CUDA constant table)
    x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
    basis = np.concatenate(
        [
            np.full_like(x, 0.28209479177387814),
            -0.4886025119029199 * y,
            0.4886025119029199 * z,
            -0.4886025119029199 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.31539156525252005 * (2 * zz - xx - yy),
            -1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
            -0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * xy * z,
            -0.4570457994644658 * y * (4 * zz - xx - yy),
            0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy),
            -0.4570457994644658 * x * (4 * zz - xx - yy),
            1.445305721320277 * z * (xx - yy),
            -0.5900435899266435 * x * (xx - 3 * yy),
        ],
        axis=1,
    )  # (n, 16)
    want = np.maximum(np.einsum("nk,nkc->nc", basis, sh) + 0.5, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_overflow_counters(rng):
    """Capacity overflows are reported, never silent."""
    # one huge gaussian covering many tiles
    means = np.zeros((1, 3), np.float32)
    quats = np.array([[1, 0, 0, 0]], np.float32)
    scales = np.full((1, 3), 2.0, np.float32)
    opac = np.array([1.0], np.float32)
    colors = np.zeros((1, 3), np.float32)
    viewmat, K = _front_cam(dist=3.0, width=64, height=64)
    _, meta = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 64, 64,
        max_tiles_per_gauss=1,
    )
    assert int(meta.dup_clipped) > 0

    # many gaussians in one tile
    means = rng.normal(0, 0.01, size=(8, 3)).astype(np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (8, 1))
    scales = np.full((8, 3), 0.02, np.float32)
    opac = np.full((8,), 0.9, np.float32)
    colors = np.zeros((8, 3), np.float32)
    _, meta = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 64, 64, max_per_tile=2
    )
    assert int(meta.tile_clipped) > 0


def test_empty_and_behind_camera_scene():
    """All-culled scenes render pure background."""
    means = np.array([[0, 0, -10.0]], np.float32)  # behind the camera
    quats = np.array([[1, 0, 0, 0]], np.float32)
    scales = np.full((1, 3), 0.1, np.float32)
    opac = np.array([1.0], np.float32)
    colors = np.zeros((1, 3), np.float32)
    viewmat, K = _front_cam(dist=3.0, width=32, height=32)
    img, meta = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 32, 32
    )
    np.testing.assert_allclose(np.asarray(img), 1.0, atol=1e-6)


def test_anisotropic_rotation_changes_footprint(rng):
    """A rotated anisotropic gaussian must render differently from unrotated."""
    means = np.zeros((1, 3), np.float32)
    scales = np.array([[0.5, 0.02, 0.02]], np.float32)
    opac = np.array([1.0], np.float32)
    colors = np.array([[-1.0, -1.0, -1.0]], np.float32)  # dark
    viewmat, K = _front_cam(dist=3.0, width=64, height=64)
    qid = np.array([[1, 0, 0, 0]], np.float32)
    # 90 degrees about the view axis (z): (w, x, y, z)
    qz = np.array([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]], np.float32)
    img_a, _ = rasterize_gaussians(means, qid, scales, opac, colors, viewmat, K, 64, 64)
    img_b, _ = rasterize_gaussians(means, qz, scales, opac, colors, viewmat, K, 64, 64)
    a = np.asarray(img_a)
    b = np.asarray(img_b)
    # horizontal streak vs vertical streak: the long axis is darker off-center
    assert a[32, 8, 0] < a[8, 32, 0] - 0.05
    assert b[8, 32, 0] < b[32, 8, 0] - 0.05
    # and the rotation is an exact transpose of the image for this symmetry
    np.testing.assert_allclose(a, np.swapaxes(b, 0, 1), atol=1e-5)


def test_render_comparison_jax_backend(rng):
    """render_comparison wires the volumetric backend end to end."""
    from raht3dgs_tpu.eval.render import render_comparison

    n = 80
    means, quats, scales, opac, colors = _random_scene(rng, n, sh_k=4)
    params = {
        "means": means,
        "quats": quats,
        "scales": scales,
        "opacities": opac,
        "colors": colors,
    }
    res_same = render_comparison(params, params, n_views=2, image_size=48,
                                 backend="jax")
    assert res_same["backend"] == "jax"
    assert res_same["psnr_avg"] == float("inf") or res_same["psnr_avg"] > 80

    params2 = dict(params)
    params2["means"] = means + rng.normal(0, 0.05, means.shape).astype(np.float32)
    res_diff = render_comparison(params, params2, n_views=2, image_size=48,
                                 backend="jax")
    assert np.isfinite(res_diff["psnr_avg"])
    assert res_diff["psnr_avg"] < 60


def test_sharded_views_match_sequential(rng):
    """View-sharded rendering over the 8-device mesh == sequential renders."""
    from raht3dgs_tpu.parallel.render import render_views_sharded
    from raht3dgs_tpu.parallel.sharding import make_mesh

    n = 100
    means, quats, scales, opac, colors = _random_scene(rng, n, sh_k=4)
    viewmats, Ks, W, H = generate_random_cameras(
        np.zeros(3), 2.5, n_views=5, image_width=48, image_height=48, seed=9
    )  # 5 views over 8 devices exercises the padding path
    mesh = make_mesh(8)
    imgs, meta = render_views_sharded(
        means, quats, scales, opac, colors, viewmats, Ks, W, H, mesh=mesh
    )
    assert imgs.shape == (5, H, W, 3)
    assert meta.dup_clipped.shape == (5,)
    for i in range(5):
        ref, _ = rasterize_gaussians(
            means, quats, scales, opac, colors, viewmats[i], Ks[i], W, H
        )
        np.testing.assert_allclose(imgs[i], np.asarray(ref), atol=1e-5)


def test_volumetric_render_auto_retry_on_overflow(rng):
    """volumetric_render bumps capacity and re-renders overflowing views."""
    import warnings as _warnings

    from raht3dgs_tpu.eval.render import volumetric_render
    from raht3dgs_tpu.eval.cameras import generate_random_cameras

    # a dense clump forces max_per_tile overflow at the default-less caps?
    # use a tight cluster so the default 1024/tile would be fine, then
    # monkey the path by rendering MANY gaussians into one tile
    n = 1500
    means = rng.normal(0, 0.004, size=(n, 3)).astype(np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 0.002, np.float32)
    opac = np.full((n,), 0.05, np.float32)
    colors = rng.normal(0, 0.2, size=(n, 3)).astype(np.float32)
    params = {"means": means, "quats": quats, "scales": scales,
              "opacities": opac, "colors": colors}
    viewmats, Ks, W, H = generate_random_cameras(
        np.zeros(3), 1.5, n_views=1, image_width=32, image_height=32, seed=1
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # any overflow warning -> failure
        imgs = volumetric_render(params, viewmats, Ks, W, H)
    assert imgs.shape == (1, H, W, 3)


def test_tiled_matches_dense_fuzz():
    """Hypothesis sweep: tiled == dense across image sizes, tile sizes, and
    scene spreads (compile cost bounded by reusing few distinct shapes)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        wh=st.sampled_from([(48, 48), (64, 32), (50, 70)]),
        tile=st.sampled_from([16, 32]),
        sh_k=st.sampled_from([1, 4]),
        spread=st.floats(0.3, 1.5),
    )
    def check(seed, wh, tile, sh_k, spread):
        rng = np.random.default_rng(seed)
        W, H = wh
        means, quats, scales, opac, colors = _random_scene(
            rng, 100, sh_k=sh_k, spread=spread
        )
        viewmat, K = _front_cam(dist=2.5, width=W, height=H)
        img, meta = rasterize_gaussians(
            means, quats, scales, opac, colors, viewmat, K, W, H, tile=tile
        )
        if int(meta.dup_clipped) or int(meta.tile_clipped):
            return  # capacity-limited scenes are exercised elsewhere
        ref = rasterize_dense(
            means, quats, scales, opac, colors, viewmat, K, W, H, tile=tile
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=3e-5)

    check()


def test_auto_tile_budget_exact_and_tight():
    """'auto' max_tiles_per_gauss covers the view's true max coverage (so
    dup_clipped == 0 and the image equals the generous-budget render) while
    picking a smaller duplication grid for small-splat scenes."""
    from raht3dgs_tpu.eval.rasterize import auto_tile_budget

    rng = np.random.default_rng(5)
    means, quats, scales, opac, colors = _random_scene(rng, 150, sh_k=1,
                                                       spread=0.8)
    scales = scales * 0.3  # small splats: typical voxel-grid regime
    viewmat, K = _front_cam(dist=2.5, width=64, height=64)

    budget = auto_tile_budget(means, quats, scales, opac, viewmat, K,
                              width=64, height=64, tile=16)
    assert 4 <= budget <= 16  # 64x64/16px = 4x4 tiles; small splats

    img_auto, meta_auto = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 64, 64,
        max_tiles_per_gauss="auto",
    )
    assert int(meta_auto.dup_clipped) == 0
    img_big, meta_big = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, 64, 64,
        max_tiles_per_gauss=32,
    )
    assert int(meta_big.dup_clipped) == 0
    np.testing.assert_allclose(np.asarray(img_auto), np.asarray(img_big),
                               atol=3e-5)


def test_pair_sort_fallback_matches_packed(rng, monkeypatch):
    """The stable (tile, gauss) pair sort — the fallback for configs whose
    packed (tile, rank) key overflows 32 bits — must bin identically to
    the packed single-key sort (keys are unique, so the unstable packed
    sort is deterministic and order-equivalent)."""
    from raht3dgs_tpu.eval.rasterize import _rasterize_tiled

    W = H = 48
    scene = _random_scene(rng, 300, sh_k=1)
    viewmat, K = _front_cam(width=W, height=H)
    kw = dict(width=W, height=H)

    img_packed, meta_packed = rasterize_gaussians(
        *scene, viewmat, K, **kw)
    monkeypatch.setenv("RAHT3DGS_RASTER_PAIR_SORT", "1")
    _rasterize_tiled.clear_cache()
    try:
        img_pair, meta_pair = rasterize_gaussians(*scene, viewmat, K, **kw)
    finally:
        monkeypatch.delenv("RAHT3DGS_RASTER_PAIR_SORT")
        _rasterize_tiled.clear_cache()

    assert int(meta_packed.dup_clipped) == int(meta_pair.dup_clipped)
    assert int(meta_packed.tile_clipped) == int(meta_pair.tile_clipped)
    np.testing.assert_array_equal(img_packed, img_pair)


def test_tile_cull_matches_uncull(rng, monkeypatch):
    """Per-entry tile culling (drop entries whose alpha bound over the
    tile's pixel-center rect is provably below the 1/255 cutoff) removes
    only exact-zero contributions — the image may differ from the uncull
    program solely by f32 reduction regrouping (segment compaction shifts
    entries across blend-chunk boundaries), so it must agree to ~1e-6,
    far below the tiled==dense tolerance.  Big anisotropic splats make
    the bbox corner tiles the interesting case."""
    from raht3dgs_tpu.eval.rasterize import _rasterize_tiled

    W = H = 64
    scene = _random_scene(rng, 250, sh_k=4, scale_lo=0.02, scale_hi=0.5)
    viewmat, K = _front_cam(width=W, height=H)
    kw = dict(width=W, height=H, max_tiles_per_gauss=64)

    img_cull, meta_cull = rasterize_gaussians(*scene, viewmat, K, **kw)
    monkeypatch.setenv("RAHT3DGS_RASTER_CULL", "0")
    _rasterize_tiled.clear_cache()
    try:
        img_full, meta_full = rasterize_gaussians(*scene, viewmat, K, **kw)
    finally:
        monkeypatch.delenv("RAHT3DGS_RASTER_CULL")
        _rasterize_tiled.clear_cache()

    assert int(meta_cull.dup_clipped) == int(meta_full.dup_clipped)
    # culling frees capacity, so it can only reduce tile overflow
    assert int(meta_cull.tile_clipped) <= int(meta_full.tile_clipped)
    np.testing.assert_allclose(img_cull, img_full, atol=2e-6)


def test_compaction_bitwise_identical(rng, monkeypatch):
    """Entry compaction (RAHT3DGS_RASTER_COMPACT with auto budgets) keeps
    the surviving (tile, depth-rank) stream identical, so the image must be
    BITWISE equal to the uncompacted program — and actually engage on a
    scene with elongated splats (post-cull width < bbox width)."""
    from raht3dgs_tpu.eval.rasterize import _max_valid_cover, auto_tile_budget
    import jax.numpy as jnp

    # diagonal needles: the anisotropic cull shrinks the post-cull width
    # far below the bbox budget, so compaction genuinely engages
    n = 60
    means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    means[:, 2] *= 0.2
    a = np.pi / 4
    quats = np.tile([np.cos(a / 2), 0, 0, np.sin(a / 2)],
                    (n, 1)).astype(np.float32)
    scales = np.tile([0.6, 0.008, 0.008], (n, 1)).astype(np.float32)
    opac = np.full(n, 0.9, np.float32)
    colors = rng.normal(0, 0.5, size=(n, 3)).astype(np.float32)
    W = H = 256
    viewmat, K = _front_cam(width=W, height=H)
    budget = auto_tile_budget(means, quats, scales, opac, viewmat, K,
                              width=W, height=H, tile=16)
    need = int(_max_valid_cover(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(viewmat), jnp.asarray(K),
        width=W, height=H, tile=16, m=budget,
    ))
    c = 4
    while c < need:
        c *= 2
    assert c < budget, (need, budget)  # the feature must actually engage

    base, meta0 = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, W, H,
        max_tiles_per_gauss="auto",
    )
    monkeypatch.setenv("RAHT3DGS_RASTER_COMPACT", "1")
    comp, meta1 = rasterize_gaussians(
        means, quats, scales, opac, colors, viewmat, K, W, H,
        max_tiles_per_gauss="auto",
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(comp))
    assert int(meta1.dup_clipped) == 0 and int(meta1.tile_clipped) == 0
    # sanity: the compacted program also still matches the dense golden
    ref = rasterize_dense(means, quats, scales, opac, colors, viewmat, K,
                          W, H)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(ref), atol=2e-5)


def test_compaction_forced_width_counts_clipping(rng):
    """A compact width smaller than the true post-cull need must COUNT the
    dropped valid entries (never silent)."""
    from raht3dgs_tpu.eval.rasterize import _rasterize_tiled
    import jax.numpy as jnp

    n = 120
    means, quats, scales, opac, colors = _random_scene(rng, n)
    scales[:, 0] *= 8.0
    viewmat, K = _front_cam()
    img, meta = _rasterize_tiled(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors).reshape(n, 1, 3),
        jnp.asarray(viewmat), jnp.asarray(K),
        jnp.ones(3, dtype=np.float32),
        width=64, height=64, sh_degree=0, tile=16,
        max_tiles_per_gauss=32, max_per_tile=1024, chunk=128,
        compact_tiles=4,
    )
    assert int(meta.dup_clipped) > 0
