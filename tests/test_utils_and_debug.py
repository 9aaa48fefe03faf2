import numpy as np

from raht3dgs_tpu.utils.checks import (
    block_indices,
    is_frame_morton_ordered,
    sanity_check_dc,
    signed_to_unsigned,
    unsigned_to_signed,
)
from raht3dgs_tpu.models.gs_quant_analysis import (
    coefficient_ranges,
    per_group_step_vector,
    quantization_strategy_report,
    strategy_hybrid,
    strategy_importance_weighted,
    strategy_range_normalized,
)
from raht3dgs_tpu.ops.prelude import morton_codes_np
from conftest import unique_voxel_cloud


def test_zigzag_roundtrip(rng):
    v = rng.integers(-10000, 10000, size=1000)
    np.testing.assert_array_equal(unsigned_to_signed(signed_to_unsigned(v)), v)
    u = signed_to_unsigned(v)
    assert u.min() >= 0


def test_sanity_check_dc(rng):
    import jax.numpy as jnp
    from raht3dgs_tpu.ops.raht import raht_forward

    depth = 5
    _, codes, attrs = unique_voxel_cloud(rng, 200, depth)
    attrs = np.abs(attrs)
    res = raht_forward(
        jnp.asarray(codes), jnp.asarray(attrs), jnp.ones(200, dtype=jnp.float64),
        depth,
    )
    T = np.asarray(res.coeffs)
    assert sanity_check_dc(T[:, 0], attrs[:, 0])
    assert not sanity_check_dc(T[:, 0] * 1.1, attrs[:, 0])


def test_morton_order_check(rng):
    pts, codes, _ = unique_voxel_cloud(rng, 100, 5)
    err, _, _ = is_frame_morton_ordered(pts, 5)
    assert err == 0.0
    perm = rng.permutation(100)
    err2, out, idx = is_frame_morton_ordered(pts[perm], 5)
    assert err2 > 0
    np.testing.assert_array_equal(np.floor(out), pts)


def test_block_indices():
    V = np.array([[0, 0, 0], [1, 1, 0], [4, 0, 0], [5, 1, 1], [8, 8, 8]])
    starts, rest = block_indices(V, 4)
    np.testing.assert_array_equal(starts, [0, 2, 4])
    np.testing.assert_array_equal(rest, [1, 3])


def test_quant_strategies(rng):
    coeffs = rng.normal(size=(500, 56))
    coeffs[:, 0:4] *= 10  # quats coefficients have larger range
    ranges = coefficient_ranges(coeffs)
    assert set(ranges) == {"quats", "scales", "opacity", "colors"}
    s1 = strategy_range_normalized(ranges, 256)
    # equal level counts -> step proportional to range
    assert s1["quats"] > s1["scales"]
    s2, levels = strategy_importance_weighted(ranges, 1024)
    # quats are most important -> most levels
    assert levels["quats"] == max(levels.values())
    assert levels["opacity"] == min(levels.values())
    s3 = strategy_hybrid(s1, s2)
    for k in s1:
        lo, hi = sorted((s1[k], s2[k]))
        assert lo <= s3[k] <= hi
    vec = per_group_step_vector(s2)
    assert vec.shape == (56,)
    assert np.all(vec[0:4] == s2["quats"])
    report = quantization_strategy_report(coeffs, 8.0)
    assert "importance-weighted" in report


def test_cli_debug_driver(tmp_path, rng):
    import subprocess
    import sys

    from raht3dgs_tpu.io.ply import save_ply_3dgs

    n = 300
    pts = np.unique(rng.integers(0, 16, size=(2 * n, 3)), axis=0)[:n]
    codes = morton_codes_np(pts, 4)
    pts = pts[np.argsort(codes)]
    n = len(pts)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    save_ply_3dgs(
        tmp_path / "gs.ply", pts.astype(np.float32), quats,
        np.abs(rng.normal(size=(n, 3))), rng.uniform(0, 1, n),
        rng.normal(size=(n, 48)), voxel_size=0.1, vmin=np.zeros(3),
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "raht3dgs_tpu.cli.encode_3dgs_debug",
            "--input", str(tmp_path / "gs.ply"), "--depth", "4",
            "--platform", "cpu", "--bucket", "512",
            "--ablation", "--views", "2", "--image-size", "64",
            "--render", "preview",
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "QUANTIZATION STRATEGY ANALYSIS" in out.stdout
    assert "RENDERING ABLATION" in out.stdout
    assert "most impactful attribute:" in out.stdout


def test_cli_defaults_come_from_config():
    # config.py is the single source of driver defaults (SURVEY §5 config
    # system); drivers must not drift from it.
    from raht3dgs_tpu.cli.encode_3dgs import build_parser as gs_parser
    from raht3dgs_tpu.cli.encode_ply import build_parser as ply_parser
    from raht3dgs_tpu.config import ColorCodecConfig, GsCodecConfig, RuntimeConfig

    p = ply_parser()
    assert p.get_default("steps") == list(ColorCodecConfig.steps)
    assert p.get_default("bucket") == RuntimeConfig.bucket
    assert p.get_default("dtype") == RuntimeConfig.dtype
    g = gs_parser()
    assert g.get_default("depth") == GsCodecConfig.depth
    assert g.get_default("steps") == list(GsCodecConfig.steps)


def test_importance_steps_match_reference_formula():
    """ops.quantize.importance_allocated_steps must agree with the faithful
    driver-side port of the reference allocation (int-truncated levels,
    step = range/(levels-1))."""
    from raht3dgs_tpu.models.gs_quant_analysis import strategy_importance_weighted
    from raht3dgs_tpu.ops.quantize import (
        GS_ATTRIBUTE_GROUPS,
        importance_allocated_steps,
    )

    ranges = {"quats": 2.0, "scales": 0.5, "opacity": 1.0, "colors": 3.0}
    want, _levels = strategy_importance_weighted(ranges, 1024)
    got = importance_allocated_steps(56, 1024.0, coeff_ranges=ranges)
    for name, (lo, hi) in GS_ATTRIBUTE_GROUPS.items():
        np.testing.assert_allclose(got[lo:hi], want[name], rtol=1e-12)


def test_gs_groups_adapt_to_channel_count():
    from raht3dgs_tpu.eval.metrics import gs_group_psnr
    from raht3dgs_tpu.ops.quantize import gs_attribute_groups

    assert gs_attribute_groups(56)["colors"] == (8, 56)
    assert gs_attribute_groups(20)["colors"] == (8, 20)
    assert "colors" not in gs_attribute_groups(8)
    assert gs_attribute_groups(6) == {"quats": (0, 4), "scales": (4, 6)}

    rng = np.random.default_rng(0)
    a = rng.normal(size=(50, 8))  # no color channels at all
    out = gs_group_psnr(a, a + 0.01)
    assert "psnr_colors" not in out
    assert np.isfinite(out["psnr_all"]) and np.isfinite(out["psnr_quats"])
