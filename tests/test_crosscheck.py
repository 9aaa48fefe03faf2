import numpy as np
import pytest

pytest.importorskip("scipy")

from raht3dgs_tpu import crosscheck as cc
from raht3dgs_tpu.ops.prelude import prelude, raht_forward_lists
from conftest import unique_voxel_cloud


def _matlab_style_dump(tmp_path, codes, depth):
    """Produce a 1-based MATLAB-style dump of the prelude (as encode_ply.m
    would: List 1-based, Flags as doubles, weights)."""
    Lists, Flags, weights, _ = prelude(codes, 3 * depth)
    cc.save_lists(
        tmp_path / "params.mat",
        ListC=[l + 1 for l in Lists],            # MATLAB 1-based
        FlagsC=[f.astype(np.float64) for f in Flags],
        weightsC=weights,
    )
    return Lists, Flags, weights


def test_prelude_crosscheck_passes(tmp_path, rng):
    depth = 5
    _, codes, attrs = unique_voxel_cloud(rng, 300, depth)
    _matlab_style_dump(tmp_path, codes, depth)
    report = cc.crosscheck_prelude(codes, depth, tmp_path / "params.mat")
    assert report.ok, str(report)


def test_prelude_crosscheck_detects_corruption(tmp_path, rng):
    depth = 5
    _, codes, attrs = unique_voxel_cloud(rng, 300, depth)
    Lists, Flags, weights = _matlab_style_dump(tmp_path, codes, depth)
    # corrupt one weight level and re-dump
    bad_weights = [w.copy() for w in weights]
    bad_weights[2][0] += 1
    cc.save_lists(
        tmp_path / "bad.mat",
        ListC=[l + 1 for l in Lists],
        FlagsC=[f.astype(np.float64) for f in Flags],
        weightsC=bad_weights,
    )
    report = cc.crosscheck_prelude(codes, depth, tmp_path / "bad.mat")
    assert not report.ok
    assert any("weights[2]" in str(r) for r in report.results if not r.ok)


def test_coefficient_crosscheck(tmp_path, rng):
    depth = 4
    _, codes, attrs = unique_voxel_cloud(rng, 200, depth)
    Lists, Flags, weights, _ = prelude(codes, 3 * depth)
    T, w = raht_forward_lists(attrs, Lists, Flags, weights)
    cc.save_mat(T, tmp_path / "coeff.mat")
    report = cc.crosscheck_coefficients(T, tmp_path / "coeff.mat")
    assert report.ok
    # perturbation beyond 1e-12 fails
    report = cc.crosscheck_coefficients(T + 1e-9, tmp_path / "coeff.mat")
    assert not report.ok


def test_compare_tensor_shapes():
    r = cc.compare_tensor("x", np.zeros(3), np.zeros(4))
    assert not r.ok and "shape" in r.detail
