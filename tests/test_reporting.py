"""Reporting scripts consume the drivers' CSV logs end to end.

COVERAGE.md claims the CSV schemas mirror the reference drivers verbatim
and that `scripts/summarize_pipeline_runtime.py` / `scripts/plot_runtime.py`
work on this framework's logs — this test pins the full chain: real driver
run -> CSV -> summary markdown / plot PNG.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def driver_csvs(tmp_path, rng):
    """Run encode_ply and voxelize_3dgs for real to produce their CSVs."""
    from raht3dgs_tpu.io.ply import save_ply_ascii
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    depth = 5
    pts = rng.integers(0, 2**depth, (2000, 3))
    _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
    pts = pts[first]
    cols = rng.integers(0, 255, (len(pts), 3))
    ply = tmp_path / "frame.ply"
    save_ply_ascii(ply, pts.astype(float), cols.astype(float),
                   width=2**depth - 1)

    torch = pytest.importorskip("torch")

    from raht3dgs_tpu.cli.encode_ply import main as ply_main

    raht_csv = tmp_path / "runtime_ply.csv"
    assert ply_main([
        "--input", str(ply), "--steps", "4", "8", "--platform", "cpu",
        "--csv", str(raht_csv),
    ]) == 0

    n = 500
    splats = {
        "means": torch.tensor(rng.uniform(-1, 1, (n, 3)), dtype=torch.float32),
        "quats": torch.tensor(rng.normal(size=(n, 4)), dtype=torch.float32),
        "scales": torch.tensor(
            np.log(rng.uniform(0.01, 0.05, (n, 3))), dtype=torch.float32
        ),
        "opacities": torch.tensor(rng.normal(size=(n,)), dtype=torch.float32),
        "sh0": torch.tensor(rng.normal(size=(n, 1, 3)), dtype=torch.float32),
        "shN": torch.tensor(
            rng.normal(size=(n, 15, 3)) * 0.1, dtype=torch.float32
        ),
    }
    ckpt = tmp_path / "ckpt.pt"
    torch.save({"splats": splats}, ckpt)

    from raht3dgs_tpu.cli.voxelize_3dgs import main as vox_main

    vox_csv = tmp_path / "runtime_vox.csv"
    assert vox_main([
        "--ckpt", str(ckpt), "--depth", "5",
        "--output-dir", str(tmp_path / "out"), "--render", "none",
        "--platform", "cpu", "--csv", str(vox_csv),
    ]) == 0
    return raht_csv, vox_csv


def test_summarize_and_plot_consume_driver_csvs(driver_csvs, tmp_path):
    raht_csv, vox_csv = driver_csvs

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import summarize_pipeline_runtime as spr

        out_md = tmp_path / "summary.md"
        assert spr.main([
            "--raht-log", str(raht_csv), "--voxel-log", str(vox_csv),
            "--out", str(out_md),
        ]) == 0
        text = out_md.read_text()
        assert "RAHT pipeline" in text and "Voxelization" in text

        import plot_runtime as pr

        out_png = tmp_path / "runtime.png"
        assert pr.main([str(raht_csv), "--out", str(out_png)]) == 0
        assert out_png.exists() and out_png.stat().st_size > 1000
    finally:
        sys.path.remove(os.path.join(REPO, "scripts"))
