import subprocess
import sys

import numpy as np

from raht3dgs_tpu.io.ply import save_ply_ascii
from raht3dgs_tpu.models.color_codec import encode_color_frame, y_psnr_db
from conftest import unique_voxel_cloud


def test_rd_sweep(rng):
    depth = 6
    pts, _, attrs = unique_voxel_cloud(rng, 800, depth)
    # smooth-ish colors so the codec has something to exploit
    rgb = (pts / 2**depth * 255.0).astype(np.float64)
    points = encode_color_frame(
        pts, rgb, depth=depth, steps=(1, 4, 16), bucket=512
    )
    assert len(points) == 3
    bpps = [p.bpp for p in points]
    psnrs = [p.psnr for p in points]
    assert bpps == sorted(bpps, reverse=True)
    assert psnrs == sorted(psnrs, reverse=True)
    assert psnrs[0] > 40  # step=1 should be near-lossless
    for p in points:
        assert set(p.times) >= {
            "RAHT_prelude_time", "RAHT_transform_time", "Quant_time",
            "Entropy_enc_time", "Entropy_dec_time", "Dequant_time", "iRAHT_time",
        }


def test_coefficient_domain_psnr_matches_signal_domain(rng):
    depth = 5
    pts, _, _ = unique_voxel_cloud(rng, 400, depth)
    rgb = rng.integers(0, 256, size=(len(pts), 3)).astype(np.float64)
    full = encode_color_frame(pts, rgb, depth=depth, steps=(4,), bucket=512)
    quick = encode_color_frame(
        pts, rgb, depth=depth, steps=(4,), bucket=512, decode=False
    )
    # orthonormality: coefficient-domain PSNR == signal-domain PSNR
    assert abs(full[0].psnr - quick[0].psnr) < 0.05


def test_unsorted_input_psnr(rng):
    # Regression: input NOT in Morton order must still give correct PSNR
    # (the decoded signal is in sorted order; comparison must follow).
    depth = 5
    pts, _, _ = unique_voxel_cloud(rng, 500, depth)
    perm = rng.permutation(len(pts))
    pts, rgb = pts[perm], (pts[perm] * 3 % 256).astype(np.float64)
    out = encode_color_frame(pts, rgb, depth=depth, steps=(1,), bucket=512)
    assert out[0].psnr > 40


def test_psnr_helper():
    assert y_psnr_db(np.zeros(10), np.zeros(10)) == float("inf")
    assert abs(y_psnr_db(np.full(10, 255.0), np.zeros(10)) - 0.0) < 1e-9


def test_cli_encode_ply(tmp_path, rng):
    depth = 5
    pts, _, _ = unique_voxel_cloud(rng, 300, depth)
    rgb = rng.integers(0, 256, size=(len(pts), 3))
    ply = tmp_path / "frame.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=2**depth - 1)
    csv = tmp_path / "log.csv"
    streams = tmp_path / "streams"
    out = subprocess.run(
        [
            sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
            "--input", str(ply), "--steps", "1", "8",
            "--csv", str(csv), "--platform", "cpu", "--bucket", "512",
            "--save-streams", str(streams),
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    lines = csv.read_text().strip().splitlines()
    assert lines[0].startswith("Frame,Quantization_Step,Rate_bpp")
    assert len(lines) == 3
    assert len(list(streams.glob("*.r3tc"))) == 2


def test_cli_decode_roundtrip(tmp_path, rng):
    depth = 5
    pts, _, _ = unique_voxel_cloud(rng, 400, depth)
    rgb = (pts * 5 % 256).astype(int)
    ply = tmp_path / "f.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=2**depth - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2", "--csv", str(tmp_path / "e.csv"),
         "--platform", "cpu", "--bucket", "512",
         "--save-streams", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "frame0001_step2.r3tc"),
         "--positions", str(ply), "--output", str(tmp_path / "rec.ply"),
         "--platform", "cpu", "--bucket", "512"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    from raht3dgs_tpu.io.ply import read_ply_8i

    V2, C2, _ = read_ply_8i(tmp_path / "rec.ply")
    np.testing.assert_allclose(V2, pts.astype(float), atol=1e-4)
    assert np.abs(C2.astype(float) - rgb).mean() < 3.0


def test_cli_decode_progressive_preview(tmp_path, rng):
    depth = 5
    pts, _, _ = unique_voxel_cloud(rng, 400, depth)
    rgb = (pts * 5 % 256).astype(int)
    ply = tmp_path / "f.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=2**depth - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2", "--csv", str(tmp_path / "e.csv"),
         "--platform", "cpu", "--bucket", "512",
         "--save-streams", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    stream = str(tmp_path / "frame0001_step2.r3tc")
    recs = {}
    for k in (16, 0):  # coarse preview, then full decode
        out = subprocess.run(
            [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
             "--stream", stream, "--positions", str(ply),
             "--output", str(tmp_path / f"rec{k}.ply"),
             "--platform", "cpu", "--bucket", "512",
             "--progressive", str(k)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-1500:]
        if k:
            assert "progressive preview: 16/" in out.stdout
        from raht3dgs_tpu.io.ply import read_ply_8i

        _, C2, _ = read_ply_8i(tmp_path / f"rec{k}.ply")
        recs[k] = C2.astype(float)
    full_err = np.abs(recs[0] - rgb).mean()
    prev_err = np.abs(recs[16] - rgb).mean()
    assert full_err < 3.0
    assert prev_err > full_err  # a preview, not the full reconstruction
