"""Full 3DGS CLI chain: checkpoint -> voxelize_3dgs -> encode_3dgs ->
decode (the reference's preprocessing->codec handoff via the compressed
PLY, SURVEY.md §1 data flow), plus the debug driver's strategies."""

import glob
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture
def ckpt(tmp_path, rng):
    n = 600
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
    path = tmp_path / "ckpt.pt"
    torch.save({"splats": splats}, path)
    return path


def test_voxelize_encode_decode_chain(ckpt, tmp_path):
    from raht3dgs_tpu.cli.decode import main as decode_main
    from raht3dgs_tpu.cli.encode_3dgs import main as enc_main
    from raht3dgs_tpu.cli.voxelize_3dgs import main as vox_main
    from raht3dgs_tpu.io.ply import read_compressed_3dgs_ply

    outdir = tmp_path / "vox"
    assert vox_main([
        "--ckpt", str(ckpt), "--depth", "6", "--output-dir", str(outdir),
        "--render", "none", "--platform", "cpu",
    ]) == 0
    plys = glob.glob(str(outdir / "*compressed*.ply"))
    assert plys, os.listdir(outdir)
    voxply = plys[0]

    streams_dir = tmp_path / "streams"
    assert enc_main([
        "--input", voxply, "--steps", "0.01", "--platform", "cpu",
        "--save-streams", str(streams_dir),
    ]) == 0
    saved = glob.glob(str(streams_dir / "*.r3tc"))
    assert len(saved) == 1 and os.path.getsize(saved[0]) > 0
    stream = saved[0]

    recon = tmp_path / "recon.ply"
    assert decode_main([
        "--stream", str(stream), "--positions", voxply,
        "--output", str(recon), "--color-space", "3dgs",
        "--platform", "cpu",
    ]) == 0
    # the reconstruction is itself a readable compressed-3DGS PLY whose
    # attributes sit within quantization error of the voxelized originals
    v0, a0, vs0, vmin0 = read_compressed_3dgs_ply(voxply)
    v1, a1, vs1, vmin1 = read_compressed_3dgs_ply(str(recon))
    assert v0.shape == v1.shape and a0.shape == a1.shape
    np.testing.assert_array_equal(v0, v1)
    err = np.abs(a0 - a1).max()
    assert err < 0.02, err  # step 0.01 bound (plus fp32 transform noise)


def test_encode_3dgs_per_attribute(ckpt, tmp_path):
    from raht3dgs_tpu.cli.encode_3dgs import main as enc_main
    from raht3dgs_tpu.cli.voxelize_3dgs import main as vox_main

    outdir = tmp_path / "vox"
    assert vox_main([
        "--ckpt", str(ckpt), "--depth", "6", "--output-dir", str(outdir),
        "--render", "none", "--platform", "cpu",
    ]) == 0
    voxply = glob.glob(str(outdir / "*compressed*.ply"))[0]
    csv_out = tmp_path / "gs.csv"
    assert enc_main([
        "--input", voxply, "--steps", "8", "--per-attribute",
        "--platform", "cpu", "--csv", str(csv_out),
    ]) == 0
    assert csv_out.stat().st_size > 0


def test_encode_3dgs_debug_strategies_and_ablation(ckpt, tmp_path, capsys):
    from raht3dgs_tpu.cli.encode_3dgs_debug import main as dbg_main
    from raht3dgs_tpu.cli.voxelize_3dgs import main as vox_main

    outdir = tmp_path / "vox"
    assert vox_main([
        "--ckpt", str(ckpt), "--depth", "6", "--output-dir", str(outdir),
        "--render", "none", "--platform", "cpu",
    ]) == 0
    voxply = glob.glob(str(outdir / "*compressed*.ply"))[0]
    assert dbg_main([
        "--input", voxply, "--platform", "cpu", "--ablation",
        "--views", "2", "--image-size", "64", "--render", "jax",
    ]) == 0
    out = capsys.readouterr().out
    # the three step-allocation strategies of the reference debug driver
    for word in ("range", "importance", "hybrid"):
        assert word in out
    # ablation reports one PSNR per attribute group
    for grp in ("quats", "scales", "opacity", "colors"):
        assert grp in out


def test_3dgs_self_contained_decode(ckpt, tmp_path):
    """--code-geometry on encode_3dgs: the stream decodes in 3dgs mode with
    no --positions, recovering voxel coords AND world metadata (voxel_size,
    vmin ride the stream header)."""
    from raht3dgs_tpu.cli.decode import main as decode_main
    from raht3dgs_tpu.cli.encode_3dgs import main as enc_main
    from raht3dgs_tpu.cli.voxelize_3dgs import main as vox_main
    from raht3dgs_tpu.io.ply import read_compressed_3dgs_ply
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    outdir = tmp_path / "vox"
    assert vox_main([
        "--ckpt", str(ckpt), "--depth", "6", "--output-dir", str(outdir),
        "--render", "none", "--platform", "cpu",
    ]) == 0
    voxply = glob.glob(str(outdir / "*compressed*.ply"))[0]

    streams_dir = tmp_path / "streams"
    assert enc_main([
        "--input", voxply, "--steps", "0.01", "--platform", "cpu",
        "--save-streams", str(streams_dir), "--code-geometry",
    ]) == 0
    stream = glob.glob(str(streams_dir / "*.r3tc"))[0]

    recon = tmp_path / "recon_geom.ply"
    assert decode_main([
        "--stream", str(stream), "--output", str(recon),
        "--color-space", "3dgs", "--platform", "cpu",
    ]) == 0
    v0, a0, vs0, vmin0 = read_compressed_3dgs_ply(voxply)
    v1, a1, vs1, vmin1 = read_compressed_3dgs_ply(str(recon))
    # geometry-decoded voxels come back in Morton order (encode_3dgs's
    # default --depth, which the stream records)
    from raht3dgs_tpu.config import GsCodecConfig

    order = np.argsort(
        morton_codes_np(v0.astype(np.int64), GsCodecConfig.depth),
        kind="stable",
    )
    np.testing.assert_array_equal(v0[order], v1)
    np.testing.assert_allclose(vs0, vs1, rtol=1e-6)
    np.testing.assert_allclose(vmin0, vmin1, rtol=1e-6)
    assert np.abs(a0[order] - a1).max() < 0.02


def test_encode_3dgs_entropy_auto(ckpt, tmp_path):
    """--entropy auto on the 56-channel driver: identical reconstruction,
    never-larger stream, decode CLI auto-detects the v5 entropy map."""
    import glob as _glob

    from raht3dgs_tpu.cli.decode import main as decode_main
    from raht3dgs_tpu.cli.encode_3dgs import main as enc_main
    from raht3dgs_tpu.cli.voxelize_3dgs import main as vox_main
    from raht3dgs_tpu.io.ply import read_compressed_3dgs_ply

    outdir = tmp_path / "vox"
    assert vox_main([
        "--ckpt", str(ckpt), "--depth", "6", "--output-dir", str(outdir),
        "--render", "none", "--platform", "cpu",
    ]) == 0
    voxply = _glob.glob(str(outdir / "*compressed*.ply"))[0]

    sizes, recs = {}, {}
    for entropy in ("rlgr", "auto"):
        sdir = tmp_path / f"streams_{entropy}"
        assert enc_main([
            "--input", voxply, "--steps", "0.01", "--platform", "cpu",
            "--save-streams", str(sdir), "--entropy", entropy,
        ]) == 0
        stream = _glob.glob(str(sdir / "*.r3tc"))[0]
        sizes[entropy] = os.path.getsize(stream)
        recon = tmp_path / f"recon_{entropy}.ply"
        assert decode_main([
            "--stream", stream, "--positions", voxply,
            "--output", str(recon), "--color-space", "3dgs",
            "--platform", "cpu",
        ]) == 0
        recs[entropy] = read_compressed_3dgs_ply(str(recon))
    # identical reconstruction (pure rate feature), never-larger payload
    np.testing.assert_array_equal(recs["rlgr"][1], recs["auto"][1])
    assert sizes["auto"] <= sizes["rlgr"] + 8  # v5 header overhead bound
