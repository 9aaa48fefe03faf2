import numpy as np
import pytest

from raht3dgs_tpu.io import (
    read_compressed_3dgs_ply,
    read_ply,
    read_ply_8i,
    save_ply_3dgs,
    save_ply_ascii,
    DATASET_CONFIG,
    get_pointcloud,
    get_pointcloud_n_frames,
)
from raht3dgs_tpu.io.datasets import frame_path


def test_ascii_roundtrip(tmp_path, rng):
    V = rng.uniform(0, 1023, size=(50, 3)).round(3)
    C = rng.integers(0, 256, size=(50, 3))
    p = tmp_path / "f.ply"
    save_ply_ascii(p, V, C, width=1023)
    V2, C2, J = read_ply_8i(p)
    np.testing.assert_allclose(V2, V, atol=1e-5)
    np.testing.assert_array_equal(C2, C)
    assert J == 10


def test_3dgs_binary_roundtrip(tmp_path, rng):
    n = 40
    means = rng.normal(size=(n, 3))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = np.abs(rng.normal(size=(n, 3)))
    opac = rng.uniform(0, 1, size=n)
    colors = rng.normal(size=(n, 48))
    p = tmp_path / "gs.ply"
    save_ply_3dgs(p, means, quats, scales, opac, colors,
                  voxel_size=0.125, vmin=np.array([-1.0, 0.5, 2.0]))
    V_int, attrs, vs, vmin = read_compressed_3dgs_ply(p)
    assert attrs.shape == (n, 56)
    np.testing.assert_allclose(attrs[:, 0:4], quats, atol=1e-6)
    np.testing.assert_allclose(attrs[:, 4:7], scales, atol=1e-6)
    np.testing.assert_allclose(attrs[:, 7], opac, atol=1e-6)
    np.testing.assert_allclose(attrs[:, 8:], colors, atol=1e-5)
    assert vs == pytest.approx(0.125)
    np.testing.assert_allclose(vmin, [-1.0, 0.5, 2.0], atol=1e-6)


def test_reference_writer_naming_quirk(tmp_path, rng):
    # Simulate the reference writer: all 48 SH channels labeled f_dc_*.
    n = 10
    rec_names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(48)]
        + ["opacity", "scale_0", "scale_1", "scale_2"]
        + ["rot_0", "rot_1", "rot_2", "rot_3"]
    )
    rec = np.zeros(n, dtype=np.dtype([(p, "<f4") for p in rec_names]))
    rec["x"] = np.arange(n)
    rec["f_dc_5"] = 7.0
    rec["rot_0"] = 1.0
    p = tmp_path / "quirk.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"comment voxel_size 0.5\n")
        f.write(f"element vertex {n}\n".encode())
        for nm in rec_names:
            f.write(f"property float {nm}\n".encode())
        f.write(b"end_header\n")
        rec.tofile(f)
    V_int, attrs, vs, vmin = read_compressed_3dgs_ply(p)
    assert attrs.shape == (n, 56)
    assert attrs[0, 8 + 5] == pytest.approx(7.0)
    np.testing.assert_array_equal(V_int[:, 0], np.arange(n))


def test_generic_reader_binary_and_comments(tmp_path, rng):
    n = 5
    save_ply_3dgs(tmp_path / "x.ply", np.zeros((n, 3)), np.zeros((n, 4)),
                  np.zeros((n, 3)), np.zeros(n), np.zeros((n, 3)),
                  voxel_size=2.0)
    ply = read_ply(tmp_path / "x.ply")
    assert len(ply.vertices) == n
    assert ply.comment_value("voxel_size") == ["2.0"]
    assert ply.comment_value("nonexistent") is None


def test_dataset_registry():
    assert get_pointcloud_n_frames("8iVFBv2", "redandblack") == 300
    assert get_pointcloud_n_frames("MVUB", "andrew9") == 318
    assert get_pointcloud_n_frames("nope", "x") is None
    p = frame_path("8iVFBv2", "soldier", 1, data_root="/data")
    assert p == "/data/8iVFBv2/soldier/Ply/soldier_vox10_0536.ply"
    p = frame_path("MVUB", "andrew9", 3, data_root="/d")
    assert p == "/d/MVUB/andrew9/ply/frame0002.ply"


def test_dataset_loader_with_synthetic_tree(tmp_path, rng):
    d = tmp_path / "8iVFBv2" / "soldier" / "Ply"
    d.mkdir(parents=True)
    V = rng.integers(0, 1024, size=(20, 3)).astype(float)
    C = rng.integers(0, 256, size=(20, 3))
    save_ply_ascii(d / "soldier_vox10_0536.ply", V, C, width=1023)
    out = get_pointcloud("8iVFBv2", "soldier", 1, data_root=str(tmp_path))
    assert out is not None
    V2, C2, J = out
    assert J == 10 and V2.shape == (20, 3)
    # missing frame -> None with warning
    assert get_pointcloud("8iVFBv2", "soldier", 2, data_root=str(tmp_path)) is None


def test_gsplat_checkpoint_ingestion(tmp_path):
    torch = pytest.importorskip("torch")
    from raht3dgs_tpu.io.gsplat_ckpt import load_gsplat_checkpoint

    n = 30
    g = torch.Generator().manual_seed(0)
    ckpt = {
        "splats": {
            "means": torch.randn(n, 3, generator=g),
            "quats": torch.randn(n, 4, generator=g),
            "scales": torch.randn(n, 3, generator=g) - 2.0,  # log space
            "opacities": torch.randn(n, generator=g) * 4,    # logits
            "sh0": torch.randn(n, 1, 3, generator=g),
            "shN": torch.randn(n, 15, 3, generator=g),
        }
    }
    p = tmp_path / "ckpt.pt"
    torch.save(ckpt, p)
    out = load_gsplat_checkpoint(p)
    assert out is not None
    np.testing.assert_allclose(
        np.linalg.norm(out["quats"], axis=1), 1.0, atol=1e-6
    )
    assert out["scales"].min() > 0
    assert 0 <= out["opacities"].min() and out["opacities"].max() <= 1
    assert out["colors"].shape == (n, 48)


# -- R3TS sequence container --------------------------------------------------

def test_sequence_roundtrip(tmp_path, rng):
    from raht3dgs_tpu.codec.bitstream import (
        FrameStream, SequenceReader, write_sequence,
    )

    streams = []
    for i in range(5):
        n = 10 + i
        streams.append(FrameStream(
            depth=6, n_voxels=n, steps=np.array([float(i + 1)]),
            channels=[bytes([i] * (3 + i)), bytes([99 - i])],
        ))
    path = tmp_path / "seq.r3ts"
    total = write_sequence(path, streams)
    assert total == path.stat().st_size

    seq = SequenceReader(path)
    assert len(seq) == 5
    # random access, out of order
    for i in (3, 0, 4, 2, 1):
        fr = seq.frame(i)
        assert fr.n_voxels == 10 + i
        assert fr.steps[0] == i + 1
        assert fr.channels == streams[i].channels
    assert [f.n_voxels for f in seq] == [10, 11, 12, 13, 14]
    with pytest.raises(IndexError):
        seq.frame_bytes(5)


def test_sequence_bad_magic(tmp_path):
    from raht3dgs_tpu.codec.bitstream import SequenceReader

    p = tmp_path / "junk.r3ts"
    p.write_bytes(b"NOPE" + bytes(20))
    with pytest.raises(ValueError, match="magic"):
        SequenceReader(p)


def test_sequence_accepts_raw_bytes(tmp_path):
    from raht3dgs_tpu.codec.bitstream import SequenceReader, write_sequence

    path = tmp_path / "raw.r3ts"
    write_sequence(path, [b"abc", b"", b"defg"])
    seq = SequenceReader(path)
    assert [seq.frame_bytes(i) for i in range(3)] == [b"abc", b"", b"defg"]


def test_frame_stream_rejects_truncation(rng):
    from raht3dgs_tpu.codec.bitstream import FrameStream

    st = FrameStream(
        depth=5, n_voxels=4, steps=np.array([1.0]),
        channels=[b"abcd", b"xy"],
    )
    full = st.to_bytes()
    rt = FrameStream.from_bytes(full)
    assert rt.channels == st.channels
    # every strict prefix must be rejected with a clear error, never parse
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            FrameStream.from_bytes(full[:cut])


def test_cli_encode_dataset_mvub(tmp_path, rng):
    # MVUB layout end-to-end: fixed J=9, red/green/blue properties.
    import subprocess
    import sys

    from raht3dgs_tpu.io.ply import save_ply_ascii
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    root = tmp_path / "data"
    (root / "MVUB" / "andrew9" / "ply").mkdir(parents=True)
    depth = 9
    pts = rng.integers(0, 2**depth, size=(1200, 3))
    _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
    pts = pts[first[:500]]
    save_ply_ascii(
        root / "MVUB" / "andrew9" / "ply" / "frame0000.ply",
        pts.astype(float), (pts * 13 % 256).astype(int),
    )
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_dataset",
         "--dataset", "MVUB", "--sequence", "andrew9",
         "--data-root", str(root), "--frames", "1", "1", "--steps", "8",
         "--csv", str(tmp_path / "log.csv"), "--platform", "cpu",
         "--bucket", "1024"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    lines = (tmp_path / "log.csv").read_text().strip().splitlines()
    assert len(lines) == 2 and lines[1].startswith("1,8,")


def test_sequence_rejects_truncation(tmp_path):
    from raht3dgs_tpu.codec.bitstream import SequenceReader, write_sequence

    path = tmp_path / "s.r3ts"
    write_sequence(path, [b"aaaa", b"bbbbbb"])
    full = path.read_bytes()
    for cut in (5, 20, len(full) - 1):
        (tmp_path / "cut.r3ts").write_bytes(full[:cut])
        with pytest.raises(ValueError, match="truncated sequence"):
            SequenceReader(tmp_path / "cut.r3ts")


def test_ply_reader_malformed_inputs(tmp_path, rng):
    """Malformed PLY files raise specific errors (never hang or crash)."""
    from raht3dgs_tpu.io.ply import read_ply as read_ply_file

    cases = {
        "not_ply.ply": b"OFF\n0 0 0\n",
        "unterminated.ply": b"ply\nformat ascii 1.0\nelement vertex 3\n",
        "bad_format.ply": (
            b"ply\nformat binary_middle_endian 1.0\nelement vertex 1\n"
            b"property float x\nend_header\n\x00\x00\x00\x00"
        ),
        "list_prop.ply": (
            b"ply\nformat ascii 1.0\nelement face 1\n"
            b"property list uchar int vertex_index\nend_header\n3 0 1 2\n"
        ),
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        with pytest.raises(ValueError):
            read_ply_file(p)

    # truncated binary payload: fewer records than the header claims
    good = tmp_path / "good.ply"
    hdr = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 10\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    good.write_bytes(hdr + b"\x00" * (12 * 3))  # only 3 of 10 records
    with pytest.raises(Exception):
        read_ply_file(good)
