"""Progressive (prefix) decode: coarse-to-fine previews from stream prefixes.

`AttributeCodec.decode_progressive(k)` decodes only the first k entropy
symbols per channel; skipped symbols reconstruct as exact-zero details.
Contracts pinned here:

- k == n_voxels reproduces the full decode BITWISE;
- reconstruction error is (weakly) monotone decreasing in k across
  octave-spaced prefixes, and the k=1 preview is the DC-only signal;
- works in both coefficient orders, with deadzone quantization, and with
  chunked entropy streams — where `progressive_prefix_bytes` is exact
  (a decoder holding only that byte prefix decodes identically).
"""

import numpy as np
import pytest

from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    prepare_voxel_frame,
    progressive_prefix_bytes,
)


def _frame(rng, n=700, depth=8):
    from conftest import unique_voxel_cloud

    pts, _, _ = unique_voxel_cloud(rng, n, depth)
    # smooth-ish attributes so coarse previews carry real signal
    attrs = (
        100.0
        + 80.0 * np.sin(pts[:, :1] * 0.05)
        + 40.0 * np.cos(pts[:, 1:2] * 0.08)
        + np.concatenate([np.zeros((len(pts), 1))] * 3, axis=1) * 0
    )[:, :1].repeat(3, axis=1)
    attrs += rng.normal(0, 2.0, attrs.shape)
    return pts, np.clip(attrs, 0, 255)


@pytest.mark.parametrize("order_mode", ["ragft", "weight_desc"])
def test_progressive_monotone_and_full_equals_decode(rng, order_mode):
    depth = 8
    pts, attrs = _frame(rng)
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=1024)
    codec = AttributeCodec(depth, order_mode=order_mode)
    enc = codec.encode(frame, steps=2.0)
    nvox = enc.stream.n_voxels

    full, _ = codec.decode(enc.stream, frame.codes, frame.weights)
    prog_full, _ = codec.decode_progressive(
        enc.stream, frame.codes, frame.weights, nvox
    )
    np.testing.assert_array_equal(prog_full, full)  # bitwise at k = nvox

    ref = np.asarray(frame.attributes)[:nvox]
    ks = [1, 8, 64, nvox // 4, nvox]
    errs = []
    for k in ks:
        rec, _ = codec.decode_progressive(
            enc.stream, frame.codes, frame.weights, k
        )
        errs.append(float(np.sqrt(np.mean((rec - ref) ** 2))))
    # octave-spaced prefixes must not get worse as k grows (tiny fp slack)
    for a, b in zip(errs, errs[1:]):
        assert b <= a + 1e-6, (ks, errs)
    # the full prefix is a real reconstruction; the DC preview is not
    assert errs[-1] <= 1.0  # step/2 bound
    assert errs[0] > errs[-1]


def test_progressive_dc_preview_is_constant(rng):
    depth = 8
    pts, attrs = _frame(rng)
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=1024)
    codec = AttributeCodec(depth)
    enc = codec.encode(frame, steps=2.0)
    rec, _ = codec.decode_progressive(
        enc.stream, frame.codes, frame.weights, 1
    )
    # DC-only: every voxel reconstructs the (quantized) mean signal
    assert np.allclose(rec, rec[0], atol=1e-6)
    nvox = enc.stream.n_voxels
    ref_mean = np.asarray(frame.attributes)[:nvox].mean(axis=0)
    assert np.abs(rec[0] - ref_mean).max() <= 2.0  # step-quantized DC


def test_progressive_chunked_prefix_bytes_sufficient(rng):
    # with chunked streams, a receiver holding only the reported byte
    # prefix (per channel) decodes the SAME preview
    depth = 8
    pts, attrs = _frame(rng, n=900)
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=1024)
    codec = AttributeCodec(depth, chunk=128)
    enc = codec.encode(frame, steps=2.0)
    nvox = enc.stream.n_voxels
    k = 200  # mid-chunk: needs ceil(200/128) = 2 chunks

    rec, _ = codec.decode_progressive(
        enc.stream, frame.codes, frame.weights, k
    )

    from raht3dgs_tpu.codec.rlgr import _parse_chunk_header

    total = progressive_prefix_bytes(enc.stream, k)
    assert total < sum(len(s) for s in enc.stream.channels)

    # physically truncate each channel to its prefix bytes (header + the
    # chunks overlapping [0, k)), rebuild a stream, decode, compare
    trunc = []
    for s in enc.stream.channels:
        c, lens, off = _parse_chunk_header(s)
        need = -(-k // c)
        keep = off + sum(lens[:need])
        # re-emit a consistent header for just the kept chunks
        import struct

        hdr = struct.pack("<II", c, need) + struct.pack(
            f"<{need}I", *lens[:need]
        )
        trunc.append(hdr + s[off:keep])
    assert sum(len(t) for t in trunc) <= total + 8 * len(trunc)

    import dataclasses

    stream2 = dataclasses.replace(enc.stream, channels=trunc)
    rec2, _ = codec.decode_progressive(
        stream2, frame.codes, frame.weights, k
    )
    np.testing.assert_array_equal(rec2, rec)


def test_progressive_deadzone(rng):
    depth = 8
    pts, attrs = _frame(rng)
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=1024)
    codec = AttributeCodec(depth, quant_mode="deadzone")
    enc = codec.encode(frame, steps=4.0)
    nvox = enc.stream.n_voxels
    full, _ = codec.decode(enc.stream, frame.codes, frame.weights)
    prog, _ = codec.decode_progressive(
        enc.stream, frame.codes, frame.weights, nvox
    )
    np.testing.assert_array_equal(prog, full)
    half, _ = codec.decode_progressive(
        enc.stream, frame.codes, frame.weights, nvox // 2
    )
    ref = np.asarray(frame.attributes)[:nvox]
    assert np.sqrt(np.mean((half - ref) ** 2)) >= np.sqrt(
        np.mean((full - ref) ** 2)
    ) - 1e-9


@pytest.mark.parametrize("lod", [1, 2, 3])
def test_decode_lod_exact_cell_means(rng, lod):
    # unit leaf weights (the driver workloads): the LOD reconstruction
    # must equal each cell's MEAN attributes (truncated-Haar property)
    # up to quantization noise
    depth = 4
    from conftest import unique_voxel_cloud

    pts, _, _ = unique_voxel_cloud(rng, 300, depth)
    attrs = rng.uniform(0, 255, (len(pts), 3))
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=512)
    codec = AttributeCodec(depth)
    enc = codec.encode(frame, steps=0.01)
    nvox = enc.stream.n_voxels

    pos, rec, cw = codec.decode_lod(
        enc.stream, frame.codes, frame.weights, lod
    )

    # numpy reference: group by coarse cell in Morton order
    codes = np.asarray(frame.codes)[:nvox].astype(np.uint64)
    wv = np.asarray(frame.weights)[:nvox].astype(np.float64)
    av = np.asarray(frame.attributes)[:nvox]
    coarse = codes >> np.uint64(3 * (depth - lod))
    firsts = np.concatenate([[True], coarse[1:] != coarse[:-1]])
    idx = np.nonzero(firsts)[0]
    n_cells = len(idx)
    assert pos.shape == (n_cells, 3)
    ref_w = np.add.reduceat(wv, idx)
    ref_mean = np.add.reduceat(av * wv[:, None], idx) / ref_w[:, None]
    np.testing.assert_allclose(cw, ref_w)
    np.testing.assert_allclose(rec, ref_mean, atol=0.02, rtol=1e-5)

    # positions are the coarse Morton decodes, in Morton order
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    np.testing.assert_array_equal(
        morton_codes_np(pos, lod).astype(np.uint64), coarse[idx]
    )

    # full-depth LOD is the complete frame
    if lod == depth - 1:
        pos_f, rec_f, cw_f = codec.decode_lod(
            enc.stream, frame.codes, frame.weights, depth
        )
        full, _ = codec.decode(enc.stream, frame.codes, frame.weights)
        np.testing.assert_array_equal(rec_f, full)
        np.testing.assert_allclose(cw_f, wv)


def test_decode_lod_needs_ragft_order(rng):
    depth = 4
    from conftest import unique_voxel_cloud

    pts, _, _ = unique_voxel_cloud(rng, 100, depth)
    attrs = rng.uniform(0, 255, (len(pts), 3))
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=256)
    codec = AttributeCodec(depth, order_mode="weight_desc")
    enc = codec.encode(frame, steps=1.0)
    with pytest.raises(ValueError, match="RA-GFT"):
        codec.decode_lod(enc.stream, frame.codes, frame.weights, 2)


def test_cli_decode_lod(tmp_path, rng):
    import subprocess
    import sys

    from raht3dgs_tpu.io.ply import read_ply_8i, save_ply_ascii

    depth = 5
    from conftest import unique_voxel_cloud

    pts, _, _ = unique_voxel_cloud(rng, 400, depth)
    rgb = (pts * 5 % 256).astype(int)
    ply = tmp_path / "f.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=2**depth - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2",
         "--csv", str(tmp_path / "e.csv"), "--platform", "cpu",
         "--bucket", "512", "--save-streams", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "frame0001_step2.r3tc"),
         "--positions", str(ply), "--output", str(tmp_path / "lod.ply"),
         "--platform", "cpu", "--bucket", "512", "--lod", "2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "LOD 2/5" in out.stdout
    V2, C2, _ = read_ply_8i(tmp_path / "lod.ply")
    assert (V2 < 4).all() and len(V2) < len(pts)
    cw = np.load(tmp_path / "lod.ply.cellw.npy")
    assert cw.sum() == len(pts)  # unit weights: cells partition the voxels


def test_progressive_equals_zeroed_tail_reencode(rng):
    # independent cross-check: decode_progressive(k) must equal the FULL
    # decode of a stream whose symbols beyond k are re-encoded as zeros
    # (dequantized zeros ARE the truncation; the entropy layer is the only
    # thing the prefix path short-circuits)
    import dataclasses

    from raht3dgs_tpu.codec.rlgr import rlgr_decode, rlgr_encode

    depth = 7
    pts, attrs = _frame(rng, n=500, depth=depth)
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=512)
    codec = AttributeCodec(depth)
    enc = codec.encode(frame, steps=2.0)
    nvox = enc.stream.n_voxels

    for k in (3, 57, nvox // 3, nvox - 1):
        prog, _ = codec.decode_progressive(
            enc.stream, frame.codes, frame.weights, k
        )
        chans = []
        for s in enc.stream.channels:
            vals, _ = rlgr_decode(s, nvox, signed=True)
            vals = np.asarray(vals, dtype=np.int32)
            vals[k:] = 0
            chans.append(rlgr_encode(vals, signed=True)[0])
        stream2 = dataclasses.replace(enc.stream, channels=chans)
        full2, _ = codec.decode(stream2, frame.codes, frame.weights)
        np.testing.assert_array_equal(prog, full2)


def test_cli_lod_progressive_mutually_exclusive(tmp_path, rng):
    import subprocess
    import sys

    from raht3dgs_tpu.io.ply import save_ply_ascii

    depth = 5
    from conftest import unique_voxel_cloud

    pts, _, _ = unique_voxel_cloud(rng, 200, depth)
    rgb = (pts * 5 % 256).astype(int)
    ply = tmp_path / "f.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=2**depth - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2",
         "--csv", str(tmp_path / "e.csv"), "--platform", "cpu",
         "--bucket", "256", "--save-streams", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    stream = str(tmp_path / "frame0001_step2.r3tc")
    base = [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
            "--stream", stream, "--positions", str(ply),
            "--output", str(tmp_path / "o.ply"), "--platform", "cpu",
            "--bucket", "256"]
    # combined flags rejected cleanly
    out = subprocess.run(base + ["--lod", "2", "--progressive", "5"],
                         capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode != 0
    assert "mutually exclusive" in out.stderr
    # out-of-range LOD: clean SystemExit, not a traceback
    out = subprocess.run(base + ["--lod", "9"],
                         capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode != 0
    assert "lod_depth must be in [1, 5]" in out.stderr
    assert "Traceback" not in out.stderr
    # negative --progressive rejected
    out = subprocess.run(base + ["--progressive", "-3"],
                         capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode != 0
    assert "must be positive" in out.stderr
