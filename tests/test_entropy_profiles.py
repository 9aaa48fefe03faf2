"""RAC entropy profile integration: container v5, pipeline dispatch,
compose with every stream feature, CLI surface.

The invariant that makes RAC a pure rate win: the quantizer is untouched,
so reconstructions under entropy="rlgr"/"rac"/"auto" are BITWISE
identical — only the payload bytes differ. Tests pin that plus the
auto mode's never-worse guarantee and the byte-compat of rlgr-only
streams (no v5 header creep)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from raht3dgs_tpu.codec.bitstream import FrameStream  # noqa: E402
from raht3dgs_tpu.eval.synth import synthetic_color_frame  # noqa: E402
from raht3dgs_tpu.models.pipeline import (  # noqa: E402
    AttributeCodec,
    prepare_voxel_frame,
)
from raht3dgs_tpu.ops.color import rgb_to_yuv  # noqa: E402


# -- container v5 --------------------------------------------------------------


def _stream(entropy_map=None, **kw):
    base = dict(
        depth=8, n_voxels=100, steps=np.asarray([16.0]),
        channels=[b"abc", b"defg", b"x"], entropy_map=entropy_map,
    )
    base.update(kw)
    return FrameStream(**base)


def test_v5_roundtrip_mixed_map():
    s = _stream(entropy_map=(True, False, True))
    rt = FrameStream.from_bytes(s.to_bytes())
    assert rt.entropy_map == (True, False, True)
    assert rt.channels == s.channels
    assert s.to_bytes()[4] == 5  # version byte


def test_rlgr_only_streams_stay_pre_v5():
    """entropy_map=None and all-False must keep the exact pre-v5 bytes —
    the reference-parity byte-identity contract must not grow a header."""
    a = _stream(entropy_map=None).to_bytes()
    b = _stream(entropy_map=(False, False, False)).to_bytes()
    assert a == b
    assert a[4] == 2  # plain v2
    assert FrameStream.from_bytes(b).entropy_map is None


def test_v5_composes_with_every_section():
    s = _stream(
        entropy_map=(True, True, True),
        quant_mode="deadzone", quant_f=0.3, rec_delta=0.1,
        chunk=4096, inter=True, probes=27, motion=b"MOTION",
        geometry=b"GEOMBYTES", dtype32=True,
    )
    rt = FrameStream.from_bytes(s.to_bytes())
    assert rt.entropy_map == (True, True, True)
    assert rt.quant_mode == "deadzone" and rt.chunk == 4096
    assert rt.inter and rt.probes == 27 and rt.motion == b"MOTION"
    assert rt.geometry == b"GEOMBYTES" and rt.dtype32


def test_v5_without_geometry_or_motion():
    s = _stream(entropy_map=(True, False, False))
    rt = FrameStream.from_bytes(s.to_bytes())
    assert rt.geometry is None and rt.motion is None


def test_v5_corruption_guards():
    blob = bytearray(_stream(entropy_map=(True, False, True)).to_bytes())
    # unknown flags2 bit
    bad = bytearray(blob)
    bad[19] |= 0x80  # flags2 sits right after the <4sBBBHQH head (19 B)
    with pytest.raises(ValueError, match="flags2"):
        FrameStream.from_bytes(bytes(bad))
    # truncation inside the entropy map
    with pytest.raises(ValueError):
        FrameStream.from_bytes(bytes(blob[:20]))
    # truncation right before flags2
    with pytest.raises(ValueError):
        FrameStream.from_bytes(bytes(blob[:19]))


def test_entropy_map_length_mismatch_rejected_on_write():
    with pytest.raises(ValueError, match="entropy_map"):
        _stream(entropy_map=(True,)).to_bytes()


# -- pipeline ------------------------------------------------------------------


@pytest.fixture(scope="module")
def frame_and_transform():
    V, rgb = synthetic_color_frame(n=6000, depth=8, seed=11)
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(rgb)))
    frame = prepare_voxel_frame(V, yuv, 8)
    codec = AttributeCodec(depth=8)
    coeffs, order, _, _ = codec.transform(frame)
    return frame, coeffs, order


@pytest.mark.parametrize("chunk", [0, 2048])
def test_rac_reconstruction_bitwise_equals_rlgr(frame_and_transform, chunk):
    frame, coeffs, order = frame_and_transform
    recs, bpps = {}, {}
    for entropy in ("rlgr", "rac", "auto"):
        codec = AttributeCodec(depth=8, chunk=chunk, entropy=entropy)
        enc = codec.encode(frame, 16.0, coeffs=coeffs, order=order)
        blob = enc.stream.to_bytes()
        rt = FrameStream.from_bytes(blob)
        rec, _ = codec.decode(rt, frame.codes, frame.weights)
        recs[entropy], bpps[entropy] = rec, enc.stream.bpp()
    np.testing.assert_array_equal(recs["rlgr"], recs["rac"])
    np.testing.assert_array_equal(recs["rlgr"], recs["auto"])
    # the motivating measurement at this scale, and auto's guarantee
    assert bpps["rac"] < bpps["rlgr"]
    assert bpps["auto"] <= min(bpps["rlgr"], bpps["rac"])


def test_auto_picks_per_channel_min(frame_and_transform):
    """auto = per-channel min over {rlgr, rac profile 0, and (channels
    > 0) rac profile 1 conditioned on channel 0's significance}."""
    import numpy as np

    from raht3dgs_tpu.codec.rac import rac_encode
    from raht3dgs_tpu.models.pipeline import _quant_reorder_device

    frame, coeffs, order = frame_and_transform
    rl = AttributeCodec(depth=8, entropy="rlgr").encode(
        frame, 16.0, coeffs=coeffs, order=order).stream
    ra = AttributeCodec(depth=8, entropy="rac").encode(
        frame, 16.0, coeffs=coeffs, order=order).stream
    au = AttributeCodec(depth=8, entropy="auto").encode(
        frame, 16.0, coeffs=coeffs, order=order).stream
    import jax.numpy as jnp

    q = np.asarray(_quant_reorder_device(
        coeffs, jnp.atleast_1d(jnp.asarray(16.0, jnp.float64)), order,
        jnp.int32(frame.n_voxels), "mid", jnp.asarray(0.0, jnp.float64),
    ))[:, : frame.n_voxels].astype(np.int32)
    cond = (q[0] != 0).astype(np.uint8)
    for d in range(3):
        cands = [rl.channels[d], ra.channels[d]]
        if d > 0:
            cands.append(rac_encode(q[d], cond=cond)[0])
        assert au.channels[d] == min(cands, key=len)


def test_progressive_and_lod_on_rac_stream(frame_and_transform):
    frame, coeffs, order = frame_and_transform
    codec = AttributeCodec(depth=8, entropy="rac")
    enc = codec.encode(frame, 8.0, coeffs=coeffs, order=order)
    full, _ = codec.decode(enc.stream, frame.codes, frame.weights)
    again, _ = codec.decode_progressive(
        enc.stream, frame.codes, frame.weights, frame.n_voxels
    )
    np.testing.assert_array_equal(full, again)
    # a strict prefix must decode (values differ from full, shape equal)
    part, _ = codec.decode_progressive(
        enc.stream, frame.codes, frame.weights, frame.n_voxels // 4
    )
    assert part.shape == full.shape
    pos, rec, w = codec.decode_lod(
        enc.stream, frame.codes, frame.weights, 5
    )
    assert pos.shape[0] == rec.shape[0] == w.shape[0] > 0


def test_batch_codec_rac_streams_match_single(frame_and_transform):
    from raht3dgs_tpu.models.batch_codec import BatchAttributeCodec

    frame, _, _ = frame_and_transform
    bc = BatchAttributeCodec(depth=8, entropy="auto")
    streams, _ = bc.encode([frame, frame], 16.0)
    single = AttributeCodec(depth=8, entropy="auto").encode(frame, 16.0)
    for s in streams:
        assert s.channels == single.stream.channels
        assert s.entropy_map == single.stream.entropy_map
    rec_b, _ = bc.decode(streams, [frame, frame])
    rec_s, _ = AttributeCodec(depth=8, entropy="auto").decode(
        single.stream, frame.codes, frame.weights
    )
    np.testing.assert_array_equal(rec_b[0], rec_s)
    np.testing.assert_array_equal(rec_b[1], rec_s)


def test_sequence_codec_inter_with_rac(frame_and_transform):
    """Temporal I/P chains compose with the RAC profile: the closed loop
    only needs identical reconstructions, which RAC preserves exactly."""
    from raht3dgs_tpu.models.temporal import SequenceCodec

    frame, _, _ = frame_and_transform
    rng = np.random.default_rng(5)
    V, rgb = synthetic_color_frame(n=4000, depth=8, seed=21)
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(rgb)))
    f0 = prepare_voxel_frame(V, yuv, 8)
    # drifted second frame (same cloud, shifted colors)
    yuv2 = yuv + rng.normal(0, 1.0, yuv.shape)
    f1 = prepare_voxel_frame(V, yuv2, 8)

    outs = {}
    for entropy in ("rlgr", "rac"):
        sc = SequenceCodec(8, entropy=entropy)
        s0, _ = sc.encode_frame(f0, 16.0)
        s1, _ = sc.encode_frame(f1, 16.0)
        dec = SequenceCodec(8, entropy=entropy)
        r0 = dec.decode_frame(s0, f0)
        r1 = dec.decode_frame(s1, f1)
        assert r0.shape[0] == f0.n_voxels
        assert r1.shape[0] == f1.n_voxels
        outs[entropy] = (r0, r1)
    np.testing.assert_array_equal(outs["rlgr"][0], outs["rac"][0])
    np.testing.assert_array_equal(outs["rlgr"][1], outs["rac"][1])


# -- CLI -----------------------------------------------------------------------


def test_encode_dataset_cli_entropy_auto(tmp_path):
    """--entropy auto end-to-end: same PSNR column as rlgr, fewer bytes,
    and the saved sequence decodes through the decode CLI."""
    import csv

    from raht3dgs_tpu.cli.decode import main as decode_main
    from raht3dgs_tpu.cli.encode_dataset import main as encode_main
    from raht3dgs_tpu.io.ply import save_ply_ascii
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    rng = np.random.default_rng(3)
    depth = 5
    d = tmp_path / "8iVFBv2" / "loot" / "Ply"
    d.mkdir(parents=True)
    pts = rng.integers(0, 2**depth, (900, 3))
    _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
    pts = pts[first]
    cols = np.clip(128 + 40 * np.sin(pts / 5.0) + rng.normal(0, 5, pts.shape),
                   0, 255)
    save_ply_ascii(d / "loot_vox10_1000.ply", pts.astype(float), cols,
                   width=2**depth - 1)

    rows = {}
    for entropy in ("rlgr", "auto"):
        out = tmp_path / f"{entropy}.csv"
        seq = tmp_path / f"{entropy}.r3ts"
        rc = encode_main([
            "--dataset", "8iVFBv2", "--sequence", "loot",
            "--data-root", str(tmp_path), "--frames", "1", "1",
            "--steps", "8", "--platform", "cpu", "--csv", str(out),
            "--entropy", entropy, "--code-geometry",
            "--save-sequence", str(seq),
        ])
        assert rc == 0
        with open(out) as f:
            rows[entropy] = list(csv.DictReader(f))[0]
    assert rows["auto"]["psnr"] == rows["rlgr"]["psnr"]
    assert float(rows["auto"]["Rate_bpp"]) <= float(rows["rlgr"]["Rate_bpp"])
    rc = decode_main([
        "--stream", str(tmp_path / "auto.r3ts"), "--frame", "0",
        "--output", str(tmp_path / "f0.ply"), "--platform", "cpu",
    ])
    assert rc == 0 and (tmp_path / "f0.ply").exists()
