"""Inter-depth predicted RAHT (ops/praht.py; container flags2 bit 1).

Beyond-reference transform mode: the stream keeps the plain RA-GFT
symbol layout but codes depth-group coefficients as residuals against an
upsampled prediction from the coarser depth's reconstruction. These
tests pin the closed loop (encoder reconstruction == decoder output,
bitwise), the no-prediction equivalence with the plain transform, the
container fields, the adaptivity guarantee on anti-predictive content,
dtype replay, and the composition with progressive/LOD decode and the
drivers.
"""

import numpy as np
import pytest

DEPTH = 6


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _codes(rng, n, depth=DEPTH):
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    pts = rng.integers(0, 2**depth, (3 * n, 3))
    return np.unique(morton_codes_np(pts, depth))[:n]


def _smooth_attrs(codes, depth, rng, d=3):
    """Spatially correlated attributes (prediction has something to win)."""
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    V = _decode_axes_np(codes.astype(np.uint64), depth).astype(float)
    mix = rng.uniform(0.5, 2.0, (3, d))
    return V @ mix + rng.normal(0, 1.0, (len(codes), d))


def test_closed_loop_bitwise_and_near_lossless(rng):
    from raht3dgs_tpu.ops.praht import praht_decode, praht_encode

    codes = _codes(rng, 2500)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    w = np.ones(len(codes))
    step = 1e-3
    sym, mask, rec = praht_encode(codes, attrs, w, DEPTH, step)
    out = praht_decode(sym, codes, w, DEPTH, step, predict_mask=mask)
    assert np.array_equal(rec, out)  # encoder loop IS the decoder loop
    assert np.abs(rec - attrs).max() < 10 * step


def test_no_prediction_matches_plain_transform(rng):
    """With prediction off, the per-depth recomputed AC coefficients equal
    the global transform's (RA-GFT-ordered) coefficients — the per-depth
    walk is the same orthonormal transform, only refactored."""
    from raht3dgs_tpu.ops.praht import _forward3, _pairings, cell_pyramid
    from raht3dgs_tpu.ops.prelude import (
        prelude,
        raht_forward_lists,
    )

    codes = _codes(rng, 1500)
    attrs = rng.normal(0, 50, (len(codes), 2))
    w = np.ones(len(codes))
    pyr = cell_pyramid(codes, w, DEPTH, attrs=attrs)
    got = [np.sqrt(pyr[0][1])[:, None] * (pyr[0][2] / pyr[0][1][:, None])]
    for d in range(1, DEPTH + 1):
        codes_d, W_d, S_d = pyr[d]
        pairs, idx_surv = _pairings(codes_d, W_d, np.float64)
        is_ac = np.ones(codes_d.shape[0], dtype=bool)
        is_ac[idx_surv] = False
        T = _forward3(
            (S_d / W_d[:, None]) * np.sqrt(W_d)[:, None], pairs
        )
        got.append(T[is_ac])
    got = np.concatenate(got)

    Lists, Flags, weights_l, order = prelude(codes, 3 * DEPTH)
    T_ref, _ = raht_forward_lists(attrs, Lists, Flags, weights_l)
    np.testing.assert_allclose(got, T_ref[order], rtol=1e-9, atol=1e-8)


def test_container_roundtrip_and_unknown_bit(rng):
    from raht3dgs_tpu.codec.bitstream import FrameStream

    s = FrameStream(
        depth=DEPTH, n_voxels=10, steps=np.asarray([2.0]),
        channels=[b"ab", b"c"], predict=True, predict_mask=0b101101,
    )
    blob = s.to_bytes()
    assert blob[4] == 5  # predicted streams need the flags2 byte
    s2 = FrameStream.from_bytes(blob)
    assert s2.predict and s2.predict_mask == 0b101101
    assert s2.entropy_map is None

    # non-predicted streams stay byte-identical to pre-predict writers
    plain = FrameStream(
        depth=DEPTH, n_voxels=10, steps=np.asarray([2.0]),
        channels=[b"ab", b"c"],
    )
    assert plain.to_bytes()[4] == 2

    # a future flags2 bit must fail loudly
    bad = bytearray(blob)
    off = len(b"R3TC") + 1 + 1 + 1 + 2 + 8 + 2  # flags2 offset
    bad[off] |= 1 << 2
    with pytest.raises(ValueError, match="flags2"):
        FrameStream.from_bytes(bytes(bad))
    with pytest.raises(ValueError, match="predict mask"):
        FrameStream.from_bytes(blob[: off + 1])


def test_pipeline_rate_win_and_composition(rng):
    """Predicted streams beat plain ones on correlated content at equal
    step and no worse distortion; composes with deadzone + RAC + chunks."""
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    codes = _codes(rng, 3000)
    V = _decode_axes_np(codes.astype(np.uint64), DEPTH)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    frame = prepare_voxel_frame(V, attrs, DEPTH)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]

    for kw in (
        {},
        {"quant_mode": "deadzone", "entropy": "auto", "chunk": 256},
    ):
        cp = AttributeCodec(DEPTH, predict=True, **kw)
        c0 = AttributeCodec(DEPTH, **kw)
        e_p = cp.encode(frame, 4.0)
        e_0 = c0.encode(frame, 4.0)
        assert e_p.stream.predict and not e_0.stream.predict
        assert e_p.stream.payload_bytes < e_0.stream.payload_bytes
        # ANY codec instance decodes a predicted stream (flag-driven)
        rec_p, _ = c0.decode(e_p.stream, frame.codes, frame.weights)
        rec_0, _ = c0.decode(e_0.stream, frame.codes, frame.weights)
        mse_p = np.mean((rec_p - ref) ** 2)
        mse_0 = np.mean((rec_0 - ref) ** 2)
        assert mse_p <= mse_0 * 1.2


def test_adaptive_never_much_worse_on_noise(rng):
    """Uncorrelated content: prediction can't win, the per-depth decision
    must fall back to plain coefficients (rate within the decision
    proxy's slack of the plain stream)."""
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    codes = _codes(rng, 2500)
    V = _decode_axes_np(codes.astype(np.uint64), DEPTH)
    attrs = rng.normal(0, 40, (len(codes), 3))  # pure noise
    frame = prepare_voxel_frame(V, attrs, DEPTH)
    e_p = AttributeCodec(DEPTH, predict=True).encode(frame, 4.0)
    e_0 = AttributeCodec(DEPTH).encode(frame, 4.0)
    assert e_p.stream.payload_bytes <= int(e_0.stream.payload_bytes * 1.03)


def test_dtype_replay_from_stream_flag(rng):
    """A float32 predicted stream must decode through the float32 loop
    even on a float64-default codec instance (the stream records it)."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    codes = _codes(rng, 1200)
    V = _decode_axes_np(codes.astype(np.uint64), DEPTH)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    fr32 = prepare_voxel_frame(V, attrs, DEPTH, dtype=jnp.float32)
    e32 = AttributeCodec(DEPTH, predict=True, dtype=jnp.float32).encode(
        fr32, 4.0
    )
    assert e32.stream.dtype32
    rec_a, _ = AttributeCodec(DEPTH, dtype=jnp.float32).decode(
        e32.stream, fr32.codes, fr32.weights
    )
    rec_b, _ = AttributeCodec(DEPTH).decode(  # f64 instance, same stream
        e32.stream, fr32.codes, fr32.weights
    )
    assert rec_a.dtype == np.float32
    assert np.array_equal(rec_a, rec_b)


def test_progressive_and_lod(rng):
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    codes = _codes(rng, 2000)
    V = _decode_axes_np(codes.astype(np.uint64), DEPTH)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    frame = prepare_voxel_frame(V, attrs, DEPTH)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    cp = AttributeCodec(DEPTH, predict=True)
    st = cp.encode(frame, 2.0).stream

    full, _ = cp.decode(st, frame.codes, frame.weights)
    prog, _ = cp.decode_progressive(
        st, frame.codes, frame.weights, st.n_voxels
    )
    assert np.array_equal(full, prog)  # full decode IS the n-prefix
    quarter, _ = cp.decode_progressive(
        st, frame.codes, frame.weights, st.n_voxels // 4
    )
    assert np.isfinite(quarter).all()
    assert np.mean((quarter - ref) ** 2) >= np.mean((full - ref) ** 2)

    pos, means, cw = cp.decode_lod(st, frame.codes, frame.weights, 3)
    assert pos.shape == means.shape[:1] + (3,)
    assert cw.sum() == pytest.approx(frame.n_voxels)
    assert (pos >= 0).all() and (pos < 2**3).all()
    # unit weights: a full-depth LOD is the leaf reconstruction itself
    pos_f, means_f, _ = cp.decode_lod(st, frame.codes, frame.weights,
                                      DEPTH)
    assert np.array_equal(means_f, full)
    np.testing.assert_array_equal(pos_f, V)


def test_guards(rng):
    from raht3dgs_tpu.models.pipeline import AttributeCodec

    with pytest.raises(ValueError, match="RA-GFT"):
        AttributeCodec(DEPTH, predict=True, order_mode="weight_desc")
    with pytest.raises(ValueError, match="golden"):
        AttributeCodec(DEPTH, predict=True, impl="golden")


def test_plan_mismatch_fails_loudly(rng):
    """A plan from ANOTHER frame must be rejected, not silently decode the
    wrong stream (plans are caller-managed reuse)."""
    from raht3dgs_tpu.ops.praht import praht_encode, praht_plan

    codes = _codes(rng, 1000)
    other = _codes(rng, 1000)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    w = np.ones(len(codes))
    plan = praht_plan(other, np.ones(len(other)), DEPTH)
    with pytest.raises(ValueError, match="Morton codes"):
        praht_encode(codes, attrs, w, DEPTH, 2.0, plan=plan)
    plan32 = praht_plan(codes, w, DEPTH, fdtype=np.float32)
    with pytest.raises(ValueError, match="float32"):
        praht_encode(codes, attrs, w, DEPTH, 2.0, plan=plan32)
    wplan = praht_plan(codes, w * 2, DEPTH)
    with pytest.raises(ValueError, match="weights"):
        praht_encode(codes, attrs, w, DEPTH, 2.0, plan=wplan)


def test_sequence_codec_composes_with_predict(rng):
    """--inter + --predict: I-frames AND P-frame residuals ride the
    predicted loop; decode (same SequenceCodec API) reproduces the
    encoder's closed-loop reconstructions bitwise, and on a coherent
    sequence the inter+predict streams beat all-intra predicted ones."""
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.models.temporal import SequenceCodec
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    codes = _codes(rng, 2000)
    V = _decode_axes_np(codes.astype(np.uint64), DEPTH)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    frames = []
    for k in range(4):
        Vk = np.clip(V + k, 0, 2**DEPTH - 1)
        from raht3dgs_tpu.ops.prelude import morton_codes_np

        ck = morton_codes_np(Vk, DEPTH)
        _, first = np.unique(ck, return_index=True)
        frames.append(prepare_voxel_frame(
            Vk[first], attrs[first] + 0.2 * k, DEPTH
        ))

    sc = SequenceCodec(DEPTH, gop=8, predict=True)
    streams, recons = sc.encode_sequence(frames, 2.0)
    assert streams[0].predict and not streams[0].inter
    assert any(s.inter for s in streams[1:]), "no P-frame chosen"
    assert all(s.predict for s in streams)

    dec = SequenceCodec(DEPTH, gop=8, predict=True)
    outs = dec.decode_sequence(streams, frames)
    for r, o in zip(recons, outs):
        assert np.array_equal(r, o)  # closed loop is bitwise

    # rate: temporal prediction must help on the coherent sequence
    intra = AttributeCodec(DEPTH, predict=True)
    intra_bytes = sum(
        intra.encode(f, 2.0).stream.payload_bytes for f in frames
    )
    inter_bytes = sum(s.payload_bytes for s in streams)
    assert inter_bytes < intra_bytes


def test_batch_codec_composes_with_predict(rng):
    """--batch + --predict: streams byte-identical to the per-frame codec
    (encode, encode_sweep regrouping, and decode all delegate to the
    same host closed loop)."""
    from raht3dgs_tpu.models.batch_codec import (
        BatchAttributeCodec,
        prepare_frame_batch,
    )
    from raht3dgs_tpu.models.pipeline import AttributeCodec
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    rngs = [np.random.default_rng(s) for s in (1, 2, 3)]
    pos, ats = [], []
    for r in rngs:
        c = _codes(r, 1200)
        pos.append(_decode_axes_np(c.astype(np.uint64), DEPTH))
        ats.append(_smooth_attrs(c, DEPTH, r))
    frames = prepare_frame_batch(pos, ats, DEPTH)

    bc = BatchAttributeCodec(DEPTH, predict=True, entropy="auto")
    single = AttributeCodec(DEPTH, predict=True, entropy="auto")
    streams, _ = bc.encode(frames, 4.0)
    for f, s in zip(frames, streams):
        assert s.to_bytes() == single.encode(f, 4.0).stream.to_bytes()

    sweep = bc.encode_sweep(frames, [2.0, 8.0])
    for si, step in enumerate([2.0, 8.0]):
        for f, s in zip(frames, sweep[si][0]):
            assert s.to_bytes() == single.encode(f, step).stream.to_bytes()

    recs, _ = bc.decode(streams, frames)
    for f, s, r in zip(frames, streams, recs):
        want, _ = single.decode(s, f.codes, f.weights)
        assert np.array_equal(r, want)

    # mixed predicted/plain batches must fail loudly
    plain = AttributeCodec(DEPTH).encode(frames[0], 4.0).stream
    with pytest.raises(ValueError, match="mix"):
        bc.decode([plain] + streams[1:], frames)


def test_rate_targeted_predict(rng):
    """--target-bpp + --predict: the step search lands at/under budget
    with a PREDICTED stream (the refine loop corrects the plain-transform
    rate model against true predicted encodes)."""
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.models.rd_search import search_step_for_bpp
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    codes = _codes(rng, 2500)
    V = _decode_axes_np(codes.astype(np.uint64), DEPTH)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    frame = prepare_voxel_frame(V, attrs, DEPTH)
    codec = AttributeCodec(DEPTH, predict=True)
    res = search_step_for_bpp(frame, 2.0, codec=codec)
    assert res.encoded.stream.predict
    assert res.bpp <= 2.0
    # the budget is actually used (not a trivially coarse step)
    assert res.bpp > 0.3


def test_cli_roundtrip(tmp_path, rng):
    """encode_ply --predict writes decodable self-contained streams; the
    decode CLI auto-detects the mode (no flag)."""
    from raht3dgs_tpu.cli.decode import main as dec_main
    from raht3dgs_tpu.cli.encode_ply import main as enc_main
    from raht3dgs_tpu.io.ply import read_ply_8i, save_ply_ascii

    codes = _codes(rng, 1500)
    from raht3dgs_tpu.ops.praht import _decode_axes_np

    V = _decode_axes_np(codes.astype(np.uint64), DEPTH)
    C = rng.integers(0, 255, (len(codes), 3)).astype(float)
    src = tmp_path / "in.ply"
    save_ply_ascii(src, V.astype(float), C, width=2**DEPTH - 1)

    out = tmp_path / "streams"
    rc = enc_main([
        "--input", str(src), "--depth", str(DEPTH), "--steps", "2",
        "--predict", "--code-geometry", "--save-streams", str(out),
        "--platform", "cpu", "--csv", str(tmp_path / "rt.csv"),
    ])
    assert rc == 0
    streams = sorted(out.glob("*.r3tc"))
    assert streams
    from raht3dgs_tpu.codec.bitstream import FrameStream

    st = FrameStream.from_bytes(streams[0].read_bytes())
    assert st.predict and st.geometry is not None

    dst = tmp_path / "rec.ply"
    assert dec_main([
        "--stream", str(streams[0]), "--output", str(dst),
        "--platform", "cpu",
    ]) == 0
    Vr, Cr, _ = read_ply_8i(str(dst))
    assert len(Vr) == len(codes)
    # step-2 YUV quantization stays within a few integer color levels
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    order = np.argsort(morton_codes_np(V, DEPTH), kind="stable")
    order_r = np.argsort(morton_codes_np(
        np.asarray(Vr).astype(np.int64), DEPTH), kind="stable")
    assert np.abs(
        np.asarray(Cr)[order_r].astype(float) - C[order]
    ).max() < 16


def test_predict_mask_decides_decode(rng):
    """The decoder honors the SIGNALLED mask, not a re-derived decision:
    flipping a mask bit changes the reconstruction (corrupt-stream
    semantics are deterministic, not crashy)."""
    from raht3dgs_tpu.ops.praht import praht_decode, praht_encode

    codes = _codes(rng, 1200)
    attrs = _smooth_attrs(codes, DEPTH, rng)
    w = np.ones(len(codes))
    sym, mask, rec = praht_encode(codes, attrs, w, DEPTH, 2.0)
    assert mask  # smooth content: prediction used somewhere
    out = praht_decode(sym, codes, w, DEPTH, 2.0, predict_mask=mask)
    assert np.array_equal(rec, out)
    flipped = mask ^ (1 << (int(mask).bit_length() - 1))
    out2 = praht_decode(sym, codes, w, DEPTH, 2.0, predict_mask=flipped)
    assert not np.array_equal(out, out2)
    assert np.isfinite(out2).all()
