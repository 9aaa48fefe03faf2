"""Opt-in dead-zone quantization (RD improver over the reference's
mid-tread quantizer; ops/quantize.py, stream flag bit 4).

The default ("mid") path must stay bitwise reference-parity; these tests
pin the deadzone path's math, container format, end-to-end roundtrip,
batched==single agreement, and the rate win it exists for.
"""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _frame(rng, n, depth):
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    pts = rng.integers(0, 2**depth, (n, 3))
    _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
    pts = pts[first]
    attrs = rng.uniform(0, 255, (len(pts), 3))
    return prepare_voxel_frame(pts.astype(np.int64), attrs, depth)


def test_deadzone_quantizer_bins():
    import jax.numpy as jnp

    from raht3dgs_tpu.ops.quantize import (
        dequantize_biased,
        quantize_deadzone,
    )

    step = jnp.asarray(1.0)
    f = jnp.asarray(1.0 / 3.0)
    x = jnp.asarray([0.0, 0.5, 0.66, 0.67, 1.5, 1.67, -0.66, -0.67, -1.67])
    q = np.asarray(quantize_deadzone(x, step, f))
    # dead zone is |x| < (1-f)*step = 2/3; bin k covers [(k-f), (k+1-f))
    assert q.tolist() == [0, 0, 0, 1, 1, 2, 0, -1, -2]
    # sign symmetry everywhere (unlike the reference's floor(x/s + 0.5))
    assert np.array_equal(
        np.asarray(quantize_deadzone(-x, step, f)), -q
    )
    rec = np.asarray(
        dequantize_biased(jnp.asarray(q), step, jnp.asarray(1.0 / 6.0))
    )
    # |q|=1 reconstructs at (1 + 1/6); zero bin at exactly 0
    np.testing.assert_allclose(
        rec, [0, 0, 0, 7 / 6, 7 / 6, 13 / 6, 0, -7 / 6, -13 / 6], atol=1e-12
    )


def test_deadzone_container_roundtrip_and_default_bytes(rng):
    from raht3dgs_tpu.codec.bitstream import FLAG_DEADZONE, FrameStream

    base = dict(
        depth=6, n_voxels=100,
        steps=np.asarray([2.0]), channels=[b"abc", b"defg", b"x"],
        vmin=np.zeros(3), width=63.0,
    )
    dz = FrameStream(**base, quant_mode="deadzone", quant_f=0.3,
                     rec_delta=0.2)
    blob = dz.to_bytes()
    back = FrameStream.from_bytes(blob)
    assert back.quant_mode == "deadzone"
    assert back.quant_f == 0.3 and back.rec_delta == 0.2
    assert back.channels == dz.channels

    # default-mode streams carry no new bytes (flag unset) — the format is
    # unchanged for every pre-deadzone writer/reader
    mid = FrameStream(**base)
    assert len(mid.to_bytes()) == len(blob) - 16
    assert not (mid.to_bytes()[5] & FLAG_DEADZONE)
    assert FrameStream.from_bytes(mid.to_bytes()).quant_mode == "mid"

    with pytest.raises(ValueError):
        FrameStream(**base, quant_mode="nope").to_bytes()


def test_deadzone_roundtrip_and_rate_win(rng):
    """End-to-end: the deadzone codec reconstructs within the quantizer's
    error bound and spends fewer bits than mid at the same step (the
    Laplacian-coefficient rate win it exists for)."""
    from raht3dgs_tpu.models.pipeline import AttributeCodec

    frame = _frame(rng, 4000, 6)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    step = 4.0
    f, delta = 1.0 / 3.0, 1.0 / 6.0

    mid = AttributeCodec(frame.depth)
    dz = AttributeCodec(frame.depth, quant_mode="deadzone", quant_f=f,
                        rec_delta=delta)

    enc_mid = mid.encode(frame, steps=step)
    enc_dz = dz.encode(frame, steps=step)
    assert enc_dz.stream.quant_mode == "deadzone"

    # decode through the container (serialization round trip included)
    from raht3dgs_tpu.codec.bitstream import FrameStream

    stream = FrameStream.from_bytes(enc_dz.stream.to_bytes())
    rec, _ = dz.decode(stream, frame.codes, frame.weights)
    # worst-case per-COEFFICIENT error: max(dead-zone edge (1-f)*step,
    # outer bin edge (1-f-delta)*step, inner edge (f+delta)*step).  The
    # transform is orthonormal, so the attribute-domain L2 error equals
    # the coefficient-domain L2 error => RMSE <= bound (L-inf does NOT
    # transfer through the butterfly; allow it 2x slack).
    bound = max(1.0 - f, 1.0 - f - delta, f + delta) * step
    err = np.abs(rec - ref)
    assert np.sqrt((err**2).mean()) < bound + 1e-6
    assert err.max() < 2 * bound

    # rate: strictly fewer payload bytes at the same step
    assert enc_dz.stream.payload_bytes < enc_mid.stream.payload_bytes

    # decoding the mid stream through the same decoder is unaffected
    rec_mid, _ = mid.decode(enc_mid.stream, frame.codes, frame.weights)
    err_mid = np.abs(rec_mid - ref)
    assert np.sqrt((err_mid**2).mean()) < 0.5 * step + 1e-6


def test_deadzone_target_bpp_search(rng):
    """search_step_for_bpp refines against true encodes, so it must land
    within budget for a deadzone codec too (the device rate model assumes
    mid and only seeds the search)."""
    from raht3dgs_tpu.models.pipeline import AttributeCodec
    from raht3dgs_tpu.models.rd_search import search_step_for_bpp

    frame = _frame(rng, 3000, 6)
    codec = AttributeCodec(frame.depth, quant_mode="deadzone")
    res = search_step_for_bpp(frame, 2.0, codec=codec)
    assert res.bpp <= 2.0 + 1e-9
    assert res.encoded.stream.quant_mode == "deadzone"
    # deadzone reaches the same budget with a finer step than mid
    res_mid = search_step_for_bpp(frame, 2.0)
    assert res.step <= res_mid.step


def test_deadzone_batched_matches_single(rng):
    """BatchAttributeCodec deadzone streams must be byte-identical to the
    single-frame codec's, and batched decode must match single decode."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.batch_codec import (
        BatchAttributeCodec,
        prepare_frame_batch,
    )
    from raht3dgs_tpu.models.pipeline import AttributeCodec
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    depth = 5
    pos, att = [], []
    for i in range(3):
        pts = rng.integers(0, 2**depth, (900 + 100 * i, 3))
        _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
        pos.append(pts[first].astype(np.int64))
        att.append(rng.uniform(0, 255, (len(first), 3)))
    frames = prepare_frame_batch(pos, att, depth)

    kw = dict(quant_mode="deadzone", quant_f=0.35, rec_delta=0.15)
    bc = BatchAttributeCodec(depth, **kw)
    sc = AttributeCodec(depth, **kw)

    streams, _ = bc.encode(frames, steps=2.0)
    for f, s in zip(frames, streams):
        single = sc.encode(f, steps=2.0).stream
        assert s.to_bytes() == single.to_bytes()

    recs, _ = bc.decode(streams, frames)
    for f, s, r in zip(frames, streams, recs):
        r1, _ = sc.decode(s, f.codes, f.weights)
        np.testing.assert_allclose(r, r1, atol=1e-9)

    # sweep path agrees too
    sweep = bc.encode_sweep(frames, [1.0, 8.0])
    for s_val, (streams_s, _) in zip([1.0, 8.0], sweep):
        for f, s in zip(frames, streams_s):
            assert (
                s.to_bytes() == sc.encode(f, steps=s_val).stream.to_bytes()
            )

    # mixed-quantizer batches are refused
    mixed = [streams[0], sc.encode(frames[1], steps=2.0).stream]
    mixed[1].quant_mode = "mid"
    mixed[1].rec_delta = 0.0
    with pytest.raises(ValueError, match="homogeneous"):
        bc.decode(mixed, frames[:2])
