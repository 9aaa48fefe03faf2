import numpy as np
import jax.numpy as jnp
import pytest

from raht3dgs_tpu.codec.bitstream import FrameStream
from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from raht3dgs_tpu.ops.morton import morton_decode
from conftest import unique_voxel_cloud


def _frame(rng, n=700, depth=6, d_attr=3, bucket=256):
    pts, codes, attrs = unique_voxel_cloud(rng, n, depth, d_attr=d_attr)
    return prepare_voxel_frame(pts.astype(np.int64), attrs, depth, bucket=bucket)


def test_encode_decode_step1_near_lossless(rng):
    frame = _frame(rng)
    codec = AttributeCodec(frame.depth)
    enc = codec.encode(frame, steps=1.0)
    dec, _ = codec.decode(enc.stream, frame.codes, frame.weights)
    attrs = np.asarray(frame.attributes)[: frame.n_voxels]
    # step=1: reconstruction within quantization bound (reference invariant,
    # encode_ply.py:212-215)
    assert np.allclose(dec, attrs, rtol=1e-3, atol=1.0)


def test_rate_decreases_with_step(rng):
    frame = _frame(rng)
    codec = AttributeCodec(frame.depth)
    coeffs, order, _, _ = codec.transform(frame)
    rates = []
    for step in (1, 4, 16, 64):
        enc = codec.encode(frame, steps=float(step), coeffs=coeffs, order=order)
        rates.append(enc.stream.bpp())
    assert rates == sorted(rates, reverse=True)


def test_distortion_decreases_with_finer_step(rng):
    frame = _frame(rng)
    codec = AttributeCodec(frame.depth)
    attrs = np.asarray(frame.attributes)[: frame.n_voxels]
    errs = []
    for step in (1, 16, 64):
        enc = codec.encode(frame, steps=float(step))
        dec, _ = codec.decode(enc.stream, frame.codes, frame.weights)
        errs.append(np.sqrt(np.mean((dec - attrs) ** 2)))
    assert errs[0] < errs[1] < errs[2]


def test_stream_serialization_roundtrip(rng):
    frame = _frame(rng, d_attr=5)
    codec = AttributeCodec(frame.depth)
    enc = codec.encode(frame, steps=np.array([1.0, 2.0, 4.0, 8.0, 16.0]))
    blob = enc.stream.to_bytes()
    back = FrameStream.from_bytes(blob)
    assert back.depth == enc.stream.depth
    assert back.n_voxels == enc.stream.n_voxels
    assert back.channels == enc.stream.channels
    np.testing.assert_array_equal(back.steps, enc.stream.steps)
    # and it still decodes identically
    dec1, _ = codec.decode(enc.stream, frame.codes, frame.weights)
    dec2, _ = codec.decode(back, frame.codes, frame.weights)
    np.testing.assert_array_equal(dec1, dec2)


def test_per_channel_steps(rng):
    frame = _frame(rng, d_attr=4)
    codec = AttributeCodec(frame.depth)
    steps = np.array([1.0, 1.0, 64.0, 64.0])
    enc = codec.encode(frame, steps=steps)
    dec, _ = codec.decode(enc.stream, frame.codes, frame.weights)
    attrs = np.asarray(frame.attributes)[: frame.n_voxels]
    err = np.sqrt(np.mean((dec - attrs) ** 2, axis=0))
    assert err[0] < err[2] and err[1] < err[3]


def test_bucketing_invariance(rng):
    # Same frame through two bucket sizes -> identical streams.
    pts, codes, attrs = unique_voxel_cloud(rng, 500, 6)
    f1 = prepare_voxel_frame(pts.astype(np.int64), attrs, 6, bucket=512)
    f2 = prepare_voxel_frame(pts.astype(np.int64), attrs, 6, bucket=2048)
    c = AttributeCodec(6)
    e1 = c.encode(f1, steps=4.0)
    e2 = c.encode(f2, steps=4.0)
    assert e1.stream.channels == e2.stream.channels


def test_timer_stages_populated(rng):
    frame = _frame(rng)
    codec = AttributeCodec(frame.depth)
    enc = codec.encode(frame, steps=2.0)
    for k in ("RAHT_transform_time", "Quant_time", "Entropy_enc_time"):
        assert enc.timer.get(k) > 0
    _, t = codec.decode(enc.stream, frame.codes, frame.weights)
    for k in ("Coeff_reorder_dec_time", "Entropy_dec_time", "iRAHT_time"):
        assert t.get(k) > 0


def test_order_modes(rng):
    from raht3dgs_tpu.models.pipeline import AttributeCodec as AC

    frame = _frame(rng)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    for mode in ("ragft", "weight_desc", "morton"):
        codec = AC(frame.depth, order_mode=mode)
        enc = codec.encode(frame, steps=2.0)
        assert enc.stream.order_mode == mode
        # container carries the mode, and decode mirrors it
        from raht3dgs_tpu.codec.bitstream import FrameStream

        back = FrameStream.from_bytes(enc.stream.to_bytes())
        assert back.order_mode == mode
        dec, _ = codec.decode(back, frame.codes, frame.weights)
        assert np.allclose(dec, ref, atol=2.0)


def test_weight_desc_order_definition(rng):
    # stream order for weight_desc must be descending node weight
    import jax.numpy as jnp
    from raht3dgs_tpu.ops.raht import raht_forward
    from raht3dgs_tpu.ops.reorder import weight_descending_order

    frame = _frame(rng)
    res = raht_forward(frame.codes, frame.attributes, frame.weights, frame.depth)
    order = np.asarray(weight_descending_order(res.structure.node_weights))
    w = np.asarray(res.structure.node_weights)[order]
    assert np.all(np.diff(w) <= 0)


def test_duplicate_positions_rejected(rng):
    pts, codes, attrs = unique_voxel_cloud(rng, 50, 4)
    pts2 = np.concatenate([pts, pts[:1]])
    attrs2 = np.concatenate([attrs, attrs[:1]])
    try:
        prepare_voxel_frame(pts2.astype(np.int64), attrs2, 4)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_int32_code_narrowing_matches_int64(rng):
    import jax.numpy as jnp
    from raht3dgs_tpu.ops.raht import raht_forward

    depth = 6
    pts, codes, attrs = unique_voxel_cloud(rng, 400, depth)
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth, bucket=512)
    assert frame.codes.dtype == jnp.int32  # levels fit -> narrowed
    res32 = raht_forward(frame.codes, frame.attributes, frame.weights, depth)
    res64 = raht_forward(
        frame.codes.astype(jnp.int64), frame.attributes, frame.weights, depth
    )
    np.testing.assert_array_equal(
        np.asarray(res32.coeffs), np.asarray(res64.coeffs)
    )
    np.testing.assert_array_equal(
        np.asarray(res32.structure.drop_level),
        np.asarray(res64.structure.drop_level),
    )


def test_float32_production_path(rng):
    # The TPU fast path runs float32; verify sane RD behavior and exact
    # stream determinism across repeated encodes.
    depth = 6
    pts, _, attrs = unique_voxel_cloud(rng, 900, depth)
    frame = prepare_voxel_frame(
        pts.astype(np.int64), attrs, depth, bucket=512, dtype=jnp.float32
    )
    codec = AttributeCodec(depth, dtype=jnp.float32)
    enc1 = codec.encode(frame, steps=2.0)
    enc2 = codec.encode(frame, steps=2.0)
    assert enc1.stream.channels == enc2.stream.channels
    rec, _ = codec.decode(enc1.stream, frame.codes, frame.weights)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    assert np.allclose(rec, ref, atol=2.0)
    # L2 is what the orthonormal transform bounds: coefficient errors are
    # <= step/2 each, so RMSE <= step/2 (max error may exceed it locally)
    rmse = np.sqrt(np.mean((rec - ref) ** 2))
    assert rmse <= 1.0 + 1e-3


def test_pipeline_reference_default_depth(rng):
    # J=18 is the reference drivers' default depth (encode_ply.py) — codes
    # are int64 (55 levels) and the pipeline's int32 narrowing must stay off.
    from conftest import unique_voxel_cloud

    depth = 18
    pts, _, attrs = unique_voxel_cloud(rng, 400, depth)
    frame = prepare_voxel_frame(pts, attrs * 50, depth, bucket=512)
    assert np.asarray(frame.codes).dtype == np.int64
    codec = AttributeCodec(depth)
    enc = codec.encode(frame, steps=1.0)
    rt = type(enc.stream).from_bytes(enc.stream.to_bytes())
    rec, _ = codec.decode(rt, frame.codes, frame.weights)
    rmse = float(np.sqrt(np.mean((rec - np.asarray(frame.attributes)[:400]) ** 2)))
    assert rmse <= 0.5  # step/2 quantization bound


def test_stream_format_frozen(rng):
    # Golden byte hash of a fixed-seed encode: catches ANY accidental
    # bitstream drift (container layout, quantization, coefficient order,
    # entropy coding). A deliberate format change must update this hash
    # and bump the container VERSION.
    import hashlib
    import os

    from conftest import unique_voxel_cloud

    if os.environ.get("RAHT3DGS_RAHT_IMPL", "span") != "span":
        pytest.skip(
            "golden hash pins the default (span) transform; other impls "
            "agree to fp tolerance, not bitwise (test_properties covers "
            "their equivalence)"
        )
    r = np.random.default_rng(42)
    pts, _, _ = unique_voxel_cloud(r, 600, 6)
    attrs = (pts * 7 % 256).astype(np.float64)
    frame = prepare_voxel_frame(pts, attrs, 6, bucket=1024)
    blob = AttributeCodec(6).encode(frame, steps=4.0).stream.to_bytes()
    # VERSION 2 (flag bits 4-7: deadzone / inter / probe set / dtype);
    # payload bytes identical to v1, header version byte differs
    assert hashlib.sha256(blob).hexdigest() == (
        "0eb4f853604879400a90955a870776ad9d24a629f41e807c3902a5727f1065fb"
    ), "bitstream format drifted — if intentional, bump VERSION + this hash"


def test_stream_format_frozen_f32(rng):
    # The f32 fast path's OWN golden: its coefficient low bits depend on
    # the compensated-scan association (ops/raht_span._ds_cumsum), which
    # the f64 golden above never touches. A deliberate association change
    # is legal (decode needs no cross-version agreement) but must be a
    # CONSCIOUS re-pin here, never silent drift.
    import hashlib
    import os

    import jax.numpy as jnp

    from conftest import unique_voxel_cloud

    if os.environ.get("RAHT3DGS_RAHT_IMPL", "span") != "span":
        pytest.skip("golden hash pins the default (span) transform")
    if os.environ.get("RAHT3DGS_SPAN_SUMS", "ds") != "ds":
        pytest.skip("golden hash pins the default (ds blocked) f32 sums")
    r = np.random.default_rng(42)
    pts, _, _ = unique_voxel_cloud(r, 600, 6)
    attrs = (pts * 7 % 256).astype(np.float64)
    frame = prepare_voxel_frame(pts, attrs, 6, bucket=1024,
                                dtype=jnp.float32)
    blob = AttributeCodec(6, dtype=jnp.float32).encode(
        frame, steps=4.0
    ).stream.to_bytes()
    assert hashlib.sha256(blob).hexdigest() == (
        "ffbc0dfc716218a8fdc2fbd1368d91304d60e460cd80be1b65163b2f8efc9de0"
    ), ("f32-path bitstream drifted — if the scan association changed "
        "deliberately, re-pin this hash")


def test_codec_at_maximum_depth_21(rng):
    """J=21 — the int64 Morton ceiling (the MATLAB reference caps J there,
    matlab/encode_ply.m:27). Full encode->stream->decode roundtrip."""
    import os

    import jax.numpy as jnp

    from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame

    if os.environ.get("RAHT3DGS_RAHT_IMPL") == "scan":
        pytest.skip(
            "the scan impl documents no uint64 (J=21) support — its -1 "
            "sentinels assume a signed code dtype (guard clause in "
            "ops/raht_scan.py)"
        )

    depth = 21
    n = 300
    pos = rng.integers(0, 2**depth, (4 * n, 3)).astype(np.int64)
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    codes = morton_codes_np(pos, depth)
    _, first = np.unique(codes, return_index=True)
    pos = pos[first[:n]]
    attrs = rng.uniform(0, 255, (len(pos), 3))

    codec = AttributeCodec(depth, dtype=jnp.float64)
    frame = prepare_voxel_frame(pos, attrs, depth, bucket=512,
                                dtype=jnp.float64)
    assert frame.codes.dtype == jnp.uint64  # 3*21+1 bits: sentinel needs bit 63
    enc = codec.encode(frame, 2.0)
    blob = enc.stream.to_bytes()
    from raht3dgs_tpu.codec.bitstream import FrameStream

    stream = FrameStream.from_bytes(blob)
    rec, _ = codec.decode(stream, frame.codes, frame.weights)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    assert np.abs(rec - ref).max() < 2.0 * 1.1


def test_weight_desc_order_consistent_across_impls(rng):
    """weight_desc decode must work for EVERY forward implementation: the
    stream permutation derives from the shared structure function on both
    sides (level-loop forwards accumulate node weights in a different
    summation order — bitwise-divergent for fractional f32 weights)."""
    import jax.numpy as jnp

    depth = 6
    pts, codes, attrs = unique_voxel_cloud(rng, 900, depth)
    w = rng.uniform(0.1, 3.0, len(pts))
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth,
                                bucket=1024, dtype=jnp.float32, weights=w)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    for impl in ("dense", "span", "compact", "scan"):
        codec = AttributeCodec(depth, dtype=jnp.float32,
                               order_mode="weight_desc", impl=impl)
        enc = codec.encode(frame, steps=1.0)
        rec, _ = codec.decode(enc.stream, frame.codes, frame.weights)
        assert np.abs(rec - ref).max() < 1.5, impl


def test_narrow_fetch_streams_identical(rng, monkeypatch):
    """The int16 narrow fetch (tunnel optimization) must be stream-invisible:
    forcing it on produces byte-identical containers."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    depth = 5
    pts = rng.integers(0, 2**depth, (1200, 3))
    _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
    pts = pts[first]
    attrs = rng.uniform(0, 255, (len(pts), 3))
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth)
    codec = AttributeCodec(depth)

    monkeypatch.setenv("RAHT3DGS_NARROW_FETCH", "0")
    a = codec.encode(frame, steps=8.0).stream.to_bytes()
    monkeypatch.setenv("RAHT3DGS_NARROW_FETCH", "1")
    b = codec.encode(frame, steps=8.0).stream.to_bytes()
    assert a == b

    # huge coefficients must decline the narrow path and still be exact
    frame_big = prepare_voxel_frame(pts.astype(np.int64), attrs * 1e4, depth)
    big = codec.encode(frame_big, steps=0.25)
    rec, _ = codec.decode(big.stream, frame_big.codes, frame_big.weights)
    ref = np.asarray(frame_big.attributes)[: frame_big.n_voxels]
    assert np.abs(rec - ref).max() < 0.25 + 1e-3


def test_narrow_fetch_rail_patch_regimes(monkeypatch):
    """_narrow_fetch must be exact in all five device->host regimes:
    all-int8 / all-int16 (plain narrow), a few overflows at either width
    (clamped fetch + exact rail patch), and dense overflow (full int32
    fallback). The chosen wire dtype is observable on the PendingFetch
    buffer."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.pipeline import (
        _fetch_stats,
        _finish_fetch,
        _narrow_fetch,
        _start_fetch,
    )

    monkeypatch.setenv("RAHT3DGS_NARROW_FETCH", "1")
    rng = np.random.default_rng(7)
    base = rng.integers(-3000, 3000, (8, 400)).astype(np.int32)

    def wire_dtype(arr):
        p = _start_fetch(jnp.asarray(arr), np.asarray(_fetch_stats(jnp.asarray(arr))))
        got = _finish_fetch(p)
        assert got.dtype == np.int32 and np.array_equal(got, arr)
        return p.buf.dtype, p.src is not None

    # regime 1: fits int16, too many int8 rails to patch -> int16 wire
    assert wire_dtype(base) == (jnp.int16, False)

    # regime 2: sparse outliers (incl. exact rails +-32767/-32768, which a
    # clamped cast aliases) over an int16-wide base -> int16 wire plus
    # exact patch gather
    sparse = base.copy()
    flat = sparse.reshape(-1)
    flat[[0, 77, 1234, 3100]] = [10**9, -(10**9), 32767, -32768]
    assert wire_dtype(sparse) == (jnp.int16, True)

    # regime 3: dense overflow (> size/8 rails) -> int32 wire
    dense = base.copy()
    dense[::2] += 10**6
    assert wire_dtype(dense) == (jnp.int32, False)

    # regime 4: everything fits int8 -> int8 wire, no patch source kept
    base8 = (base // 32).astype(np.int32)  # |v| < 94
    assert wire_dtype(base8) == (jnp.int8, False)

    # regime 5: sparse outliers (incl. the +-127 rail itself) over an
    # int8-narrow base -> int8 wire plus exact patch gather
    sparse8 = base8.copy()
    sparse8.reshape(-1)[[3, 99, 2222, 3101]] = [10**9, -4000, 127, -127]
    assert wire_dtype(sparse8) == (jnp.int8, True)

    # patch knob off: sparse outliers fall back to the next exact tier
    monkeypatch.setenv("RAHT3DGS_FETCH_PATCH", "0")
    assert wire_dtype(sparse) == (jnp.int32, False)
    assert wire_dtype(sparse8) == (jnp.int32, False)
    monkeypatch.delenv("RAHT3DGS_FETCH_PATCH")

    # and the one-shot helper agrees end to end
    assert np.array_equal(_narrow_fetch(jnp.asarray(sparse)), sparse)


def test_narrow_fetch_patch_streams_identical(rng, monkeypatch):
    """Encode with sparse coefficient outliers must produce byte-identical
    streams whether the rail-patched int16 fetch or the plain int32 fetch
    carried the coefficients."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    depth = 5
    pts = rng.integers(0, 2**depth, (1500, 3))
    _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
    pts = pts[first]
    # mostly small attributes with a handful of huge outliers: at fine
    # steps the DC/outlier coefficients overflow int16 while the bulk fits
    attrs = rng.uniform(0, 4.0, (len(pts), 3))
    attrs[rng.integers(0, len(pts), 5)] = 3e5
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth)
    codec = AttributeCodec(depth)

    monkeypatch.setenv("RAHT3DGS_NARROW_FETCH", "0")
    a = codec.encode(frame, steps=0.5).stream.to_bytes()
    monkeypatch.setenv("RAHT3DGS_NARROW_FETCH", "1")
    b = codec.encode(frame, steps=0.5).stream.to_bytes()
    assert a == b

    # confirm the workload actually exercised the patch regime
    from raht3dgs_tpu.models.pipeline import (
        _fetch_stats,
        _quant_reorder_device,
        coefficient_order,
    )
    from raht3dgs_tpu.ops.raht_span import raht_structure_span

    coeffs, order, _, _ = codec.transform(frame)
    q = _quant_reorder_device(
        coeffs, jnp.atleast_1d(jnp.asarray(0.5, coeffs.dtype)), order,
        frame.n_voxels,
    )
    maxabs, rails8, rails16 = (int(x) for x in np.asarray(_fetch_stats(q)))
    assert maxabs >= (1 << 15) and 0 < rails16
    assert rails8 <= q.size // 16 or rails16 <= q.size // 8


def test_encode_sweep_matches_per_step(rng):
    """AttributeCodec.encode_sweep (pipelined: async dispatch + async
    fetch + drained entropy) must be byte-identical to serial per-step
    encodes across the sweep."""
    frame = _frame(rng, 400, 5)
    codec = AttributeCodec(frame.depth)
    coeffs, order, _, _ = codec.transform(frame)
    steps = [1.0, 4.0, 16.0, 64.0]
    sweep = codec.encode_sweep(frame, steps, coeffs=coeffs, order=order)
    assert len(sweep) == len(steps)
    for s, enc in zip(steps, sweep):
        ref = codec.encode(frame, steps=s, coeffs=coeffs, order=order)
        assert enc.stream.channels == ref.stream.channels
        assert enc.stream.steps.tolist() == ref.stream.steps.tolist()
        assert enc.timer.stages.get("Entropy_enc_time", 0) > 0
