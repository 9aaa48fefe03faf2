"""The 'golden' codec impl: host ragged transform, reference byte parity.

``AttributeCodec(impl="golden")`` replays the torch reference pipeline
bit-for-bit (torch-compatible sqrt for the butterfly constants, the
reference's homogeneous YUV form, reference op order in decode) so RLGR
streams are byte-identical to the reference even at quantization tie
points. These tests pin:
- bitwise equality of the golden forward/inverse against an in-test torch
  replication of the reference butterfly (``RAHT.py:253-336``);
- agreement with the device impls at crosscheck tolerance;
- the mode's validation guards.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from raht3dgs_tpu.ops.prelude import (
    morton_codes_np,
    parity_sqrt,
    prelude,
    raht_forward_lists,
    raht_inverse_lists,
)


def _frame(rng, n=4000, depth=9):
    from raht3dgs_tpu.ops.morton import morton_decode
    import jax.numpy as jnp

    pts = rng.integers(0, 2**depth, size=(2 * n, 3))
    codes = np.unique(morton_codes_np(pts, depth))[:n]
    V = np.asarray(morton_decode(jnp.asarray(codes), depth), dtype=np.int64)
    rgb = np.clip(
        np.round(V / 2**depth * 255.0 + rng.normal(0, 8, size=V.shape)),
        0, 255,
    )  # integer colors: produces exact half-integer coefficient ties
    return V, rgb, codes


def _torch_reference_forward(C_np, Lists, Flags, weights):
    """The reference butterfly (RAHT.py:253-336) replicated in torch —
    the oracle for bitwise parity of the golden path."""
    T = torch.from_numpy(C_np.copy())
    for j in range(len(Flags)):
        flag = torch.from_numpy(Flags[j])
        right = torch.cat([torch.tensor([False]), flag[:-1]])
        i0 = torch.from_numpy(Lists[j])[flag]
        i1 = torch.from_numpy(Lists[j])[right]
        if i0.numel() == 0:
            continue
        w0 = torch.from_numpy(weights[j])[flag].to(torch.float64)
        w1 = torch.from_numpy(weights[j])[right].to(torch.float64)
        denom = w0 + w1
        a = torch.sqrt(w0 / denom).unsqueeze(1)
        b = torch.sqrt(w1 / denom).unsqueeze(1)
        x0 = T.index_select(0, i0)
        x1 = T.index_select(0, i1)
        T.scatter_(0, i0.unsqueeze(1).expand(-1, T.shape[1]), a * x0 + b * x1)
        T.scatter_(0, i1.unsqueeze(1).expand(-1, T.shape[1]), -b * x0 + a * x1)
    return T.numpy()


def _torch_reference_inverse(T_np, Lists, Flags, weights):
    """The reference inverse (iRAHT.py:40-114) replicated in torch."""
    C = torch.from_numpy(T_np.copy())
    for j in reversed(range(len(Flags))):
        flag = torch.from_numpy(Flags[j])
        right = torch.cat([torch.tensor([False]), flag[:-1]])
        i0 = torch.from_numpy(Lists[j])[flag]
        i1 = torch.from_numpy(Lists[j])[right]
        if i0.numel() == 0:
            continue
        w0 = torch.from_numpy(weights[j])[flag].to(torch.float64)
        w1 = torch.from_numpy(weights[j])[right].to(torch.float64)
        denom = w0 + w1
        a = torch.sqrt(w0 / denom).unsqueeze(1)
        b = torch.sqrt(w1 / denom).unsqueeze(1)
        t0 = C.index_select(0, i0)
        t1 = C.index_select(0, i1)
        C.scatter_(0, i0.unsqueeze(1).expand(-1, C.shape[1]), a * t0 - b * t1)
        C.scatter_(0, i1.unsqueeze(1).expand(-1, C.shape[1]), b * t0 + a * t1)
    return C.numpy()


def test_torch_sqrt_is_not_numpy_sqrt():
    """The raison d'etre of parity_sqrt: torch's CPU f64 sqrt deviates
    from the correctly-rounded numpy result by 1 ulp on some inputs.
    (If torch ever becomes correctly rounded this starts failing — then
    parity_sqrt can be retired to np.sqrt.)"""
    x = np.arange(1, 200000, dtype=np.float64)
    x = x / (x + 3.0)
    t = torch.sqrt(torch.from_numpy(x)).numpy()
    n = np.sqrt(x)
    assert np.any(t != n)
    assert parity_sqrt()(x).tobytes() == t.tobytes()


def test_golden_forward_inverse_bitwise_vs_torch(rng):
    depth = 9
    V, rgb, codes = _frame(rng, n=4000, depth=depth)
    from raht3dgs_tpu.ops.color import rgb_to_yuv_parity

    yuv = rgb_to_yuv_parity(rgb)
    Lists, Flags, weights, order = prelude(codes, 3 * depth)
    T, _ = raht_forward_lists(yuv, Lists, Flags, weights,
                              sqrt_fn=parity_sqrt())
    T_ref = _torch_reference_forward(yuv, Lists, Flags, weights)
    assert T.tobytes() == T_ref.tobytes()  # bitwise

    q = np.floor(T_ref / 4.0 + 0.5) * 4.0
    rec = raht_inverse_lists(q, Lists, Flags, weights, sqrt_fn=parity_sqrt())
    rec_ref = _torch_reference_inverse(q, Lists, Flags, weights)
    assert rec.tobytes() == rec_ref.tobytes()


def test_golden_codec_matches_device_impls(rng):
    """Same pairing/structure as the device paths: coefficients agree at
    crosscheck tolerance, RA-GFT order identical, decode roundtrips."""
    depth = 8
    V, rgb, _ = _frame(rng, n=2500, depth=depth)
    from raht3dgs_tpu.ops.color import rgb_to_yuv_parity

    yuv = rgb_to_yuv_parity(rgb)
    frame = prepare_voxel_frame(V, yuv, depth)
    g = AttributeCodec(depth, impl="golden")
    d = AttributeCodec(depth, impl="dense")
    cg, og, _, _ = g.transform(frame)
    cd, od, _, _ = d.transform(frame)
    n = frame.n_voxels
    np.testing.assert_allclose(
        np.asarray(cg)[:n], np.asarray(cd)[:n], rtol=1e-9, atol=1e-9
    )
    # the device order carries pad slots inline (pads-last is applied in
    # the quant program); compare after the same pads-last normalization
    od_np = np.asarray(od)
    od_pl = od_np[np.argsort(od_np >= n, kind="stable")]
    np.testing.assert_array_equal(np.asarray(og)[:n], od_pl[:n])

    enc = g.encode(frame, 2.0, coeffs=cg, order=og)
    rec, _ = g.decode(enc.stream, frame.codes, frame.weights)
    # the reference's full-pipeline reconstruction bound: |err| <= step
    # (encode_ply.py:212-215, allclose atol=step)
    assert np.abs(rec - yuv).max() <= 2.0 + 1e-9
    # cross-impl: the device decoder reads the golden stream fine
    rec_d, _ = d.decode(enc.stream, frame.codes, frame.weights)
    np.testing.assert_allclose(rec, rec_d, rtol=1e-9, atol=1e-9)


def test_golden_progressive_prefix(rng):
    depth = 8
    V, rgb, _ = _frame(rng, n=2000, depth=depth)
    frame = prepare_voxel_frame(V, rgb.astype(np.float64), depth)
    g = AttributeCodec(depth, impl="golden")
    enc = g.encode(frame, 1.0)
    full, _ = g.decode(enc.stream, frame.codes, frame.weights)
    again, _ = g.decode_progressive(
        enc.stream, frame.codes, frame.weights, frame.n_voxels
    )
    np.testing.assert_array_equal(full, again)
    coarse, _ = g.decode_progressive(
        enc.stream, frame.codes, frame.weights, frame.n_voxels // 4
    )
    assert coarse.shape == full.shape  # prefix decode runs and is coarse
    assert np.mean((coarse - full) ** 2) > 0


def test_golden_mode_guards(rng):
    with pytest.raises(ValueError, match="ragft"):
        AttributeCodec(8, impl="golden", order_mode="weight_desc")
    with pytest.raises(ValueError, match="mid"):
        AttributeCodec(8, impl="golden", quant_mode="deadzone")
    with pytest.raises(ValueError, match="depth"):
        AttributeCodec(21, impl="golden")
    # multiplicity weights are outside the reference contract
    depth = 6
    V, rgb, _ = _frame(rng, n=300, depth=depth)
    frame = prepare_voxel_frame(V, rgb.astype(np.float64), depth)
    frame.weights = frame.weights.at[0].set(2.0)
    g = AttributeCodec(depth, impl="golden")
    with pytest.raises(ValueError, match="multiplicity"):
        g.transform(frame)
    # the decode side has the same hole-free contract: a multiplicity
    # frame must not silently invert with unit-weight butterflies
    d = AttributeCodec(depth, impl="span")
    uframe = prepare_voxel_frame(V, rgb.astype(np.float64), depth)
    enc = d.encode(uframe, 2.0)
    with pytest.raises(ValueError, match="multiplicity"):
        g.decode(enc.stream, frame.codes, frame.weights)
