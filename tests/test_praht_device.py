"""Device predicted-RAHT encoder (ops/praht_device.py) vs the frozen host
closed loop (ops/praht.py).

The host loop is the decode spec; the device encoder emits the same
stream FORMAT by construction (every decoder-visible decision is
signalled). These tests additionally pin the much stronger observed
property that on XLA:CPU — with the module's matched op ordering — the
emitted streams are BYTE-IDENTICAL to the host encoder's, across scalar
and per-channel steps, multiplicity weights, f32/f64, and the sweep
path. If a future XLA changes float contraction and a rare
quantization-boundary tie flips, re-evaluate the pin (the format stays
valid either way — see the module docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from conftest import unique_voxel_cloud


def _smooth_frame(rng, n=3000, depth=8, d_attr=4, weights=False,
                  dtype=jnp.float64):
    pts, _, _ = unique_voxel_cloud(rng, n, depth, d_attr=1)
    # spatially correlated attributes so prediction wins at some depths
    # (on pure noise the signalled mask is simply 0 everywhere)
    base = pts[:, 0:1] * 0.3 + pts[:, 1:2] * 0.1
    attrs = np.repeat(base.astype(np.float64), d_attr, axis=1)
    attrs += rng.normal(scale=1.0, size=attrs.shape)
    w = rng.integers(1, 4, size=pts.shape[0]).astype(float) if weights \
        else None
    return prepare_voxel_frame(pts.astype(np.int64), attrs, depth,
                               weights=w, dtype=dtype)


@pytest.mark.parametrize("weights", [False, True])
def test_device_stream_bytes_match_host(rng, weights):
    depth = 8
    frame = _smooth_frame(rng, weights=weights)
    host = AttributeCodec(depth, predict=True, predict_impl="host")
    dev = AttributeCodec(depth, predict=True, predict_impl="device")
    for steps in (1.0, 8.0, [2.0, 2.0, 4.0, 8.0]):
        eh = host.encode(frame, steps)
        ed = dev.encode(frame, steps)
        assert ed.stream.predict and ed.stream.predict_mask == \
            eh.stream.predict_mask
        assert ed.stream.to_bytes() == eh.stream.to_bytes()
    # prediction must actually engage on this content
    assert host.encode(frame, 1.0).stream.predict_mask != 0


def test_device_sweep_matches_host(rng):
    depth = 7
    frame = _smooth_frame(rng, n=1500, depth=depth)
    host = AttributeCodec(depth, predict=True, predict_impl="host")
    dev = AttributeCodec(depth, predict=True, predict_impl="device")
    steps = [1.0, 2.0, 8.0, 32.0]
    encs_h = host.encode_sweep(frame, steps)
    encs_d = dev.encode_sweep(frame, steps)
    for a, b in zip(encs_d, encs_h):
        assert a.stream.to_bytes() == b.stream.to_bytes()


def test_device_f32_stream_and_decode(rng):
    depth = 7
    frame = _smooth_frame(rng, n=1500, depth=depth, dtype=jnp.float32)
    host = AttributeCodec(depth, dtype=jnp.float32, predict=True,
                          predict_impl="host")
    dev = AttributeCodec(depth, dtype=jnp.float32, predict=True,
                         predict_impl="device")
    eh = host.encode(frame, 2.0)
    ed = dev.encode(frame, 2.0)
    assert ed.stream.dtype32
    assert ed.stream.to_bytes() == eh.stream.to_bytes()
    rec, _ = dev.decode(ed.stream, frame.codes, frame.weights)
    attrs = np.asarray(frame.attributes)[: frame.n_voxels]
    assert np.abs(rec - attrs).max() <= 2 * 2.0


def test_device_cache_across_frames(rng):
    """The identity-keyed device context cache must never serve a stale
    plan to a different frame (entries pin their arrays alive)."""
    depth = 7
    f1 = _smooth_frame(rng, n=1200, depth=depth)
    f2 = _smooth_frame(rng, n=900, depth=depth)
    host = AttributeCodec(depth, predict=True, predict_impl="host")
    dev = AttributeCodec(depth, predict=True, predict_impl="device")
    for fr in (f1, f2, f1):
        assert dev.encode(fr, 4.0).stream.to_bytes() == \
            host.encode(fr, 4.0).stream.to_bytes()


def test_device_depth_guard():
    with pytest.raises(ValueError, match="device"):
        AttributeCodec(21, predict=True, predict_impl="device")


def test_auto_resolves_host_on_cpu():
    codec = AttributeCodec(8, predict=True)  # suite runs on CPU
    assert codec.predict_impl == "auto"
    assert codec._predict_on_device() is False


def test_device_decode_matches_host(rng):
    """The non-normative device decode reproduces the frozen host loop
    (observed bitwise on XLA:CPU f64; pinned as exact-tolerance here)."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.pipeline import (
        _inverse_order_device, _scale_sqrt_w, _transform_device,
        decode_entropy_channels)
    from raht3dgs_tpu.ops.praht_device import (
        praht_device_decode, praht_device_plan)

    depth = 8
    frame = _smooth_frame(rng, depth=depth)
    codec = AttributeCodec(depth, predict=True, predict_impl="host")
    enc = codec.encode(frame, 2.0)
    stream = enc.stream
    rec_host, _ = codec.decode(stream, frame.codes, frame.weights)

    vals_T = np.zeros((stream.n_channels, frame.codes.shape[0]),
                      dtype=np.int32)
    decode_entropy_channels(stream, stream.n_voxels, vals_T)
    inv = _inverse_order_device(frame.codes, frame.weights,
                                jnp.int32(stream.n_voxels), depth,
                                stream.order_mode)
    scaled = _scale_sqrt_w(frame.attributes, frame.weights)
    _, _, structure = _transform_device(
        frame.codes, scaled, frame.weights, depth, "ragft", codec.impl)
    plan = praht_device_plan(frame.codes, frame.weights, depth,
                             structure.drop_level, structure.subtree_w)
    sym = jnp.asarray(vals_T).T[inv]
    rec_dev = np.asarray(praht_device_decode(
        plan, frame.codes, frame.weights, sym,
        jnp.uint32(stream.predict_mask), depth,
        jnp.atleast_1d(jnp.asarray(2.0, jnp.float64)),
        quant_mode=stream.quant_mode, rec_delta=stream.rec_delta,
        fdtype=jnp.float64,
    ))[: frame.n_voxels]
    np.testing.assert_allclose(rec_dev, rec_host, atol=1e-11, rtol=1e-11)
