import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.models.batch_codec import (
    BatchAttributeCodec,
    prepare_frame_batch,
)
from raht3dgs_tpu.models.pipeline import AttributeCodec
from raht3dgs_tpu.parallel.sharding import make_mesh
from conftest import unique_voxel_cloud


def _batch(rng, sizes, depth=5, d_attr=3):
    pos, attrs = [], []
    for n in sizes:
        p, _, a = unique_voxel_cloud(rng, n, depth, d_attr=d_attr)
        pos.append(p.astype(np.int64))
        attrs.append(a)
    return pos, attrs


def test_batch_matches_single(rng):
    depth = 5
    pos, attrs = _batch(rng, [300, 450, 200, 380], depth)
    frames = prepare_frame_batch(pos, attrs, depth, bucket=512)
    bc = BatchAttributeCodec(depth)
    streams, _ = bc.encode(frames, steps=4.0)

    single = AttributeCodec(depth)
    for f, s in zip(frames, streams):
        ref = single.encode(f, steps=4.0)
        assert s.channels == ref.stream.channels, "batched stream differs"

    recs, _ = bc.decode(streams, frames)
    for i, (f, rec) in enumerate(zip(frames, recs)):
        ref_rec, _ = single.decode(streams[i], f.codes, f.weights)
        np.testing.assert_array_equal(rec, ref_rec)


def test_batch_sharded_on_mesh(rng):
    depth = 5
    pos, attrs = _batch(rng, [300, 450, 200, 380, 210, 330, 260, 410], depth,
                        d_attr=8)
    frames = prepare_frame_batch(pos, attrs, depth, bucket=512)
    mesh = make_mesh(8, dp=4, tp=2)
    with mesh:
        bc = BatchAttributeCodec(depth, mesh=mesh)
        streams, _ = bc.encode(frames, steps=4.0)
        recs, _ = bc.decode(streams, frames)
    single = BatchAttributeCodec(depth)
    streams_ref, _ = single.encode(frames, steps=4.0)
    for a, b in zip(streams, streams_ref):
        assert a.channels == b.channels
    for f, rec in zip(frames, recs):
        ref = np.asarray(f.attributes)[: f.n_voxels]
        assert np.allclose(rec, ref, atol=4.0)


def test_shared_bucket(rng):
    depth = 4
    pos, attrs = _batch(rng, [100, 50], depth)
    frames = prepare_frame_batch(pos, attrs, depth, bucket=64)
    assert frames[0].codes.shape == frames[1].codes.shape


def test_encode_sweep_matches_per_step(rng):
    """The pipelined sweep (async dispatch + async fetch + drained
    entropy) must produce byte-identical streams to the serial per-step
    encode, and decode with a precomputed inverse order must equal the
    per-step decode."""
    depth = 5
    steps = [1.0, 4.0, 16.0]
    pos, attrs = _batch(rng, [300, 450, 200], depth)
    frames = prepare_frame_batch(pos, attrs, depth, bucket=512)
    bc = BatchAttributeCodec(depth)
    coeffs, orderp, _ = bc.transform(frames)

    sweep = bc.encode_sweep(frames, steps, coeffs=coeffs, orderp=orderp)
    assert len(sweep) == len(steps)
    inv_b = bc.inverse_order(frames)
    for s, (streams, timer) in zip(steps, sweep):
        ref_streams, _ = bc.encode(frames, steps=s, coeffs=coeffs,
                                   orderp=orderp)
        for got, ref in zip(streams, ref_streams):
            assert got.channels == ref.channels, f"sweep stream differs @ {s}"
            assert got.steps.tolist() == ref.steps.tolist()
        assert timer.stages.get("Entropy_enc_time", 0) > 0
        recs, _ = bc.decode(streams, frames, inv=inv_b)
        ref_recs, _ = bc.decode(ref_streams, frames)
        for a, b in zip(recs, ref_recs):
            np.testing.assert_array_equal(a, b)
