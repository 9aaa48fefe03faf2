import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raht3dgs_tpu.parallel.sharding import (
    batched_roundtrip_step,
    batched_transform_step,
    make_mesh,
    shard_batch,
)
from raht3dgs_tpu.ops.raht import raht_forward
from raht3dgs_tpu.ops.quantize import quantize
from raht3dgs_tpu.ops.reorder import ragft_order
import __graft_entry__ as ge


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 8, "sp": 1, "tp": 1}
    mesh = make_mesh(8, dp=4)
    assert mesh.shape == {"dp": 4, "sp": 1, "tp": 2}
    mesh = make_mesh(8, dp=2, sp=2)
    assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(8, dp=3, tp=2)


def test_batched_matches_single_frame(rng):
    from raht3dgs_tpu.ops.raht_span import raht_forward_span

    depth, n, d = 5, 512, 4
    frames = [ge._synthetic_frame(n, depth, d, seed=s) for s in range(4)]
    codes = np.stack([f[0] for f in frames])
    attrs = np.stack([f[1] for f in frames])
    weights = np.stack([f[2] for f in frames])
    q_b = batched_transform_step(
        jnp.asarray(codes), jnp.asarray(attrs), jnp.asarray(weights),
        jnp.asarray(4.0), depth,
    )
    assert q_b.shape == (4, d, n)  # channel-major pads-last layout
    for i in range(4):
        res = raht_forward_span(
            jnp.asarray(codes[i]), jnp.asarray(attrs[i]),
            jnp.asarray(weights[i]), depth,
        )
        order = ragft_order(res.structure.drop_level)
        q = quantize(res.coeffs, jnp.asarray(4.0))[order]
        # all slots real (nvox defaulted to N): layouts transpose-equal
        np.testing.assert_array_equal(np.asarray(q_b[i]).T, np.asarray(q))


def test_sharded_equals_unsharded(rng):
    depth, n, d = 5, 512, 8
    batch = 8
    frames = [ge._synthetic_frame(n, depth, d, seed=s) for s in range(batch)]
    codes = np.stack([f[0] for f in frames])
    attrs = np.stack([f[1] for f in frames]).astype(np.float64)
    weights = np.stack([f[2] for f in frames]).astype(np.float64)

    mse_ref = float(batched_roundtrip_step(
        jnp.asarray(codes), jnp.asarray(attrs), jnp.asarray(weights),
        jnp.asarray(2.0), depth,
    ))

    mesh = make_mesh(8, dp=4, tp=2)
    cs, as_, ws = shard_batch(mesh, codes, attrs, weights)
    with mesh:
        mse_sharded = float(batched_roundtrip_step(
            cs, as_, ws, jnp.asarray(2.0), depth
        ))
    assert np.isclose(mse_ref, mse_sharded, rtol=1e-10)


def test_graft_entry_api():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    q, w = jax.block_until_ready(out)
    assert q.shape[0] == args[0].shape[0]
    assert np.isfinite(np.asarray(w)).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
