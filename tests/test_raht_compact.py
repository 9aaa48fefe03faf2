import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.ops.morton import pad_code
from raht3dgs_tpu.ops.raht import raht_forward, raht_inverse
from raht3dgs_tpu.ops.raht_compact import raht_forward_compact
from conftest import unique_voxel_cloud


def _both(codes, attrs, weights, depth):
    a = raht_forward(
        jnp.asarray(codes), jnp.asarray(attrs, dtype=jnp.float64),
        jnp.asarray(weights, dtype=jnp.float64), depth,
    )
    b = raht_forward_compact(
        jnp.asarray(codes), jnp.asarray(attrs, dtype=jnp.float64),
        jnp.asarray(weights, dtype=jnp.float64), depth,
    )
    return a, b


def test_compact_matches_dense(rng):
    for depth, n in [(3, 60), (5, 500), (8, 2000)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        a, b = _both(codes, attrs, np.ones(len(codes)), depth)
        # identical pairing/arithmetic; fp contraction may differ between
        # the two compiled programs, so compare at 1e-12 not bitwise
        np.testing.assert_allclose(
            np.asarray(a.coeffs), np.asarray(b.coeffs), rtol=1e-12, atol=1e-9
        )
        np.testing.assert_array_equal(np.asarray(a.weights), np.asarray(b.weights))
        np.testing.assert_array_equal(
            np.asarray(a.structure.drop_level), np.asarray(b.structure.drop_level)
        )
        np.testing.assert_array_equal(
            np.asarray(a.structure.subtree_w), np.asarray(b.structure.subtree_w)
        )


def test_compact_with_padding(rng):
    depth, n, pad = 5, 311, 201
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    n_tot = n + pad
    codes_p = np.concatenate(
        [codes, np.asarray(pad_code(depth, n_tot, jnp.arange(n, n_tot)))]
    )
    attrs_p = np.concatenate([attrs, np.zeros((pad, attrs.shape[1]))])
    w_p = np.concatenate([np.ones(n), np.zeros(pad)])
    a, b = _both(codes_p, attrs_p, w_p, depth)
    np.testing.assert_allclose(
        np.asarray(a.coeffs)[:n], np.asarray(b.coeffs)[:n],
        rtol=1e-12, atol=1e-9,
    )
    np.testing.assert_array_equal(
        np.asarray(a.structure.drop_level), np.asarray(b.structure.drop_level)
    )


def test_compact_inverse_roundtrip(rng):
    depth, n = 6, 700
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    res = raht_forward_compact(
        jnp.asarray(codes), jnp.asarray(attrs, dtype=jnp.float64),
        jnp.ones((n,), dtype=jnp.float64), depth,
    )
    C = raht_inverse(res.coeffs, res.structure, depth)
    np.testing.assert_allclose(np.asarray(C), attrs, rtol=1e-5, atol=1e-8)
