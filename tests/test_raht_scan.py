import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.ops.morton import pad_code
from raht3dgs_tpu.ops.raht import raht_forward, raht_inverse
from raht3dgs_tpu.ops.raht_scan import raht_forward_scan
from conftest import unique_voxel_cloud


def test_scan_matches_dense(rng):
    for depth, n in [(3, 60), (5, 500), (8, 2000)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        a = raht_forward(
            jnp.asarray(codes), jnp.asarray(attrs), jnp.ones(n, dtype=jnp.float64),
            depth,
        )
        b = raht_forward_scan(
            jnp.asarray(codes), jnp.asarray(attrs), jnp.ones(n, dtype=jnp.float64),
            depth,
        )
        np.testing.assert_allclose(
            np.asarray(a.coeffs), np.asarray(b.coeffs), rtol=1e-12, atol=1e-9
        )
        np.testing.assert_array_equal(
            np.asarray(a.weights), np.asarray(b.weights)
        )
        np.testing.assert_array_equal(
            np.asarray(a.structure.drop_level),
            np.asarray(b.structure.drop_level),
        )
        np.testing.assert_array_equal(
            np.asarray(a.structure.subtree_w),
            np.asarray(b.structure.subtree_w),
        )


def test_scan_with_padding_and_inverse(rng):
    depth, n, pad = 5, 311, 201
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    n_tot = n + pad
    codes_p = np.concatenate(
        [codes, np.asarray(pad_code(depth, n_tot, jnp.arange(n, n_tot)))]
    )
    attrs_p = np.concatenate([attrs, np.zeros((pad, attrs.shape[1]))])
    w_p = np.concatenate([np.ones(n), np.zeros(pad)])
    res = raht_forward_scan(
        jnp.asarray(codes_p), jnp.asarray(attrs_p), jnp.asarray(w_p), depth
    )
    C = raht_inverse(res.coeffs, res.structure, depth)
    np.testing.assert_allclose(np.asarray(C)[:n], attrs, rtol=1e-5, atol=1e-8)
    assert not np.any(np.isnan(np.asarray(C)))
