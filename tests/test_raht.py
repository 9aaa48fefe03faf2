import numpy as np
import jax
import jax.numpy as jnp

from raht3dgs_tpu.ops.morton import pad_code
from raht3dgs_tpu.ops.raht import raht_forward, raht_inverse, raht_structure
from raht3dgs_tpu.ops.prelude import (
    prelude,
    raht_forward_lists,
    raht_inverse_lists,
)
from raht3dgs_tpu.ops.reorder import ragft_order, inverse_permutation
from conftest import unique_voxel_cloud


def _dense(codes, attrs, depth):
    n = len(codes)
    res = raht_forward(
        jnp.asarray(codes),
        jnp.asarray(attrs, dtype=jnp.float64),
        jnp.ones((n,), dtype=jnp.float64),
        depth,
    )
    return res


def test_forward_matches_list_reference(rng):
    for depth, n in [(3, 50), (5, 400), (8, 1500)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        res = _dense(codes, attrs, depth)
        Lists, Flags, weights, _ = prelude(codes, 3 * depth)
        T_ref, w_ref = raht_forward_lists(attrs, Lists, Flags, weights)
        np.testing.assert_allclose(
            np.asarray(res.coeffs), T_ref, rtol=1e-12, atol=1e-12
        )
        np.testing.assert_array_equal(np.asarray(res.weights), w_ref)


def test_inverse_matches_list_reference(rng):
    depth, n = 5, 300
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    res = _dense(codes, attrs, depth)
    Lists, Flags, weights, _ = prelude(codes, 3 * depth)
    C_ref = raht_inverse_lists(np.asarray(res.coeffs), Lists, Flags, weights)
    C = raht_inverse(res.coeffs, res.structure, depth)
    np.testing.assert_allclose(np.asarray(C), C_ref, rtol=1e-12, atol=1e-12)


def test_roundtrip_lossless(rng):
    for depth, n in [(4, 128), (10, 2000)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        res = _dense(codes, attrs, depth)
        C = raht_inverse(res.coeffs, res.structure, depth)
        np.testing.assert_allclose(np.asarray(C), attrs, rtol=1e-5, atol=1e-8)


def test_orthonormal_energy_preserved(rng):
    depth, n = 6, 777
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    res = _dense(codes, attrs, depth)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.coeffs), axis=0),
        np.linalg.norm(attrs, axis=0),
        rtol=1e-10,
    )


def test_dc_identity(rng):
    # max |T| per channel equals sqrt(N) * mean(C) (utils.py:46-57)
    depth, n = 6, 512
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    attrs = np.abs(attrs)
    res = _dense(codes, attrs, depth)
    T = np.asarray(res.coeffs)
    np.testing.assert_allclose(
        T.max(axis=0), np.sqrt(n) * attrs.mean(axis=0), rtol=1e-8
    )


def test_padding_is_invisible(rng):
    depth, n, pad = 5, 300, 212
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    res = _dense(codes, attrs, depth)

    n_tot = n + pad
    codes_p = np.concatenate(
        [codes, np.asarray(pad_code(depth, n_tot, jnp.arange(n, n_tot)))]
    )
    attrs_p = np.concatenate([attrs, np.zeros((pad, attrs.shape[1]))])
    w_p = np.concatenate([np.ones(n), np.zeros(pad)])
    res_p = raht_forward(
        jnp.asarray(codes_p),
        jnp.asarray(attrs_p, dtype=jnp.float64),
        jnp.asarray(w_p, dtype=jnp.float64),
        depth,
    )
    # Real slots: bitwise-identical coefficients, weights, and structure.
    np.testing.assert_array_equal(
        np.asarray(res_p.coeffs)[:n], np.asarray(res.coeffs)
    )
    np.testing.assert_array_equal(
        np.asarray(res_p.weights)[:n], np.asarray(res.weights)
    )
    np.testing.assert_array_equal(
        np.asarray(res_p.structure.drop_level)[:n],
        np.asarray(res.structure.drop_level),
    )
    # And the padded inverse reconstructs the real attributes exactly.
    C_p = raht_inverse(res_p.coeffs, res_p.structure, depth)
    np.testing.assert_allclose(np.asarray(C_p)[:n], attrs, rtol=1e-5, atol=1e-8)
    assert not np.any(np.isnan(np.asarray(C_p)))


def test_structure_pass_matches_forward(rng):
    depth, n = 5, 300
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    res = _dense(codes, attrs, depth)
    struct = raht_structure(
        jnp.asarray(codes), jnp.ones((n,), dtype=jnp.float64), depth
    )
    np.testing.assert_array_equal(
        np.asarray(struct.drop_level), np.asarray(res.structure.drop_level)
    )
    np.testing.assert_array_equal(
        np.asarray(struct.subtree_w), np.asarray(res.structure.subtree_w)
    )


def test_ragft_order_matches_reference(rng):
    for depth, n in [(3, 60), (5, 400), (8, 1200)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        struct = raht_structure(
            jnp.asarray(codes), jnp.ones((n,), dtype=jnp.float64), depth
        )
        order = np.asarray(ragft_order(struct.drop_level))
        _, _, _, order_ref = prelude(codes, 3 * depth)
        np.testing.assert_array_equal(order, order_ref)


def test_ragft_order_with_padding(rng):
    depth, n, pad = 5, 333, 179
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    struct = raht_structure(
        jnp.asarray(codes), jnp.ones((n,), dtype=jnp.float64), depth
    )
    order_ref = np.asarray(ragft_order(struct.drop_level))

    n_tot = n + pad
    codes_p = np.concatenate(
        [codes, np.asarray(pad_code(depth, n_tot, jnp.arange(n, n_tot)))]
    )
    w_p = np.concatenate([np.ones(n), np.zeros(pad)])
    struct_p = raht_structure(
        jnp.asarray(codes_p), jnp.asarray(w_p, dtype=jnp.float64), depth
    )
    order_p = np.asarray(ragft_order(struct_p.drop_level))
    real = order_p[order_p < n]
    np.testing.assert_array_equal(real, order_ref)


def test_inverse_permutation(rng):
    perm = rng.permutation(100)
    inv = np.asarray(inverse_permutation(jnp.asarray(perm)))
    np.testing.assert_array_equal(perm[inv], np.arange(100))


def test_multiplicity_weights(rng):
    # Non-unit initial node weights w give DC = sum(sqrt(w_i) c_i)/sqrt(sum w)
    # (each weight-w node behaves like an already-merged group of w duplicate
    # points whose value is c/sqrt(w)), and the inverse stays lossless.
    depth = 4
    _, codes, attrs = unique_voxel_cloud(rng, 64, depth)
    reps = rng.integers(1, 5, size=len(codes)).astype(np.float64)
    res = raht_forward(
        jnp.asarray(codes),
        jnp.asarray(attrs, dtype=jnp.float64),
        jnp.asarray(reps),
        depth,
    )
    T = np.asarray(res.coeffs)
    dc = T[np.argmax(np.abs(T[:, 0]))]
    expected_dc = (np.sqrt(reps)[:, None] * attrs).sum(axis=0) / np.sqrt(
        reps.sum()
    )
    np.testing.assert_allclose(dc, expected_dc, rtol=1e-10)
    C = raht_inverse(res.coeffs, res.structure, depth)
    np.testing.assert_allclose(np.asarray(C), attrs, rtol=1e-8, atol=1e-8)
