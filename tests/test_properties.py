"""Property-based tests (hypothesis) for the codec invariants.

The reference verifies ad hoc (golden files + inline asserts, SURVEY.md §4);
these check the core algebraic contracts on arbitrary generated inputs.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from raht3dgs_tpu.codec import rlgr
from raht3dgs_tpu.codec import _rlgr_py
from raht3dgs_tpu.ops.morton import morton_decode, morton_encode
from raht3dgs_tpu.ops.prelude import morton_codes_np
from raht3dgs_tpu.ops.raht import raht_forward, raht_inverse
from raht3dgs_tpu.ops.raht_span import raht_forward_span, raht_inverse_span

SETTINGS = dict(max_examples=25, deadline=None)


@settings(**SETTINGS)
@given(
    st.lists(st.integers(-(2**31), 2**31 - 1), min_size=0, max_size=400),
    st.booleans(),
)
def test_rlgr_roundtrip_and_backend_identity(seq, use_runs):
    arr = np.asarray(seq, dtype=np.int64)
    if use_runs and len(arr) > 4:
        arr[:: max(len(arr) // 4, 1)] = 0  # inject runs
    native, _ = rlgr.rlgr_encode(arr)
    pure = _rlgr_py.encode(arr.tolist(), signed=True)
    assert native == pure
    dec, _ = rlgr.rlgr_decode(native, len(arr))
    np.testing.assert_array_equal(dec, arr)


@settings(**SETTINGS)
@given(st.data())
def test_morton_roundtrip(data):
    depth = data.draw(st.integers(1, 21))
    n = data.draw(st.integers(1, 200))
    V = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 2**depth - 1)] * 3),
            min_size=n, max_size=n,
        )
    )
    V = np.asarray(V, dtype=np.int64)
    codes = morton_encode(jnp.asarray(V), depth)
    np.testing.assert_array_equal(np.asarray(morton_decode(codes, depth)), V)
    np.testing.assert_array_equal(np.asarray(codes), morton_codes_np(V, depth))


@settings(**SETTINGS)
@given(st.data())
def test_raht_invariants(data):
    depth = data.draw(st.integers(2, 8))
    n_want = data.draw(st.integers(1, 200))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    pts = rng.integers(0, 2**depth, size=(2 * n_want, 3))
    codes = np.unique(morton_codes_np(pts, depth))[:n_want]
    n = len(codes)
    attrs = rng.uniform(-100, 100, size=(n, 2))
    w = jnp.ones((n,), dtype=jnp.float64)

    res = raht_forward(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
    span = raht_forward_span(jnp.asarray(codes), jnp.asarray(attrs), w, depth)

    # structure identical between formulations
    np.testing.assert_array_equal(
        np.asarray(res.structure.drop_level),
        np.asarray(span.structure.drop_level),
    )
    # orthonormality: per-channel energy preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.coeffs), axis=0),
        np.linalg.norm(attrs, axis=0),
        rtol=1e-9, atol=1e-9,
    )
    # both inverses recover the input
    rec_dense = raht_inverse(res.coeffs, res.structure, depth)
    rec_span = raht_inverse_span(span.coeffs, jnp.asarray(codes), w, depth)
    np.testing.assert_allclose(np.asarray(rec_dense), attrs, rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rec_span), attrs, rtol=1e-7, atol=1e-7)


def test_impl_agreement_fuzz(rng):
    # Broad random sweep: all four forward implementations and both inverses
    # agree across random depths, sizes, duplicate multiplicities and
    # non-uniform weights.
    import jax.numpy as jnp

    from raht3dgs_tpu.ops.raht import get_forward_impl, raht_forward, raht_inverse
    from raht3dgs_tpu.ops.raht_span import raht_inverse_span
    from conftest import unique_voxel_cloud

    impls = ["span", "compact", "scan"]
    for trial in range(6):
        depth = int(rng.integers(2, 12))
        n = int(rng.integers(2, min(4 ** depth, 500)))
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        n = len(codes)
        # random positive integer weights emulate voxel multiplicities
        w = jnp.asarray(rng.integers(1, 9, size=n).astype(np.float64))
        ref = raht_forward(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        for name in impls:
            res = get_forward_impl(name)(
                jnp.asarray(codes), jnp.asarray(attrs), w, depth
            )
            np.testing.assert_allclose(
                np.asarray(res.coeffs), np.asarray(ref.coeffs),
                rtol=0, atol=1e-9,
                err_msg=f"trial {trial}: {name} vs dense (J={depth}, n={n})",
            )
        rec_d = raht_inverse(ref.coeffs, ref.structure, depth)
        rec_s = raht_inverse_span(ref.coeffs, jnp.asarray(codes), w, depth)
        np.testing.assert_allclose(np.asarray(rec_d), attrs, rtol=0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(rec_s), attrs, rtol=0, atol=1e-9)
