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
