import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.ops.pallas_scan import ds_cumsum_pallas


def test_matches_float64_cumsum(rng):
    for n, k in [(1, 1), (2047, 3), (2048, 4), (10000, 8)]:
        x = rng.normal(scale=1000, size=(n, k)).astype(np.float32)
        hi, lo = ds_cumsum_pallas(jnp.asarray(x), interpret=True)
        ref = np.cumsum(x.astype(np.float64), axis=0)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        scale = max(np.abs(ref).max(), 1.0)
        assert np.abs(got - ref).max() / scale < 1e-12


def test_cancellation_resistant(rng):
    # alternating large +/- values: plain f32 cumsum loses everything
    n = 4096
    x = np.empty((n, 1), dtype=np.float32)
    x[0::2, 0] = 1e7
    x[1::2, 0] = -1e7 + 1.0
    hi, lo = ds_cumsum_pallas(jnp.asarray(x), interpret=True)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    ref = np.cumsum(x.astype(np.float64), axis=0)
    assert np.abs(got - ref).max() < 1e-3


def test_matches_associative_scan_fallback(rng):
    from raht3dgs_tpu.ops.raht_span import _ds_combine
    import jax.lax as lax

    x = rng.normal(scale=50, size=(5000, 2)).astype(np.float32)
    hi_p, lo_p = ds_cumsum_pallas(jnp.asarray(x), interpret=True)
    hi_a, lo_a = lax.associative_scan(
        _ds_combine, (jnp.asarray(x), jnp.zeros_like(jnp.asarray(x))), axis=0
    )
    tot_p = np.asarray(hi_p, np.float64) + np.asarray(lo_p, np.float64)
    tot_a = np.asarray(hi_a, np.float64) + np.asarray(lo_a, np.float64)
    np.testing.assert_allclose(tot_p, tot_a, rtol=1e-12, atol=1e-6)


def test_transposed_variant_matches(rng):
    from raht3dgs_tpu.ops.pallas_scan import ds_cumsum_pallas_t

    for n, k in [(100, 3), (2048, 4), (6000, 8)]:
        x = rng.normal(scale=500, size=(n, k)).astype(np.float32)
        hi, lo = ds_cumsum_pallas_t(jnp.asarray(x), interpret=True)
        ref = np.cumsum(x.astype(np.float64), axis=0)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        scale = max(np.abs(ref).max(), 1.0)
        assert np.abs(got - ref).max() / scale < 1e-12
