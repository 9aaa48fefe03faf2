"""sorted_segment_sums: shift (segmented doubling) vs prefix methods.

The shift method is the fast default (see ops/segment.py); prefix is the
round-1 compensated-prefix path kept for the temporal v2 frozen contract.
Both must agree: bitwise on integer-valued lanes (any association is exact
below 2**24), to fp tolerance on float lanes, and exactly against a numpy
float64 per-segment reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raht3dgs_tpu.ops.segment import sorted_segment_sums


def _random_runs(rng, n, max_run):
    first = np.zeros(n, bool)
    first[0] = True
    i = 0
    while i < n:
        run = int(rng.integers(1, max_run + 1))
        i += run
        if i < n:
            first[i] = True
    return first


def _np_segment_sums(values, first):
    seg = np.cumsum(first) - 1
    n_seg = seg[-1] + 1
    out = np.zeros((values.shape[0], values.shape[1]))
    for s in range(n_seg):
        out[s] = values[seg == s].astype(np.float64).sum(axis=0)
    return out, n_seg


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("max_run", [1, 4, 37])
def test_shift_matches_prefix_and_numpy(rng, dtype, max_run):
    n = 1000
    first = _random_runs(rng, n, max_run)
    values = rng.uniform(-100, 100, (n, 5)).astype(dtype)
    ref, n_seg = _np_segment_sums(values, first)

    outs = {}
    for method in ("shift", "prefix"):
        sums, extra, starts, n = sorted_segment_sums(
            jnp.asarray(values), jnp.asarray(first), method=method
        )
        assert extra is None
        assert int(n) == n_seg
        s = np.asarray(sums, np.float64)
        assert np.allclose(s[:n_seg], ref[:n_seg], rtol=1e-5, atol=1e-3)
        assert not s[n_seg:].any()  # empty slots zeroed
        outs[method] = (s, np.asarray(starts))

    np.testing.assert_array_equal(outs["shift"][1], outs["prefix"][1])


@pytest.mark.parametrize("method", ["shift", "prefix"])
def test_integer_lanes_exact(rng, method):
    # integer-valued float lanes (weights/counts/ids) must be EXACT —
    # the encoder==decoder weight contract rides on this
    n = 2048
    first = _random_runs(rng, n, 9)
    values = rng.integers(0, 1000, (n, 3)).astype(np.float32)
    sums, _, _, n_seg = sorted_segment_sums(
        jnp.asarray(values), jnp.asarray(first), method=method
    )
    ref, ns = _np_segment_sums(values, first)
    np.testing.assert_array_equal(np.asarray(sums)[:ns], ref[:ns])


def test_shift_prefix_integer_lanes_bitwise(rng):
    # on integer-valued lanes the two methods are bitwise interchangeable
    # (the argument that lets frozen callers take either — see temporal.py)
    n = 4096
    first = _random_runs(rng, n, 6)
    values = rng.integers(-50, 50, (n, 4)).astype(np.float64)
    a = sorted_segment_sums(jnp.asarray(values), jnp.asarray(first),
                            method="shift")[0]
    b = sorted_segment_sums(jnp.asarray(values), jnp.asarray(first),
                            method="prefix")[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("method", ["shift", "prefix"])
@pytest.mark.parametrize("fused", [True, False])
def test_extras_sampled_at_starts(rng, method, fused):
    n = 512
    first = _random_runs(rng, n, 5)
    values = rng.uniform(0, 10, (n, 2)).astype(np.float32)
    if fused:
        extra = rng.integers(0, 1 << 20, (n, 2)).astype(np.float32)
    else:
        extra = rng.integers(0, 1 << 40, (n, 2)).astype(np.float64)
    sums, ex, starts, n_seg = sorted_segment_sums(
        jnp.asarray(values), jnp.asarray(first),
        extra_rows=jnp.asarray(extra), method=method,
    )
    ns = int(n_seg)
    st = np.asarray(starts)[:ns]
    np.testing.assert_array_equal(np.asarray(ex)[:ns], extra[st])


@pytest.mark.parametrize("method", ["shift", "prefix"])
def test_degenerate_runs(rng, method):
    n = 257  # non-multiple of any block size
    # all one segment (max run == N: the while_loop's worst case)
    first = np.zeros(n, bool)
    first[0] = True
    v = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sums, _, _, n_seg = sorted_segment_sums(
        jnp.asarray(v), jnp.asarray(first), method=method)
    assert int(n_seg) == 1
    assert np.allclose(np.asarray(sums)[0], v.astype(np.float64).sum(0),
                       rtol=1e-5, atol=1e-4)
    assert not np.asarray(sums)[1:].any()
    # all singletons (max run 1: zero loop iterations)
    first = np.ones(n, bool)
    sums, _, _, n_seg = sorted_segment_sums(
        jnp.asarray(v), jnp.asarray(first), method=method)
    assert int(n_seg) == n
    np.testing.assert_allclose(np.asarray(sums), v, rtol=1e-6)
