"""Native PRAHT backend (native/praht.cpp) vs the frozen numpy spec.

The host loop in ``ops/praht.py`` is the FROZEN decode spec (CLAUDE.md);
the native kernels may only ever be a bitwise-identical replay of it.
These tests pin that contract: full encode/decode bit equality across
dtypes, quantizer modes, depths and contents, and exact integer equality
of the native stencil/plan layouts.
"""

import os

import numpy as np
import pytest

from raht3dgs_tpu.ops import praht as P
from raht3dgs_tpu.ops import _praht_native

pytestmark = pytest.mark.skipif(
    not _praht_native.available(), reason="native praht backend unavailable")


class _force:
    """Temporarily pin RAHT3DGS_PRAHT_NATIVE."""

    def __init__(self, val):
        self.val = val

    def __enter__(self):
        self.old = os.environ.get("RAHT3DGS_PRAHT_NATIVE")
        os.environ["RAHT3DGS_PRAHT_NATIVE"] = self.val

    def __exit__(self, *a):
        if self.old is None:
            os.environ.pop("RAHT3DGS_PRAHT_NATIVE", None)
        else:
            os.environ["RAHT3DGS_PRAHT_NATIVE"] = self.old


def _frame(seed, n, depth, d_attr, smooth):
    rng = np.random.default_rng(seed)
    hi = min(1 << (3 * depth), 1 << 30)
    codes = np.unique(rng.integers(0, hi, size=int(n * 1.5),
                                   dtype=np.int64))[:n].astype(np.uint64)
    w = rng.integers(1, 4, size=codes.shape[0]).astype(np.float64)
    if smooth:
        V = P._decode_axes_np(codes, depth).astype(np.float64) / (1 << depth)
        attrs = np.sin(V @ rng.normal(size=(3, d_attr)) * 5.0) \
            + V @ rng.normal(size=(3, d_attr))
    else:
        attrs = rng.normal(size=(codes.shape[0], d_attr))
    return codes, attrs, w


@pytest.mark.parametrize("fdtype", [np.float32, np.float64])
@pytest.mark.parametrize("quant_mode", ["mid", "deadzone"])
@pytest.mark.parametrize("smooth", [True, False])
def test_roundtrip_bitwise_equal(fdtype, quant_mode, smooth):
    codes, attrs, w = _frame(0 if smooth else 1, 4000, 6, 5, smooth)
    step = 0.25
    with _force("0"):
        plan0 = P.praht_plan(codes, w, 6, fdtype=fdtype)
        s0, m0, r0 = P.praht_encode(codes, attrs, w, 6, step,
                                    quant_mode=quant_mode, fdtype=fdtype)
        o0 = P.praht_decode(s0, codes, w, 6, step, predict_mask=m0,
                            quant_mode=quant_mode, fdtype=fdtype)
    with _force("1"):
        plan1 = P.praht_plan(codes, w, 6, fdtype=fdtype)
        s1, m1, r1 = P.praht_encode(codes, attrs, w, 6, step,
                                    quant_mode=quant_mode, fdtype=fdtype)
        o1 = P.praht_decode(s1, codes, w, 6, step, predict_mask=m1,
                            quant_mode=quant_mode, fdtype=fdtype)
        # cross: numpy-built plan through the native loop (plans are
        # interchangeable by construction)
        o01 = P.praht_decode(s0, codes, w, 6, step, predict_mask=m0,
                             quant_mode=quant_mode, fdtype=fdtype,
                             plan=plan0)
    assert m0 == m1
    assert np.array_equal(s0, s1)
    assert np.array_equal(r0.view(np.uint8), r1.view(np.uint8))
    assert np.array_equal(o0.view(np.uint8), o1.view(np.uint8))
    assert np.array_equal(o0.view(np.uint8), o01.view(np.uint8))
    # plan layout equality (integers exact; csr weights exact small floats)
    for lv0, lv1 in zip(plan0.levels, plan1.levels):
        assert np.array_equal(lv0.base_j, lv1.base_j)
        assert len(lv0.cands) == len(lv1.cands)
        for c0, c1 in zip(lv0.cands, lv1.cands):
            assert np.array_equal(c0[0], c1[0])
            assert np.array_equal(c0[1], c1[1])
            assert c0[2] == c1[2]
        for a, b in zip(lv0.csr, lv1.csr):
            assert np.array_equal(a, b)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_shallow_depths_bitwise_equal(depth):
    # depth 1 has no stencil candidates at all; depth 2 exercises the
    # d>=2 boundary in both implementations
    codes, attrs, w = _frame(7, 40, depth, 3, True)
    with _force("0"):
        s0, m0, _ = P.praht_encode(codes, attrs, w, depth, 0.5)
        o0 = P.praht_decode(s0, codes, w, depth, 0.5, predict_mask=m0)
    with _force("1"):
        s1, m1, _ = P.praht_encode(codes, attrs, w, depth, 0.5)
        o1 = P.praht_decode(s1, codes, w, depth, 0.5, predict_mask=m1)
    assert m0 == m1 and np.array_equal(s0, s1)
    assert np.array_equal(o0.view(np.uint8), o1.view(np.uint8))


def test_uint64_tier_bitwise_equal():
    # J=21-style uint64 codes flow through the stencil's uint64 arithmetic
    rng = np.random.default_rng(3)
    depth = 21
    codes = np.unique(rng.integers(0, 1 << 62, size=3000,
                                   dtype=np.uint64) << np.uint64(1))
    w = np.ones(codes.shape[0])
    attrs = rng.normal(size=(codes.shape[0], 3))
    with _force("0"):
        s0, m0, _ = P.praht_encode(codes, attrs, w, depth, 1.0)
        o0 = P.praht_decode(s0, codes, w, depth, 1.0, predict_mask=m0)
    with _force("1"):
        s1, m1, _ = P.praht_encode(codes, attrs, w, depth, 1.0)
        o1 = P.praht_decode(s1, codes, w, depth, 1.0, predict_mask=m1)
    assert m0 == m1 and np.array_equal(s0, s1)
    assert np.array_equal(o0.view(np.uint8), o1.view(np.uint8))


def test_per_channel_steps_bitwise_equal():
    codes, attrs, w = _frame(11, 2000, 5, 4, True)
    steps = np.asarray([0.25, 0.5, 1.0, 2.0])
    with _force("0"):
        s0, m0, _ = P.praht_encode(codes, attrs, w, 5, steps)
        o0 = P.praht_decode(s0, codes, w, 5, steps, predict_mask=m0)
    with _force("1"):
        s1, m1, _ = P.praht_encode(codes, attrs, w, 5, steps)
        o1 = P.praht_decode(s1, codes, w, 5, steps, predict_mask=m1)
    assert m0 == m1 and np.array_equal(s0, s1)
    assert np.array_equal(o0.view(np.uint8), o1.view(np.uint8))


def test_lod_decode_bitwise_equal():
    codes, attrs, w = _frame(5, 3000, 6, 3, True)
    s, m, _ = P.praht_encode(codes, attrs, w, 6, 0.5)
    for lod in (0, 3, 6):
        with _force("0"):
            a = P.praht_decode(s, codes, w, 6, 0.5, predict_mask=m,
                               lod_depth=lod)
        with _force("1"):
            b = P.praht_decode(s, codes, w, 6, 0.5, predict_mask=m,
                               lod_depth=lod)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))
