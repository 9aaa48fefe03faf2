import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.ops.morton import pad_code
from raht3dgs_tpu.ops.raht import raht_forward, raht_structure
from raht3dgs_tpu.ops.raht_span import (
    raht_forward_span,
    raht_inverse_span,
    raht_structure_span,
)
from conftest import unique_voxel_cloud


def test_span_structure_matches_dense(rng):
    for depth, n in [(3, 60), (5, 500), (8, 2000)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        w = jnp.ones(n, dtype=jnp.float64)
        s_dense = raht_structure(jnp.asarray(codes), w, depth)
        s_span = raht_structure_span(jnp.asarray(codes), w, depth)
        np.testing.assert_array_equal(
            np.asarray(s_span.drop_level), np.asarray(s_dense.drop_level)
        )
        np.testing.assert_array_equal(
            np.asarray(s_span.subtree_w), np.asarray(s_dense.subtree_w)
        )
        np.testing.assert_array_equal(
            np.asarray(s_span.node_weights), np.asarray(s_dense.node_weights)
        )


def test_span_forward_matches_dense(rng):
    for depth, n in [(3, 60), (5, 500), (8, 2000)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        w = jnp.ones(n, dtype=jnp.float64)
        a = raht_forward(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        b = raht_forward_span(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        np.testing.assert_allclose(
            np.asarray(b.coeffs), np.asarray(a.coeffs), rtol=1e-9, atol=1e-7
        )
        np.testing.assert_array_equal(
            np.asarray(b.weights), np.asarray(a.weights)
        )


def test_span_roundtrip(rng):
    for depth, n in [(4, 128), (8, 3000)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        w = jnp.ones(n, dtype=jnp.float64)
        res = raht_forward_span(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        rec = raht_inverse_span(res.coeffs, jnp.asarray(codes), w, depth)
        np.testing.assert_allclose(np.asarray(rec), attrs, rtol=1e-8, atol=1e-7)


def test_span_with_padding(rng):
    depth, n, pad = 5, 311, 201
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    n_tot = n + pad
    codes_p = np.concatenate(
        [codes, np.asarray(pad_code(depth, n_tot, jnp.arange(n, n_tot)))]
    )
    attrs_p = np.concatenate([attrs, np.zeros((pad, attrs.shape[1]))])
    w_p = jnp.asarray(
        np.concatenate([np.ones(n), np.zeros(pad)]), dtype=jnp.float64
    )
    unpadded = raht_forward_span(
        jnp.asarray(codes), jnp.asarray(attrs), jnp.ones(n, dtype=jnp.float64),
        depth,
    )
    padded = raht_forward_span(
        jnp.asarray(codes_p), jnp.asarray(attrs_p), w_p, depth
    )
    np.testing.assert_allclose(
        np.asarray(padded.coeffs)[:n], np.asarray(unpadded.coeffs),
        rtol=1e-10, atol=1e-9,
    )
    rec = raht_inverse_span(padded.coeffs, jnp.asarray(codes_p), w_p, depth)
    np.testing.assert_allclose(np.asarray(rec)[:n], attrs, rtol=1e-8, atol=1e-7)
    assert not np.any(np.isnan(np.asarray(rec)))


def test_span_cross_inverse(rng):
    # span-encoded coefficients decode with the level-loop inverse too
    from raht3dgs_tpu.ops.raht import raht_inverse

    depth, n = 6, 700
    _, codes, attrs = unique_voxel_cloud(rng, n, depth)
    w = jnp.ones(n, dtype=jnp.float64)
    res = raht_forward_span(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
    rec = raht_inverse(res.coeffs, res.structure, depth)
    np.testing.assert_allclose(np.asarray(rec), attrs, rtol=1e-8, atol=1e-7)


def test_span_multiplicity_weights(rng):
    depth = 4
    _, codes, attrs = unique_voxel_cloud(rng, 64, depth)
    reps = rng.integers(1, 5, size=len(codes)).astype(np.float64)
    res = raht_forward_span(
        jnp.asarray(codes), jnp.asarray(attrs), jnp.asarray(reps), depth
    )
    ref = raht_forward(
        jnp.asarray(codes), jnp.asarray(attrs), jnp.asarray(reps), depth
    )
    np.testing.assert_allclose(
        np.asarray(res.coeffs), np.asarray(ref.coeffs), rtol=1e-9, atol=1e-8
    )
    rec = raht_inverse_span(res.coeffs, jnp.asarray(codes), jnp.asarray(reps), depth)
    np.testing.assert_allclose(np.asarray(rec), attrs, rtol=1e-8, atol=1e-7)


def test_span_deep_octree_matches_dense(rng):
    # Reference default depth is J=18 (encode_ply.py) -> int64 codes,
    # 55 transform levels. Exercises the int64 _msb/topology path that
    # depths <= 10 (int32) never touch.
    from raht3dgs_tpu.ops.raht import raht_forward
    from conftest import unique_voxel_cloud

    for depth, n in [(14, 400), (18, 300)]:
        _, codes, attrs = unique_voxel_cloud(rng, n, depth)
        assert codes.dtype == np.int64
        w = jnp.ones(len(codes), dtype=jnp.float64)
        a = raht_forward(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        b = raht_forward_span(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        np.testing.assert_allclose(
            np.asarray(a.coeffs), np.asarray(b.coeffs), rtol=0, atol=1e-9
        )
        np.testing.assert_array_equal(
            np.asarray(a.structure.drop_level), np.asarray(b.structure.drop_level)
        )
        rec = raht_inverse_span(b.coeffs, jnp.asarray(codes), w, depth)
        np.testing.assert_allclose(np.asarray(rec), attrs, rtol=0, atol=1e-9)


def test_span_deep_octree_matches_numpy_golden(rng):
    from raht3dgs_tpu.ops.prelude import prelude, raht_forward_lists
    from conftest import unique_voxel_cloud

    depth, n = 18, 200
    pts, codes, attrs = unique_voxel_cloud(rng, n, depth)
    w = jnp.ones(n, dtype=jnp.float64)
    res = raht_forward_span(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
    Lists, Flags, weights, _ = prelude(codes, 3 * depth)
    golden, _ = raht_forward_lists(attrs, Lists, Flags, weights)
    np.testing.assert_allclose(
        np.asarray(res.coeffs), golden, rtol=0, atol=1e-9
    )


def test_span_inverse_maximum_chain_depth(rng):
    # Adversarial "staircase": codes = {0} U {2^j} produce parent chains of
    # maximal length (one merge per level) — stresses the pointer-doubling
    # round count exactly at its bound.
    from raht3dgs_tpu.ops.raht import raht_forward

    for depth in (5, 10):
        nbits = 3 * depth
        codes = np.array([0] + [1 << j for j in range(nbits)], dtype=np.int64)
        n = len(codes)
        attrs = rng.standard_normal((n, 2))
        w = jnp.ones(n, dtype=jnp.float64)
        ref = raht_forward(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        res = raht_forward_span(jnp.asarray(codes), jnp.asarray(attrs), w, depth)
        np.testing.assert_allclose(
            np.asarray(res.coeffs), np.asarray(ref.coeffs), rtol=0, atol=1e-9
        )
        rec = raht_inverse_span(res.coeffs, jnp.asarray(codes), w, depth)
        np.testing.assert_allclose(np.asarray(rec), attrs, rtol=0, atol=1e-9)


def test_nearest_ge_value_propagation_matches_gathers(rng):
    # The W-value propagation inside _nearest_ge must be bitwise identical
    # to gathering W at the returned indices (W nondecreasing => the
    # position scan and the value scan pick the same element).
    from raht3dgs_tpu.ops.raht_span import _nearest_ge

    for trial in range(5):
        n = int(rng.integers(3, 400))
        n_vals = 34
        B = jnp.asarray(rng.integers(0, n_vals, size=n), dtype=jnp.int32)
        w = rng.integers(0, 5, size=n).astype(np.float32)
        W = jnp.asarray(np.concatenate([[0.0], np.cumsum(w)]).astype(np.float32))
        prev_ge, next_ge, w_prev, w_next = _nearest_ge(B, n_vals, W)
        p2, q2 = _nearest_ge(B, n_vals)
        np.testing.assert_array_equal(np.asarray(prev_ge), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(next_ge), np.asarray(q2))
        Wn = np.asarray(W)
        np.testing.assert_array_equal(
            np.asarray(w_prev), Wn[np.maximum(np.asarray(prev_ge), 0)]
        )
        np.testing.assert_array_equal(
            np.asarray(w_next), Wn[np.asarray(next_ge)]
        )


def test_span_inverse_fill_matches_chain(rng):
    """The two inverse formulations (interval-sum fills vs pointer-doubling
    chain) agree on fuzzed clouds with multiplicity weights and padding."""
    from raht3dgs_tpu.ops.raht_span import (
        _raht_inverse_span_chain,
        _raht_inverse_span_fill,
        raht_forward_span,
    )
    from raht3dgs_tpu.ops.morton import pad_code

    for trial in range(6):
        depth = int(rng.integers(2, 7))
        want = int(rng.integers(1, 500))
        pts, codes, attrs = unique_voxel_cloud(rng, want, depth, d_attr=3)
        n = len(codes)
        pad = int(rng.integers(0, 5))
        total = n + pad
        codes_p = np.concatenate(
            [codes, np.asarray(pad_code(depth, total, jnp.arange(n, n + pad)))]
        )
        attrs_p = np.concatenate([attrs, np.zeros((pad, 3))]).astype(np.float32)
        w = np.concatenate(
            [rng.integers(1, 4, n), np.zeros(pad)]
        ).astype(np.float32)
        cj = jnp.asarray(codes_p)
        wj = jnp.asarray(w)
        res = raht_forward_span(cj, jnp.asarray(attrs_p), wj, depth)
        rec_chain = np.asarray(_raht_inverse_span_chain(res.coeffs, cj, wj, depth))
        rec_fill = np.asarray(_raht_inverse_span_fill(res.coeffs, cj, wj, depth))
        np.testing.assert_allclose(rec_fill[:n], rec_chain[:n], rtol=0, atol=1e-4)
        np.testing.assert_allclose(rec_fill[:n], attrs_p[:n], rtol=0, atol=1e-3)


def test_span_depth21_uint64_matches_dense(rng):
    """Depth 21 — the uint64 ceiling (reference caps J there). The span and
    dense implementations must agree through the sentinel-bit code space."""
    import jax

    from raht3dgs_tpu.ops.morton import pad_code
    from raht3dgs_tpu.ops.prelude import morton_codes_np
    from raht3dgs_tpu.ops.raht import raht_forward, raht_inverse
    from raht3dgs_tpu.ops.raht_span import raht_forward_span, raht_inverse_span

    depth, n, pad = 21, 200, 5
    pts = rng.integers(0, 2**depth, (4 * n, 3)).astype(np.int64)
    codes = np.unique(morton_codes_np(pts, depth))[:n]
    total = n + pad
    codes_p = np.concatenate(
        [
            codes.astype(np.uint64),
            np.asarray(pad_code(depth, total, jnp.arange(n, n + pad))),
        ]
    )
    assert codes_p.dtype == np.uint64
    attrs = np.concatenate(
        [rng.normal(0, 50, (n, 3)), np.zeros((pad, 3))]
    )
    w = np.concatenate([np.ones(n), np.zeros(pad)])
    cj = jnp.asarray(codes_p)
    aj = jnp.asarray(attrs, dtype=jnp.float64)
    wj = jnp.asarray(w, dtype=jnp.float64)

    ref = raht_forward(cj, aj, wj, depth)
    res = raht_forward_span(cj, aj, wj, depth)
    np.testing.assert_allclose(
        np.asarray(res.coeffs)[:n], np.asarray(ref.coeffs)[:n],
        rtol=0, atol=1e-9,
    )
    np.testing.assert_array_equal(
        np.asarray(res.structure.drop_level), np.asarray(ref.structure.drop_level)
    )
    rec = raht_inverse_span(res.coeffs, cj, wj, depth)
    np.testing.assert_allclose(np.asarray(rec)[:n], attrs[:n], rtol=0, atol=1e-8)
    rec_d = raht_inverse(ref.coeffs, ref.structure, depth)
    np.testing.assert_allclose(np.asarray(rec_d)[:n], attrs[:n], rtol=0, atol=1e-8)


def test_weight_desc_fractional_weights_roundtrip(rng):
    """Encoder and decoder must derive bitwise-identical node weights —
    fractional float32 weights under order_mode='weight_desc' previously
    desynced the stream permutations (caught by review; pins the fix)."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
    from raht3dgs_tpu.ops.raht_span import (
        raht_forward_span,
        raht_structure_span,
    )

    depth = 6
    pts, codes, attrs = unique_voxel_cloud(rng, 800, depth)
    w = rng.uniform(0.1, 3.0, len(pts))  # fractional weights
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth,
                                bucket=1024, dtype=jnp.float32, weights=w)
    fwd = raht_forward_span(frame.codes, frame.attributes, frame.weights,
                            depth)
    st = raht_structure_span(frame.codes, frame.weights, depth)
    np.testing.assert_array_equal(
        np.asarray(fwd.structure.node_weights), np.asarray(st.node_weights)
    )
    np.testing.assert_array_equal(
        np.asarray(fwd.structure.subtree_w), np.asarray(st.subtree_w)
    )

    codec = AttributeCodec(depth, dtype=jnp.float32, order_mode="weight_desc")
    enc = codec.encode(frame, steps=1.0)
    rec, _ = codec.decode(enc.stream, frame.codes, frame.weights)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    assert np.abs(rec - ref).max() < 1.5  # bounded by the quant step


def test_pair_weights_bitwise_identity_fuzz(rng):
    """The decoder's _pair_weights reproduction of the forward's fused-pack
    weights must be bitwise exact across shapes, pads, and weight kinds."""
    import jax.numpy as jnp

    from raht3dgs_tpu.ops.morton import pad_code
    from raht3dgs_tpu.ops.raht_span import (
        raht_forward_span,
        raht_structure_span,
    )

    for trial in range(5):
        depth = int(rng.integers(3, 8))
        want = int(rng.integers(2, 700))
        pts, codes, attrs = unique_voxel_cloud(rng, want, depth, d_attr=2)
        n = len(codes)
        pad = int(rng.integers(0, 7))
        total = n + pad
        codes_p = np.concatenate(
            [codes, np.asarray(pad_code(depth, total, jnp.arange(n, n + pad)))]
        )
        if trial % 2:
            w = rng.uniform(0.05, 5.0, n)          # fractional
        else:
            w = rng.integers(1, 9, n).astype(float)  # counts
        w_p = np.concatenate([w, np.zeros(pad)]).astype(np.float32)
        a_p = np.concatenate([attrs, np.zeros((pad, 2))]).astype(np.float32)
        cj, wj = jnp.asarray(codes_p), jnp.asarray(w_p)
        fwd = raht_forward_span(cj, jnp.asarray(a_p), wj, depth)
        st = raht_structure_span(cj, wj, depth)
        np.testing.assert_array_equal(
            np.asarray(fwd.structure.node_weights), np.asarray(st.node_weights)
        )
        np.testing.assert_array_equal(
            np.asarray(fwd.structure.subtree_w), np.asarray(st.subtree_w)
        )
        np.testing.assert_array_equal(
            np.asarray(fwd.structure.drop_level), np.asarray(st.drop_level)
        )


def test_nearest_ge_tiered_matches_flat(rng):
    """The tiered nearest->= kernel (RAHT3DGS_NEARESTGE=tiered) is bitwise
    identical to the flat kernel on real padded code topology in every
    dtype tier (int32/int64/uint64), positions and W-propagation alike.
    All its scans are selection ops picking the same elements, so this is
    exact equality, not tolerance."""
    from raht3dgs_tpu.ops.morton import code_dtype, pad_code
    from raht3dgs_tpu.ops.raht import num_levels
    from raht3dgs_tpu.ops.raht_span import (
        _msb,
        _nearest_ge_flat,
        _nearest_ge_tiered,
        _nge_tier_plan,
    )

    N = 8192
    for depth in (10, 18, 21):
        _, codes, _ = unique_voxel_cloud(rng, 6000, depth)
        n = len(codes)
        pads = np.asarray(
            pad_code(depth, N, jnp.arange(n, N)).astype(jnp.uint64)
        )
        codes_p = np.concatenate([codes.astype(np.uint64), pads])
        levels = num_levels(depth, N)
        cj = jnp.asarray(codes_p).astype(code_dtype(depth, N))
        diff = cj[1:] ^ cj[:-1]
        B = jnp.concatenate(
            [
                jnp.full((1,), levels + 1, jnp.int32),
                _msb(diff, levels).astype(jnp.int32),
            ]
        )
        n_vals = levels + 2
        assert _nge_tier_plan(N, n_vals) is not None, f"J={depth}: no plan"
        for args in ((B, n_vals),):
            want = _nearest_ge_flat(*args)
            got = _nearest_ge_tiered(*args)
            for a, b in zip(want, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        w = rng.integers(1, 5, N).astype(np.float64)
        W = jnp.asarray(np.concatenate([[0.0], np.cumsum(w)]))
        wantw = _nearest_ge_flat(B, n_vals, W)
        gotw = _nearest_ge_tiered(B, n_vals, W)
        for a, b in zip(wantw, gotw):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # below the tiering threshold the dispatcher falls back to flat
    assert _nge_tier_plan(4096, 34) is None
