import pytest
import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.codec.rlgr import rlgr_encode
from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from raht3dgs_tpu.models.rd_search import search_step_for_bpp
from raht3dgs_tpu.ops.rate_model import estimate_rlgr_bits
from conftest import unique_voxel_cloud


def _true_bits(q):
    total = 0
    for d in range(q.shape[1]):
        data, _ = rlgr_encode(q[:, d])
        total += len(data) * 8
    return total


def test_estimate_tracks_true_size(rng):
    depth = 6
    pts, _, attrs = unique_voxel_cloud(rng, 2000, depth)
    # smooth attributes -> realistic RAHT coefficient statistics
    attrs = (pts / 2**depth * 255).astype(np.float64)
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth, bucket=512)
    codec = AttributeCodec(depth)
    coeffs, order, _, _ = codec.transform(frame)
    coeffs_np = np.asarray(coeffs)

    est_prev = None
    for step in (1.0, 4.0, 16.0, 64.0):
        q = np.floor(coeffs_np / step + 0.5).astype(np.int32)
        valid = jnp.arange(len(q)) < frame.n_voxels
        est = float(np.sum(np.asarray(
            estimate_rlgr_bits(jnp.asarray(q), valid=valid)
        )))
        true = _true_bits(q[: frame.n_voxels])
        # monotone decreasing with step, and within a reasonable factor
        assert 0.5 * true <= est <= 2.5 * true, (step, est, true)
        if est_prev is not None:
            assert est < est_prev
        est_prev = est


def test_rate_search_hits_budget(rng):
    depth = 6
    pts, _, _ = unique_voxel_cloud(rng, 1500, depth)
    attrs = (pts * 7 % 256).astype(np.float64)
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth, bucket=512)
    codec = AttributeCodec(depth)

    # determine a feasible target from a mid sweep point
    mid = codec.encode(frame, steps=8.0).stream.bpp()
    target = mid * 1.1
    res = search_step_for_bpp(frame, target, codec=codec)
    assert res.bpp <= target * 1.001, (res.bpp, target)
    # shouldn't be wastefully far below budget either
    assert res.bpp >= target * 0.4
    assert res.probes <= 25


def test_rate_search_infeasible_budget(rng):
    depth = 5
    pts, _, attrs = unique_voxel_cloud(rng, 400, depth)
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth, bucket=512)
    res = search_step_for_bpp(frame, target_bpp=0.0001)
    # caps at hi step; returns the smallest achievable rate
    assert res.step >= 4000 or res.bpp <= 0.0001


def test_search_with_steps_fn_vector(rng):
    # per-channel multipliers (3DGS-style): search still converges and the
    # refined encode honors the vector mapping
    from conftest import unique_voxel_cloud
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame, AttributeCodec
    import numpy as np

    depth = 5
    pts, _, attrs = unique_voxel_cloud(rng, 600, depth, d_attr=4)
    frame = prepare_voxel_frame(pts, attrs, depth, bucket=1024)
    codec = AttributeCodec(depth)
    mult = np.array([0.5, 0.5, 1.0, 2.0])
    res = search_step_for_bpp(
        frame, 8.0, codec=codec, steps_fn=lambda s: s * mult
    )
    assert res.bpp <= 8.0 * 1.02
    assert res.step > 0


# ---- sequence-global allocation (models/rate_control.py) ----------------


def test_rate_controller_invariants():
    """Prefix invariant + burst bound, against a simulated one-sided
    search that spends a random fraction of each frame's budget."""
    import numpy as np

    from raht3dgs_tpu.models.rate_control import RateController

    rng = np.random.default_rng(0)
    for burst in (0.0, 0.5, 2.0, None):
        rc = RateController(2.0, burst=burst)
        cap = 2.0 if burst is None else burst
        spent = []
        for _ in range(200):
            budget = rc.frame_budget()
            assert budget <= 2.0 + cap + 1e-12
            actual = budget * rng.uniform(0.5, 1.0)
            rc.update(actual)
            spent.append(actual)
            # the streaming guarantee: every prefix mean <= target
            assert np.mean(spent) <= 2.0 + 1e-12
            assert 0.0 <= rc.credit <= cap + 1e-12
        assert rc.mean_bpp <= 2.0 + 1e-12
        if cap > 0:
            # carrying credit must spend more than independent budgets
            # would on this 50-100% spender (which averages 75% of 2.0)
            assert rc.mean_bpp > 1.5


def test_rate_controller_overspend_becomes_debt():
    """An infeasible frame (coder floor above budget) must degrade to
    carried debt + warning, not crash the sequence encode mid-run."""
    import pytest

    from raht3dgs_tpu.models.rate_control import RateController

    rc = RateController(1.0, burst=0.5)
    rc.update(0.9)
    credit_before = rc.credit
    with pytest.warns(RuntimeWarning, match="debt"):
        rc.update(rc.frame_budget() + 0.25)
    assert rc.credit < credit_before  # overshoot recorded as debt
    assert rc.frame_budget() > 0  # later searches still get a valid target
    # debt is floored: a pathological spend can't starve the sequence forever
    with pytest.warns(RuntimeWarning):
        rc.update(1000.0)
    assert rc.credit >= -(rc.burst + rc.target_bpp) - 1e-12
    # repayment: in-budget frames restore positive credit eventually
    for _ in range(5):
        rc.update(0.0)
    assert rc.credit > 0
    with pytest.raises(ValueError):
        RateController(0.0)
    with pytest.raises(ValueError):
        RateController(1.0, burst=-1.0)


def test_cbr_tightens_sequence_tracking(rng):
    """End-to-end: CBR credit carry lands the sequence mean closer to the
    target than independent per-frame budgets, without any prefix ever
    exceeding it (tiny 3-frame sequence, real encodes)."""
    from raht3dgs_tpu.models.rate_control import RateController

    depth = 6
    frames = []
    for k in range(3):
        pts, _, _ = unique_voxel_cloud(rng, 1200 + 40 * k, depth)
        attrs = (pts * (7 + k) % 256).astype(np.float64)
        frames.append(
            prepare_voxel_frame(pts.astype(np.int64), attrs, depth,
                                bucket=2048)
        )
    codec = AttributeCodec(depth)
    target = 3.0

    indep = [search_step_for_bpp(f, target, codec=codec).bpp
             for f in frames]
    assert max(indep) <= target * 1.001

    rc = RateController(target)
    cbr = []
    for f in frames:
        r = search_step_for_bpp(f, rc.frame_budget(), codec=codec)
        rc.update(r.bpp)
        cbr.append(r.bpp)
    for k in range(len(cbr)):
        assert np.mean(cbr[: k + 1]) <= target * 1.001, (k, cbr)
    assert np.mean(cbr) >= np.mean(indep) - 1e-9, (cbr, indep)


def test_two_pass_global_step(rng):
    """Constant-quality allocation: ONE step for every frame, sequence
    total at or under budget, and the step is the finest such step on
    its refinement trajectory (coarsening it further must stay under)."""
    from raht3dgs_tpu.models.rd_search import search_global_step_for_bpp

    depth = 6
    frames = []
    for k in range(3):
        pts, _, _ = unique_voxel_cloud(rng, 1000 + 300 * k, depth)
        attrs = (pts * (5 + 3 * k) % 256).astype(np.float64)
        frames.append(
            prepare_voxel_frame(pts.astype(np.int64), attrs, depth,
                                bucket=2048)
        )
    codec = AttributeCodec(depth)
    target = 3.0
    res = search_global_step_for_bpp(frames, target, codec=codec)
    assert res.total_bpp <= target * 1.001
    assert len(res.encoded) == 3
    # one shared step: every stream records it
    for enc in res.encoded:
        assert float(enc.stream.steps[0]) == res.step
    # total accounting matches the per-frame streams
    bits = sum(e.stream.payload_bytes * 8 for e in res.encoded)
    n = sum(f.n_voxels for f in frames)
    assert abs(bits / n - res.total_bpp) < 1e-12


def test_two_pass_rejects_mixed_depth(rng):
    from raht3dgs_tpu.models.rd_search import search_global_step_for_bpp

    pts5, _, _ = unique_voxel_cloud(rng, 500, 5)
    pts6, _, _ = unique_voxel_cloud(rng, 500, 6)
    f5 = prepare_voxel_frame(pts5.astype(np.int64),
                             (pts5 % 256).astype(np.float64), 5,
                             bucket=1024)
    f6 = prepare_voxel_frame(pts6.astype(np.int64),
                             (pts6 % 256).astype(np.float64), 6,
                             bucket=1024)
    with pytest.raises(ValueError, match="depth"):
        search_global_step_for_bpp([f5, f6], 2.0)


def test_cbr_gop_segments_independent(rng):
    """reset_credit at GOP boundaries: every GOP's spend independently
    satisfies the prefix invariant (a receiver joining at a boundary
    streams within rate with zero history)."""
    from raht3dgs_tpu.models.rate_control import RateController

    depth = 6
    frames = []
    for k in range(4):
        pts, _, _ = unique_voxel_cloud(rng, 900 + 80 * k, depth)
        attrs = (pts * (3 + k) % 256).astype(np.float64)
        frames.append(prepare_voxel_frame(pts.astype(np.int64), attrs,
                                          depth, bucket=1024))
    codec = AttributeCodec(depth)
    target, gop = 3.0, 2
    rc = RateController(target)
    spends = []
    for i, f in enumerate(frames):
        if i % gop == 0:
            rc.reset_credit()
            assert rc.credit == 0.0
        r = search_step_for_bpp(f, rc.frame_budget(), codec=codec)
        rc.update(r.bpp)
        spends.append(r.bpp)
    for g0 in range(0, len(frames), gop):
        seg = spends[g0:g0 + gop]
        for k in range(len(seg)):
            assert np.mean(seg[: k + 1]) <= target * 1.001, (g0, k, seg)


def test_rate_search_predicted_seed_cost(rng):
    """Rate-model honesty for predicted streams (VERDICT r4 task 9): the
    device rate model seeds from PLAIN-transform statistics, but a
    predicted stream's rate is lower (that is the point), so the seed step
    overshoots quality headroom and the ratio-refine loop must absorb the
    bias with extra true encodes. Pin that the search still lands in
    budget and that the extra refinement cost stays bounded (measured
    numbers recorded in docs/rd_ratecontrol.md)."""
    depth = 6
    pts, _, _ = unique_voxel_cloud(rng, 2500, depth)
    # smooth content so prediction actually engages (noise turns it off
    # and the two searches degenerate to the same statistics)
    attrs = np.stack([
        np.sin(pts[:, 0] / 6.0) * 90 + 120,
        (pts[:, 1] * 2.5 + pts[:, 2]) % 200,
        np.cos(pts[:, 2] / 9.0) * 70 + 100,
    ], axis=1).astype(np.float64)
    frame = prepare_voxel_frame(pts.astype(np.int64), attrs, depth,
                                bucket=1024)
    plain = AttributeCodec(depth)
    pred = AttributeCodec(depth, predict=True, predict_impl="host")

    mid = plain.encode(frame, steps=8.0).stream.bpp()
    counts = {}
    for name, codec in (("plain", plain), ("predict", pred)):
        res = search_step_for_bpp(frame, mid * 1.1, codec=codec)
        assert res.bpp <= mid * 1.1 * 1.001, (name, res.bpp)
        counts[name] = res.true_encodes
        if name == "predict":
            assert res.encoded.stream.predict
    # the predicted search may pay extra refinements for the plain-stat
    # seed, but the ratio loop must keep it bounded — a blowup here means
    # the model seed has become useless for predicted streams
    assert counts["predict"] <= counts["plain"] + 4, counts
    assert counts["plain"] <= 8, counts
