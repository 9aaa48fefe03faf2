#!/usr/bin/env python3
"""Zero-run binarization for RAC: can it take the ultra-sparse channels
where RLGR still wins?

docs/rd_attr_entropy.md: below ~0.5% nonzero fraction the adaptive
binary significance flag's probability floor (-log2(4065/4096) ~ 0.011
bits/zero) loses to RLGR's zero-run mode. Candidate profile: binarize
the ZERO-RUN LENGTHS instead of per-position flags — run r coded as
adaptive-binary exp-Golomb bins (unary-over-bins adaptive, suffix bits
bypass), then the nonzero value's (mag-1) via gt1/gt2/Rice as in
profile 0. Costed with the exact coder automaton (ctxsim) + bypass
bits, vs the REAL byte counts of RLGR and shipped RAC profile 0 on the
actual sparse channels of the 3DGS workload.

Run: python scripts/exp_rac_runs.py [--n 50000] [--steps 2 4 8 16 32]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from exp_geom_contexts import sim_bits  # noqa: E402


def run_model_bits(q: np.ndarray, n_ctx_bins: int = 16) -> float:
    """Cost of the zero-run candidate on one channel stream.

    Runs: positions of nonzeros -> gaps; each gap g coded as adaptive
    exp-Golomb: bin b = floor(log2(g+1)) via unary over adaptive bin
    contexts (bit i: [b > i]), suffix bits bypass. A final run to the
    stream end is coded the same way (the decoder knows n, so the last
    run needs signalling only if we don't; we do — simplest). Nonzero
    magnitudes: sign bypass + gt1/gt2 adaptive + Rice remainder with the
    channel-best k (5 bits signalled)."""
    n = len(q)
    mag = np.abs(q.astype(np.int64))
    nz = np.flatnonzero(mag)
    # gaps: zeros before each nonzero, plus the tail run
    prev = np.concatenate([[-1], nz])
    gaps = np.concatenate([nz - prev[:-1] - 1, [n - 1 - (nz[-1] if len(nz) else -1)]])
    bins = np.floor(np.log2(gaps + 1)).astype(np.int64)
    # unary-over-bins adaptive decisions: for gap with bin b, emit
    # [b>0], [b>1], ..., [b>b-1]=1s then [b>b]=0 (cap at n_ctx_bins)
    ctx_list, bit_list = [], []
    for g_bin in bins:
        b = min(int(g_bin), n_ctx_bins - 1)
        ctx_list.append(np.arange(b + 1, dtype=np.int32))
        bits = np.ones(b + 1, np.uint8)
        if g_bin < n_ctx_bins - 1:
            bits[-1] = 0
        bit_list.append(bits)
    ctx = np.concatenate(ctx_list) if ctx_list else np.zeros(0, np.int32)
    bits = np.concatenate(bit_list) if bit_list else np.zeros(0, np.uint8)
    total = sim_bits(ctx, bits, n_ctx_bins)
    # suffix bits (bypass): bin b has b suffix bits (value - (2^b - 1))
    total += float(np.sum(np.minimum(bins, 63)))
    if len(nz) == 0:
        return total
    # escape for bins >= cap: raw 32-bit gap
    total += 32.0 * float(np.sum(bins >= n_ctx_bins - 1))
    # nonzero magnitudes: sign + gt1/gt2 adaptive + Rice remainder
    m = mag[nz]
    total += float(len(nz))  # signs
    g1 = (m > 1).astype(np.uint8)
    g2 = (m[m > 1] > 2).astype(np.uint8)
    ctx2 = np.concatenate([
        np.full(len(m), n_ctx_bins, np.int32),
        np.full(int((m > 1).sum()), n_ctx_bins + 1, np.int32),
    ])
    bits2 = np.concatenate([g1, g2])
    total += sim_bits(ctx2, bits2, n_ctx_bins + 2)
    rems = (m[m > 2] - 3).astype(np.int64)
    if rems.size:
        best = min(
            float(np.sum(np.where(rems >> k >= 20, 52, (rems >> k) + 1 + k)))
            for k in range(16)
        )
        total += best + 5
    return total


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--steps", type=float, nargs="+",
                    default=[1, 2, 4, 8, 16, 32])
    args = ap.parse_args(argv)

    from raht3dgs_tpu.codec.rac import rac_encode
    from raht3dgs_tpu.codec.rlgr import rlgr_encode
    from raht3dgs_tpu.eval.synth import synthetic_gs_frame
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        _quant_reorder_device,
        prepare_voxel_frame,
    )

    V, attrs = synthetic_gs_frame(args.n, args.depth, 0)
    frame = prepare_voxel_frame(V, attrs.astype(np.float64), args.depth)
    codec = AttributeCodec(args.depth)
    coeffs, order, _, _ = codec.transform(frame)
    n = frame.n_voxels
    D = attrs.shape[1]
    print(f"3DGS n={n} D={D}")
    print(f"{'step':>5} {'rlgr':>9} {'rac p0':>9} {'runs(sim)':>10} "
          f"{'min+runs':>9} {'d_total':>8}")
    for step in args.steps:
        q = np.asarray(_quant_reorder_device(
            coeffs, jnp.atleast_1d(jnp.asarray(step, jnp.float64)), order,
            jnp.int32(n), "mid", jnp.asarray(0.0, jnp.float64),
        ))[:, :n].astype(np.int32)
        t_rl = t_p0 = t_run = t_min = t_minr = 0.0
        for d in range(D):
            rl = 8 * len(rlgr_encode(q[d], signed=True)[0])
            p0 = 8 * len(rac_encode(q[d])[0])
            rn = run_model_bits(q[d]) + 8 * 5  # header: profile+ks
            t_rl += rl
            t_p0 += p0
            t_run += rn
            t_min += min(rl, p0)
            t_minr += min(rl, p0, rn)
        print(f"{step:5g} {t_rl/n:9.4f} {t_p0/n:9.4f} {t_run/n:10.4f} "
              f"{t_minr/n:9.4f} {100*(t_minr/t_min-1):+7.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
