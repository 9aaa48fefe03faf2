#!/usr/bin/env python3
"""Measure the dead-zone quantizer's RD gain over the reference quantizer.

Sweeps the same step grid through both quantizers ("mid" = the
reference's round-half-up — bitwise what ``/root/reference/python/
encode_ply.py:148`` computes — vs the opt-in "deadzone" path,
ops/quantize.py) on three realistic synthetic workloads (eval/synth.py):
the 56-channel 3DGS frame, a 3-channel color cloud, and an articulated
body scan (scan-like statistics). Reports the full
RD tables and the Bjontegaard delta rate (BD-rate: average % rate change
at equal PSNR; negative = deadzone spends fewer bits).

    python scripts/rd_deadzone.py [--n 20000] [--depth 10] \
        [--f 0.3333] [--delta 0.1667] [--out docs/rd_deadzone.md]
"""

from __future__ import annotations

import argparse
import math
import os
import sys


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    """Bjontegaard delta rate of curve B vs curve A, in percent.

    Standard method: cubic fit of log-rate as a function of PSNR for each
    curve, integrate both over the overlapping PSNR interval, convert the
    mean log-rate gap back to a percentage. Negative = B cheaper."""
    import numpy as np

    la, lb = np.log(np.asarray(rate_a)), np.log(np.asarray(rate_b))
    pa, pb = np.asarray(psnr_a), np.asarray(psnr_b)
    deg = min(3, len(pa) - 1, len(pb) - 1)
    fa = np.polynomial.polynomial.Polynomial.fit(pa, la, deg)
    fb = np.polynomial.polynomial.Polynomial.fit(pb, lb, deg)
    lo = max(pa.min(), pb.min())
    hi = min(pa.max(), pb.max())
    if hi <= lo:
        raise ValueError("RD curves do not overlap in PSNR")
    ia = fa.integ()
    ib = fb.integ()
    avg = ((ib(hi) - ib(lo)) - (ia(hi) - ia(lo))) / (hi - lo)
    return (math.exp(avg) - 1.0) * 100.0


def _psnr_3dgs(rec, ref):
    """Reference 3DGS metric: all-channel MSE-based PSNR
    (`/root/reference/python/encode_3dgs.py:297-299`)."""
    import numpy as np

    mse = float(np.mean((rec - ref) ** 2))
    return -10.0 * math.log10(mse + 1e-10)


def _psnr_y255(rec, ref):
    """Reference color metric: Y-channel PSNR vs 255 peak
    (`/root/reference/python/encode_ply.py:151-152` — computed there on
    the Y coefficient quantization error normalized by N*255^2, which by
    RAHT orthonormality equals this signal-domain Y MSE / 255^2)."""
    import numpy as np

    mse = float(np.mean((rec[:, 0] - ref[:, 0]) ** 2))
    return -10.0 * math.log10(mse / 255.0**2 + 1e-12)


def _sweep(codec_cls_kwargs, frame, steps, codec_factory, psnr_fn):
    """(bpp, psnr) per step for one codec configuration."""
    import numpy as np

    codec = codec_factory(**codec_cls_kwargs)
    coeffs, order, _, _ = codec.transform(frame)
    ref = np.asarray(frame.attributes)[: frame.n_voxels]
    out = []
    for enc in codec.encode_sweep(frame, steps, coeffs=coeffs, order=order):
        rec, _ = codec.decode(enc.stream, frame.codes, frame.weights)
        out.append((enc.stream.bpp(), psnr_fn(rec, ref)))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--f", type=float, default=0.3,
                    help="dead-zone encoder rounding offset")
    ap.add_argument("--delta", type=float, default=0.12,
                    help="dead-zone reconstruction offset")
    ap.add_argument("--steps", type=float, nargs="+",
                    default=[0.5, 1, 2, 4, 8, 16, 32])
    ap.add_argument("--color-steps", type=float, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64])
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from raht3dgs_tpu.eval.synth import (
        synthetic_color_frame,
        synthetic_gs_frame,
    )
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )

    dz_kw = dict(quant_mode="deadzone", quant_f=args.f,
                 rec_delta=args.delta)

    workloads = []
    V, attrs = synthetic_gs_frame(args.n, args.depth, args.seed)
    workloads.append((
        "3DGS 56-channel", args.steps,
        prepare_voxel_frame(V.astype(np.int64), attrs, args.depth),
        args.depth, _psnr_3dgs, "all-channel PSNR (encode_3dgs.py:297-299)",
    ))
    Vc, rgb = synthetic_color_frame(args.n, args.depth, args.seed)
    from raht3dgs_tpu.ops.color import rgb_to_yuv

    import jax.numpy as jnp

    yuv = np.asarray(rgb_to_yuv(jnp.asarray(rgb)))
    workloads.append((
        "color YUV (encode_ply workload)", args.color_steps,
        prepare_voxel_frame(Vc.astype(np.int64), yuv, args.depth),
        args.depth, _psnr_y255, "Y-PSNR vs 255 peak (encode_ply.py:151-152)",
    ))
    from raht3dgs_tpu.eval.synth import synthetic_body_scan

    Vb, rgbb = synthetic_body_scan(
        depth=min(args.depth, 9), seed=args.seed, n_frames=1,
        samples_per_voxel=2.0,
    )[0]
    yuvb = np.asarray(rgb_to_yuv(jnp.asarray(rgbb)))
    workloads.append((
        "body-scan color (scan-like statistics)", args.color_steps,
        prepare_voxel_frame(Vb.astype(np.int64), yuvb,
                            min(args.depth, 9)),
        min(args.depth, 9), _psnr_y255,
        "Y-PSNR vs 255 peak (encode_ply.py:151-152)",
    ))


    sections = [
        "# Dead-zone quantization: measured RD gain",
        "",
        f"Synthetic realistic workloads (eval/synth.py), N={args.n}, "
        f"J={args.depth}, seed={args.seed}. Dead-zone parameters: "
        f"f={args.f:.4f} (encoder rounding offset), "
        f"delta={args.delta:.4f} (reconstruction offset). 'mid' is the "
        "reference quantizer (`floor(x/step + 0.5)`, "
        "`/root/reference/python/encode_ply.py:148`); BD-rate < 0 means "
        "the dead-zone path reaches the same PSNR with that much less "
        "rate on average (Bjontegaard cubic-fit method).",
        "",
    ]
    for name, steps, frame, depth, psnr_fn, metric_note in workloads:
        def factory(**kw):
            return AttributeCodec(depth, **kw)

        mid = _sweep({}, frame, steps, factory, psnr_fn)
        dz = _sweep(dz_kw, frame, steps, factory, psnr_fn)
        bd = bd_rate([r for r, _ in mid], [p for _, p in mid],
                     [r for r, _ in dz], [p for _, p in dz])
        sections += [
            f"## {name}",
            "",
            f"Distortion metric: {metric_note}.",
            "",
            "| step | mid bpp | mid PSNR | dz bpp | dz PSNR |",
            "|---|---|---|---|---|",
            *(
                f"| {s:g} | {m[0]:.4f} | {m[1]:.2f} | {d[0]:.4f} "
                f"| {d[1]:.2f} |"
                for s, m, d in zip(steps, mid, dz)
            ),
            "",
            f"**BD-rate (deadzone vs mid): {bd:+.2f}%**",
            "",
        ]
        print(f"{name}: BD-rate {bd:+.2f}%")

    report = "\n".join(sections)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
