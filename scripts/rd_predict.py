#!/usr/bin/env python3
"""Measure the inter-depth predicted RAHT mode's RD gain over plain RAHT.

Sweeps the reference step grid through three encoder arms on the three
realistic synthetic workloads (eval/synth.py — [synthetic]: no real
captures are mountable in this environment):

- ``plain``    — the reference pipeline (plain RAHT + RLGR, parity path);
- ``predict``  — ``AttributeCodec(predict=True)`` (ops/praht.py), RLGR;
- ``predict+auto`` — prediction plus the per-channel RAC/RLGR entropy
  choice (the full beyond-reference stack).

Distortion uses the reference metric per workload (Y-PSNR vs 255 peak
for color, ``/root/reference/python/encode_ply.py:151-152``; all-channel
MSE PSNR for 3DGS, ``encode_3dgs.py:297-299``); BD-rate is the standard
Bjontegaard cubic fit. Negative = fewer bits at equal PSNR.

    python scripts/rd_predict.py [--n 20000] [--depth 10] \
        [--out docs/rd_predict.md]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

from rd_deadzone import _psnr_3dgs, _psnr_y255, bd_rate


def _sweep(kwargs, frame, steps, depth):
    """Returns (points, timing) — timing holds the sweep wall-clocks:
    total encode seconds (first predicted step pays the step-independent
    plan build; later steps reuse it through the codec cache), per-step
    encode/decode means."""
    import time

    import numpy as np

    from raht3dgs_tpu.models.pipeline import AttributeCodec

    codec = AttributeCodec(depth, **kwargs)
    out = []
    enc_t, dec_t = [], []
    t0 = time.perf_counter()
    encs = codec.encode_sweep(frame, [float(s) for s in steps])
    enc_total = time.perf_counter() - t0
    for enc in encs:
        t1 = time.perf_counter()
        rec, _ = codec.decode(enc.stream, frame.codes, frame.weights)
        dec_t.append(time.perf_counter() - t1)
        out.append((enc.stream.bpp(), rec, enc.stream.predict_mask))
    # one more encode of a mid step on the WARM cache = the marginal
    # per-step cost (what a rate-search probe or one sweep point pays)
    t2 = time.perf_counter()
    codec.encode(frame, float(steps[len(steps) // 2]))
    enc_t.append(time.perf_counter() - t2)
    timing = {
        "enc_total_s": enc_total,
        "enc_step_s": enc_t[0],
        "dec_step_s": float(np.mean(dec_t)),
    }
    return out, timing


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=float, nargs="+",
                    default=[0.5, 1, 2, 4, 8, 16, 32])
    ap.add_argument("--color-steps", type=float, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64])
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from raht3dgs_tpu.eval.synth import (
        synthetic_body_scan,
        synthetic_color_frame,
        synthetic_gs_frame,
    )
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.ops.color import rgb_to_yuv

    workloads = []
    V, attrs = synthetic_gs_frame(args.n, args.depth, args.seed)
    workloads.append((
        "3DGS 56-channel", args.steps,
        prepare_voxel_frame(V.astype(np.int64), attrs, args.depth),
        args.depth, _psnr_3dgs,
        "all-channel PSNR (encode_3dgs.py:297-299)",
    ))
    Vc, rgb = synthetic_color_frame(args.n, args.depth, args.seed)
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(rgb)))
    workloads.append((
        "color YUV (encode_ply workload)", args.color_steps,
        prepare_voxel_frame(Vc.astype(np.int64), yuv, args.depth),
        args.depth, _psnr_y255,
        "Y-PSNR vs 255 peak (encode_ply.py:151-152)",
    ))
    bd_depth = min(args.depth, 9)
    Vb, rgbb = synthetic_body_scan(
        depth=bd_depth, seed=args.seed, n_frames=1, samples_per_voxel=2.0,
    )[0]
    yuvb = np.asarray(rgb_to_yuv(jnp.asarray(rgbb)))
    workloads.append((
        "body-scan color (scan-like statistics)", args.color_steps,
        prepare_voxel_frame(Vb.astype(np.int64), yuvb, bd_depth),
        bd_depth, _psnr_y255,
        "Y-PSNR vs 255 peak (encode_ply.py:151-152)",
    ))

    arms = [
        ("plain", {}),
        ("predict", dict(predict=True)),
        ("predict+auto", dict(predict=True, entropy="auto")),
    ]
    sections = [
        "# Inter-depth predicted RAHT: measured RD gain [synthetic]",
        "",
        f"Synthetic realistic workloads (eval/synth.py), N={args.n}, "
        f"J={args.depth} (body scan J={bd_depth}), seed={args.seed}. "
        "'plain' is the reference pipeline (plain RAHT + RLGR); "
        "'predict' codes each depth group as residuals against the "
        "upsampled coarser-depth reconstruction with a per-depth "
        "signalled on/off decision (ops/praht.py); 'predict+auto' adds "
        "the per-channel RAC/RLGR entropy choice. BD-rate < 0 = fewer "
        "bits at equal PSNR (Bjontegaard cubic fit). Reconstructions "
        "differ between arms (prediction changes the quantization "
        "lattice), so this is a true RD comparison, not an equal-output "
        "rate diff.",
        "",
    ]
    for name, steps, frame, depth, psnr_fn, metric_note in workloads:
        ref = np.asarray(frame.attributes)[: frame.n_voxels]
        curves = {}
        masks = {}
        timings = {}
        for arm, kw in arms:
            pts, timings[arm] = _sweep(kw, frame, steps, depth)
            curves[arm] = [(b, psnr_fn(r, ref)) for b, r, _ in pts]
            masks[arm] = [m for _, _, m in pts]
        base = curves["plain"]
        sections += [
            f"## {name}",
            "",
            f"Distortion metric: {metric_note}.",
            "",
            "| step | plain bpp | plain PSNR | predict bpp | predict "
            "PSNR | +auto bpp | +auto PSNR | mask |",
            "|---|---|---|---|---|---|---|---|",
            *(
                f"| {s:g} | {p[0]:.4f} | {p[1]:.2f} | {q[0]:.4f} | "
                f"{q[1]:.2f} | {a[0]:.4f} | {a[1]:.2f} | "
                f"{masks['predict'][i]:0{depth}b} |"
                for i, (s, p, q, a) in enumerate(zip(
                    steps, base, curves["predict"],
                    curves["predict+auto"]))
            ),
            "",
        ]
        for arm in ("predict", "predict+auto"):
            bd = bd_rate(
                [r for r, _ in base], [p for _, p in base],
                [r for r, _ in curves[arm]],
                [p for _, p in curves[arm]],
            )
            sections.append(f"**BD-rate ({arm} vs plain): {bd:+.2f}%**")
            sections.append("")
            print(f"{name} / {arm}: BD-rate {bd:+.2f}%")
        n = frame.n_voxels
        sections += [
            "Wall-clocks (this host, CPU; encode sweep = "
            f"{len(steps)} steps; the first predicted step builds the "
            "step-independent plan, later steps reuse it — "
            "ops/praht.py:PrahtPlan; 'warm step' = one more encode on "
            "the warm cache, the marginal rate-search-probe cost):",
            "",
            "| arm | sweep encode s | warm step s | decode/step s | "
            "enc Mpts/s (warm) |",
            "|---|---|---|---|---|",
            *(
                f"| {arm} | {t['enc_total_s']:.2f} | {t['enc_step_s']:.2f}"
                f" | {t['dec_step_s']:.2f} | "
                f"{n / max(t['enc_step_s'], 1e-9) / 1e6:.2f} |"
                for arm, t in timings.items()
            ),
            "",
        ]
        for arm, t in timings.items():
            print(f"  {name} / {arm}: sweep {t['enc_total_s']:.2f}s, "
                  f"warm step {t['enc_step_s']:.2f}s, "
                  f"dec {t['dec_step_s']:.2f}s")

    report = "\n".join(sections)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
