#!/usr/bin/env python3
"""Rate-control tracking accuracy: how tightly --target-bpp lands.

For a synthetic body-scan sequence, encodes every frame at several rate
budgets through the rate-targeted paths (intra: ``search_step_for_bpp``;
temporal: ``SequenceCodec.encode_frame_target``) and reports per-budget
tracking error (actual vs target bpp) plus the Y-PSNR achieved — the
evidence artifact for the constant-rate feature (`encode_dataset
--target-bpp [--inter]`). The contract is one-sided: actual <= target
(the search takes the largest-quality step that fits the budget).

    python scripts/rd_ratecontrol.py [--out docs/rd_ratecontrol.md]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--budgets", type=float, nargs="+",
                    default=[1.0, 2.0, 4.0, 8.0])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax.numpy as jnp

    from raht3dgs_tpu.eval.synth import (
        synthetic_body_scan,
        synthetic_color_sequence,
    )
    from raht3dgs_tpu.models.color_codec import y_psnr_db
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.models.rd_search import search_step_for_bpp
    from raht3dgs_tpu.models.temporal import SequenceCodec
    from raht3dgs_tpu.ops.color import rgb_to_yuv

    def build(seq):
        out = []
        for V, rgb in seq:
            yuv = np.asarray(
                rgb_to_yuv(jnp.asarray(rgb.astype(np.float64)))
            )
            out.append(prepare_voxel_frame(V.astype(np.int64), yuv,
                                           args.depth))
        return out

    workloads = [
        ("body scan (fast per-frame scan noise — the adaptive fallback "
         "should pick intra)", build(synthetic_body_scan(
             depth=args.depth, seed=args.seed, n_frames=args.frames,
             samples_per_voxel=2.0, phase_rate=0.15,
         ))),
        ("deforming textured surface (persistent texture — P-frames "
         "should win)", build(synthetic_color_sequence(
             n_frames=args.frames, depth=args.depth, seed=args.seed,
         ))),
    ]

    sections = []
    for wname, frames in workloads:
        n_mean = int(np.mean([f.n_voxels for f in frames]))
        print(f"{wname}: {len(frames)} frames, ~{n_mean} voxels, "
              f"J={args.depth}")
        rows = _sweep_budgets(args, frames)
        sections.append((wname, n_mean, rows))

    report_rows = []
    for wname, n_mean, rows in sections:
        report_rows += [f"", f"## {wname} (~{n_mean} voxels/frame)", "",
                        _TABLE_HEAD, _TABLE_SEP, *rows]

    report = "\n".join([
        "# Rate-control tracking (--target-bpp)",
        "",
        f"Synthetic sequences (eval/synth.py), {args.frames} frames each, "
        f"J={args.depth}. For each budget, every frame is encoded through "
        "the rate-targeted intra path and the rate-controlled temporal "
        "path (`SequenceCodec.encode_frame_target`). The contract is "
        "one-sided: actual <= target on EVERY frame ('max over' = worst "
        "per-frame overshoot, must be <= 0); mean bpp below target "
        "reflects the discrete step grid. The `+cbr` columns re-run the "
        "intra path through the sequence-global leaky-bucket allocator "
        "(`--cbr`, models/rate_control.py): unspent budget carries "
        "forward as credit, so the mean climbs back toward target — while "
        "every PREFIX mean stays at or under it (asserted). The `2pass` "
        "columns run the constant-quality allocator (`--two-pass`, one "
        "shared step for the whole sequence, total <= budget asserted): "
        "same rate class, but the per-frame PSNR spread (`PSNR spread "
        "cbr/2p`, max-min dB) collapses to the content's own variance. "
        "`[synthetic]` content, like all RD artifacts in this repo.",
        *report_rows,
    ])
    print()
    print("OK: no frame exceeded its budget")
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
        print(f"wrote {args.out}")
    return 0


_TABLE_HEAD = ("| target bpp | intra mean bpp | intra max over "
               "| intra Y-PSNR | +cbr mean bpp | +cbr Y-PSNR "
               "| 2pass mean bpp | 2pass Y-PSNR | PSNR spread cbr/2p "
               "| inter mean bpp | inter max over "
               "| inter Y-PSNR | frame kinds |")
_TABLE_SEP = "|---|---|---|---|---|---|---|---|---|---|---|---|---|"


def _sweep_budgets(args, frames):
    import numpy as np

    from raht3dgs_tpu.models.color_codec import y_psnr_db
    from raht3dgs_tpu.models.pipeline import AttributeCodec
    from raht3dgs_tpu.models.rd_search import search_step_for_bpp
    from raht3dgs_tpu.models.temporal import SequenceCodec

    rows = []
    for budget in args.budgets:
        # intra rate targeting (the encode_ply/encode_dataset path)
        from raht3dgs_tpu.models.pipeline import AttributeCodec

        codec = AttributeCodec(args.depth)
        intra_bpp, intra_psnr = [], []
        for f in frames:
            r = search_step_for_bpp(f, budget, codec=codec)
            rec, _ = codec.decode(r.encoded.stream, f.codes, f.weights)
            intra_bpp.append(r.bpp)
            intra_psnr.append(y_psnr_db(
                np.asarray(f.attributes)[: f.n_voxels, 0], rec[:, 0]
            ))
        # sequence-global CBR (encode_dataset --target-bpp --cbr): credit
        # carry must close the underspend without breaking any prefix
        from raht3dgs_tpu.models.rate_control import RateController

        rc = RateController(budget)
        cbr_bpp, cbr_psnr = [], []
        for f in frames:
            r = search_step_for_bpp(f, rc.frame_budget(), codec=codec)
            rc.update(r.bpp)
            rec, _ = codec.decode(r.encoded.stream, f.codes, f.weights)
            cbr_bpp.append(r.bpp)
            cbr_psnr.append(y_psnr_db(
                np.asarray(f.attributes)[: f.n_voxels, 0], rec[:, 0]
            ))
            assert np.mean(cbr_bpp) <= budget + 1e-9, "prefix overshoot!"
        # carrying credit spends at least what independent budgets did
        assert np.mean(cbr_bpp) >= np.mean(intra_bpp) - 1e-9
        # two-pass constant-quality allocation (--target-bpp --two-pass):
        # one shared step, whole-sequence budget, tighter quality spread
        from raht3dgs_tpu.models.rd_search import search_global_step_for_bpp

        gres = search_global_step_for_bpp(frames, budget, codec=codec)
        tp_bpp, tp_psnr = [], []
        for f, enc in zip(frames, gres.encoded):
            rec, _ = codec.decode(enc.stream, f.codes, f.weights)
            tp_bpp.append(enc.stream.bpp())
            tp_psnr.append(y_psnr_db(
                np.asarray(f.attributes)[: f.n_voxels, 0], rec[:, 0]
            ))
        assert gres.total_bpp <= budget + 1e-9, "sequence overshoot!"
        # temporal rate targeting (encode_dataset --target-bpp --inter)
        sc = SequenceCodec(args.depth, gop=8)
        inter_bpp, inter_psnr, kinds = [], [], []
        for f in frames:
            stream, rec, _step = sc.encode_frame_target(f, budget)
            inter_bpp.append(stream.bpp())
            inter_psnr.append(y_psnr_db(
                np.asarray(f.attributes)[: f.n_voxels, 0], rec[:, 0]
            ))
            kinds.append("P" if stream.inter else "I")
        over_i = max(b - budget for b in intra_bpp)
        over_t = max(b - budget for b in inter_bpp)
        rows.append(
            f"| {budget:g} "
            f"| {np.mean(intra_bpp):.3f} | {over_i:+.4f} "
            f"| {np.mean(intra_psnr):.2f} "
            f"| {np.mean(cbr_bpp):.3f} | {np.mean(cbr_psnr):.2f} "
            f"| {np.mean(tp_bpp):.3f} | {np.mean(tp_psnr):.2f} "
            f"| {np.ptp(cbr_psnr):.2f}/{np.ptp(tp_psnr):.2f} "
            f"| {np.mean(inter_bpp):.3f} | {over_t:+.4f} "
            f"| {np.mean(inter_psnr):.2f} | {''.join(kinds)} |"
        )
        print(rows[-1])
        assert over_i <= 1e-9 and over_t <= 1e-9, "budget overshoot!"
    return rows


if __name__ == "__main__":
    sys.exit(main())
