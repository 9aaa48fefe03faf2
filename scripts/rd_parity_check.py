#!/usr/bin/env python3
"""Rate-distortion parity check against the reference implementation.

Runs the SAME Morton-ordered frame through (a) this framework's codec and
(b) the reference PyTorch pipeline (imported at runtime from the read-only
mount — RAHT_param_reorder_fast + RAHT2_optimized + inverse_RAHT_optimized +
its RLGR automaton via our bit-identical coder), then compares bpp and
Y-PSNR per quantization step.

This is the executable form of the BASELINE.md parity target ("RD-curve
parity with the reference"). Expected outcome: identical rates to the byte
and PSNR to ~1e-6 dB (the transforms agree at 1e-12 and the entropy coder
is bit-identical).

    python scripts/rd_parity_check.py [--n 50000] [--depth 10] \
        [--steps 1 2 4 8 16 32 64] [--reference /root/reference/python] \
        [--out docs/rd_parity.md]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--steps", type=float, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64])
    ap.add_argument("--reference", default="/root/reference/python")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import os

    if not os.path.isdir(args.reference):
        print(f"reference tree not found at {args.reference}; skipping")
        return 0

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp

    from raht3dgs_tpu.codec.rlgr import rlgr_encode
    from raht3dgs_tpu.models.color_codec import encode_color_frame, y_psnr_db
    from raht3dgs_tpu.ops.morton import morton_decode
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    # --- shared synthetic frame: unique voxels, Morton-ordered (the
    # reference prelude requires Morton order) ---
    rng = np.random.default_rng(args.seed)
    pts = rng.integers(0, 2**args.depth, size=(2 * args.n, 3))
    codes = np.unique(morton_codes_np(pts, args.depth))[: args.n]
    V = np.asarray(morton_decode(jnp.asarray(codes), args.depth), dtype=np.float64)
    n = len(V)
    # smooth-ish colors for realistic coefficient statistics
    rgb = (V / 2**args.depth * 255.0 + rng.normal(0, 8, size=(n, 3))).clip(0, 255)

    # --- ours ---
    ours = encode_color_frame(
        V, rgb, depth=args.depth, steps=args.steps, bucket=1 << 12
    )

    # --- reference (imported from the mount; torch CPU) ---
    sys.path.insert(0, args.reference)
    import torch

    from RAHT import RAHT2_optimized
    from RAHT_param import RAHT_param_reorder_fast
    from iRAHT import inverse_RAHT_optimized
    from utils import rgb_to_yuv as ref_rgb_to_yuv

    Vt = torch.from_numpy(V).to(torch.float64)
    C = ref_rgb_to_yuv(torch.from_numpy(rgb).to(torch.float64))
    origin = torch.zeros(3, dtype=torch.float64)
    Lists, Flags, weights, order = RAHT_param_reorder_fast(
        Vt, origin, 2**args.depth, args.depth
    )
    Coeff, w = RAHT2_optimized(C, Lists, Flags, weights)

    rows = []
    worst_bpp = worst_psnr = 0.0
    for i, step in enumerate(args.steps):
        q = torch.floor(Coeff / step + 0.5)
        reordered = q.index_select(0, order).to(torch.int64).numpy()
        nbytes = sum(
            len(rlgr_encode(reordered[:, d])[0]) for d in range(3)
        )
        ref_bpp = nbytes * 8 / n
        # q is already in transform order (the stream reorder + its inverse
        # cancel for the reconstruction path)
        rec = inverse_RAHT_optimized(q * step, Lists, Flags, weights)
        ref_psnr = y_psnr_db(C[:, 0].numpy(), rec[:, 0].numpy())
        o = ours[i]
        d_bpp = abs(o.bpp - ref_bpp)
        d_psnr = abs(o.psnr - ref_psnr)
        worst_bpp = max(worst_bpp, d_bpp)
        worst_psnr = max(worst_psnr, d_psnr)
        rows.append(
            f"| {step:g} | {ref_bpp:.6f} | {o.bpp:.6f} | {d_bpp:.2e} "
            f"| {ref_psnr:.4f} | {o.psnr:.4f} | {d_psnr:.2e} |"
        )

    report = "\n".join(
        [
            "# RD parity vs the reference implementation",
            "",
            f"Synthetic Morton-ordered frame: N={n}, J={args.depth}, "
            f"seed={args.seed}. Reference = PyTorch pipeline imported from "
            f"`{args.reference}` (RLGR via the bit-identical coder).",
            "",
            "| step | ref bpp | ours bpp | Δbpp | ref Y-PSNR | ours Y-PSNR | ΔPSNR |",
            "|---|---|---|---|---|---|---|",
            *rows,
            "",
            f"max |Δbpp| = {worst_bpp:.3e}, max |ΔPSNR| = {worst_psnr:.3e} dB",
        ]
    )
    print(report)
    ok = worst_bpp < 1e-6 and worst_psnr < 1e-3
    print("\nPARITY:", "OK" if ok else "FAILED")
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
