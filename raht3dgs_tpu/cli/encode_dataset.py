"""Dataset RD-sweep driver (reference: python/encode_dataset.py).

Loops the color codec over frames of an 8iVFBv2/MVUB sequence with per-frame
depth from the PLY header, logging the reference 11-column CSV.

    python -m raht3dgs_tpu.cli.encode_dataset --dataset 8iVFBv2 \
        --sequence redandblack --data-root /data --frames 1 10
"""

from __future__ import annotations

import argparse
import sys

from raht3dgs_tpu.cli._common import (
    CsvLogger,
    add_runtime_args,
    configure_runtime,
    jnp_dtype,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, choices=("8iVFBv2", "MVUB"))
    p.add_argument("--sequence", required=True)
    p.add_argument("--data-root", default=".")
    p.add_argument(
        "--frames", type=int, nargs=2, metavar=("FIRST", "LAST"), default=None,
        help="1-based inclusive frame range (default: whole sequence)",
    )
    p.add_argument(
        "--steps", type=float, nargs="+",
        default=[1, 2, 4, 6, 8, 12, 16, 20, 24, 32, 64],
    )
    p.add_argument("--no-decode", action="store_true")
    add_runtime_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    configure_runtime(args)

    from raht3dgs_tpu.io.datasets import get_pointcloud, get_pointcloud_n_frames
    from raht3dgs_tpu.models.color_codec import CSV_HEADER, encode_color_frame
    from raht3dgs_tpu.models.pipeline import AttributeCodec

    n_frames = get_pointcloud_n_frames(args.dataset, args.sequence)
    if n_frames is None:
        return 1
    first, last = args.frames or (1, n_frames)

    log = CsvLogger(args.csv or "results/runtime_dataset.csv", CSV_HEADER)
    dtype = jnp_dtype(args.dtype)
    codec_cache = {}

    for frame in range(first, last + 1):
        out = get_pointcloud(args.dataset, args.sequence, frame, args.data_root)
        if out is None:
            print(f"frame {frame}: load failed, skipping", file=sys.stderr)
            continue
        V, C, depth = out
        codec = codec_cache.setdefault(depth, AttributeCodec(depth, dtype=dtype))
        for pt in encode_color_frame(
            V, C, depth=depth, steps=args.steps, frame_index=frame,
            codec=codec, bucket=args.bucket, dtype=dtype,
            decode=not args.no_decode,
        ):
            log.row(pt.csv_row())
        print(f"frame {frame} done")
    log.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
