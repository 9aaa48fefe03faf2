"""Single/multi-PLY color codec driver (reference: python/encode_ply.py).

Full encode -> decode -> Y-PSNR/bpp over a quantization-step sweep, with the
reference's 11-column CSV schema. Example:

    python -m raht3dgs_tpu.cli.encode_ply --input frame.ply --depth 18 \
        --steps 1 2 4 8 16 --csv results/runtime_ply.csv
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from raht3dgs_tpu.cli._common import (
    CsvLogger,
    add_geometry_arg,
    add_quant_args,
    add_runtime_args,
    configure_runtime,
    jnp_dtype,
    maybe_profile,
    quant_kwargs,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", nargs="+", required=True, help="PLY file(s)")
    p.add_argument(
        "--depth", type=int, default=None,
        help="octree depth J (default: from the PLY 'comment width' header, "
        "else 18 — the reference default)",
    )
    from raht3dgs_tpu.config import ColorCodecConfig

    p.add_argument(
        "--steps", type=float, nargs="+",
        default=list(ColorCodecConfig.steps),
        help="quantization step sweep (reference grid)",
    )
    p.add_argument(
        "--no-decode", action="store_true",
        help="skip the decode half (coefficient-domain PSNR only)",
    )
    p.add_argument(
        "--target-bpp", type=float, default=None,
        help="instead of a step sweep, search the quantization step hitting "
        "this rate budget (device-side rate model + refinement)",
    )
    p.add_argument(
        "--voxelize", action="store_true",
        help="voxelize raw float positions first (merging duplicate voxels "
        "by attribute mean); without this, inputs must already be unique "
        "voxel-grid positions (the reference drivers' contract)",
    )
    p.add_argument(
        "--save-streams", default=None,
        help="directory to write .r3tc frame bitstreams",
    )
    p.add_argument(
        "--entropy-chunk", type=int, default=0,
        help="entropy-code each channel in independent chunks of this many "
        "symbols (parallel encode/decode on multi-core hosts; 0 = "
        "sequential reference-compatible streams)",
    )
    p.add_argument(
        "--tiles", type=int, default=0, metavar="D",
        help="partition the frame into octree bricks at depth D and write "
        "a tiled .r3tt stream (spatial random access: decode only the "
        "bricks intersecting a --roi box, models/tiling.py). Requires "
        "--save-streams and exactly one --steps value; composes with "
        "--code-geometry (self-contained tiles) and --entropy. Rate "
        "overhead measured in docs/rd_tiling.md",
    )
    add_geometry_arg(p)
    add_quant_args(p)
    add_runtime_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    configure_runtime(args)

    from raht3dgs_tpu.io.ply import read_ply_8i
    from raht3dgs_tpu.models.color_codec import (
        CSV_HEADER,
        DEFAULT_DEPTH,
        encode_color_frame,
    )
    from raht3dgs_tpu.models.pipeline import AttributeCodec

    log = CsvLogger(args.csv or "results/runtime_ply.csv", CSV_HEADER)
    dtype = jnp_dtype(args.dtype)
    codec_cache = {}

    # context managers (not open-coded enter/exit): the trace and the CSV
    # must finalize even when a frame raises mid-sweep
    import contextlib

    with maybe_profile(args), contextlib.closing(log):
        _sweep(args, log, dtype, codec_cache)
    return 0


def _encode_tiled(args, idx, path, V, C, depth, codec, log) -> None:
    """--tiles: write one .r3tt tiled frame (+ CSV row with the usual
    bpp/PSNR columns measured through a full tiled decode)."""
    import time as _time
    from pathlib import Path

    import jax.numpy as jnp
    import numpy as np

    from raht3dgs_tpu.models.color_codec import RDPoint, y_psnr_db
    from raht3dgs_tpu.models.tiling import encode_tiled_frame, decode_tiled_frame
    from raht3dgs_tpu.ops.color import rgb_to_yuv
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    if not args.save_streams:
        raise SystemExit("--tiles writes a .r3tt stream; pass --save-streams")
    if len(args.steps) != 1:
        raise SystemExit("--tiles requires exactly one --steps value")
    step = args.steps[0]
    t0 = _time.perf_counter()
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(np.asarray(C)), dtype=codec.dtype))
    Vi = np.floor(np.asarray(V)).astype(np.int64)
    blob, stats = encode_tiled_frame(
        Vi, yuv, depth, args.tiles, codec, step,
        code_geometry=bool(args.code_geometry),
    )
    enc_s = _time.perf_counter() - t0
    out = Path(args.save_streams)
    out.mkdir(parents=True, exist_ok=True)
    dst = out / (Path(path).stem + f"_tiled{args.tiles}.r3tt")
    dst.write_bytes(blob)
    n = len(Vi)
    psnr = float("nan")
    if not args.no_decode:
        Vd, Ad = decode_tiled_frame(
            blob, positions=None if args.code_geometry else Vi,
            dtype=codec.dtype,
        )
        order = np.argsort(morton_codes_np(Vi, depth), kind="stable")
        psnr = y_psnr_db(yuv[order][:, 0], Ad[:, 0])
    print(
        f"frame {idx}: {len(stats)} tiles (brick depth {args.tiles}), "
        f"{len(blob)} B = {8 * len(blob) / n:.4f} bpp, Y-PSNR {psnr:.2f} "
        f"dB -> {dst}"
    )
    log.row(RDPoint(
        frame=idx, step=float(step), bpp=8 * len(blob) / n, psnr=psnr,
        n_voxels=n, stream_bytes=len(blob),
        times={"Entropy_enc_time": enc_s},
    ).csv_row())


def _sweep(args, log, dtype, codec_cache) -> None:
    from raht3dgs_tpu.io.ply import read_ply_8i
    from raht3dgs_tpu.models.color_codec import DEFAULT_DEPTH, encode_color_frame
    from raht3dgs_tpu.models.pipeline import AttributeCodec

    for idx, path in enumerate(args.input, start=1):
        V, C, header_depth = read_ply_8i(path)
        depth = args.depth or header_depth or DEFAULT_DEPTH
        if args.voxelize:
            import jax.numpy as jnp
            import numpy as np

            from raht3dgs_tpu.ops.voxelize import voxelize

            res = voxelize(
                jnp.asarray(np.concatenate([V, C], axis=1), dtype=dtype), depth
            )
            nvox = int(res.nvox)
            V = np.asarray(res.positions)[:nvox].astype(float)
            C = np.asarray(res.attributes)[:nvox]
            print(f"frame {idx}: voxelized to {nvox} voxels")
        codec = codec_cache.setdefault(
            depth, AttributeCodec(depth, dtype=dtype,
                                  chunk=args.entropy_chunk,
                                  **quant_kwargs(args))
        )
        if args.tiles:
            _encode_tiled(args, idx, path, V, C, depth, codec, log)
            continue
        if args.target_bpp is not None:
            import jax.numpy as _jnp
            import numpy as np

            from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
            from raht3dgs_tpu.models.rd_search import search_step_for_bpp
            from raht3dgs_tpu.ops.color import rgb_to_yuv

            yuv = np.asarray(rgb_to_yuv(_jnp.asarray(np.asarray(C)), dtype=dtype))
            frame = prepare_voxel_frame(
                np.floor(np.asarray(V)).astype(np.int64), yuv, depth,
                bucket=args.bucket, dtype=dtype,
            )
            res = search_step_for_bpp(frame, args.target_bpp, codec=codec)
            print(
                f"frame {idx}: target {args.target_bpp:.3f} bpp -> step "
                f"{res.step:.4f}, actual {res.bpp:.3f} bpp "
                f"({res.probes} device probes)"
            )
            if args.save_streams:
                from pathlib import Path

                out = Path(args.save_streams)
                out.mkdir(parents=True, exist_ok=True)
                if args.code_geometry:
                    from raht3dgs_tpu.codec.geometry import (
                        geometry_from_positions,
                    )

                    s = res.encoded.stream
                    s.geometry = geometry_from_positions(V, depth)
                    print(f"frame {idx}: geometry {s.geometry_bpp():.3f} "
                          "bits/voxel (lossless)")
                dest = out / f"frame{idx:04d}_bpp{args.target_bpp:g}.r3tc"
                dest.write_bytes(res.encoded.stream.to_bytes())
                print(f"frame {idx}: stream -> {dest}")
            continue
        points = encode_color_frame(
            V, C, depth=depth, steps=args.steps, frame_index=idx,
            codec=codec, bucket=args.bucket, dtype=dtype,
            decode=not args.no_decode, keep_streams=bool(args.save_streams),
        )
        geom = None
        if args.code_geometry and args.save_streams:
            from raht3dgs_tpu.codec.geometry import geometry_from_positions

            # one geometry section per frame, shared across the step sweep
            geom = geometry_from_positions(V, depth)
            print(f"frame {idx}: geometry {len(geom) * 8.0 / len(V):.3f} "
                  "bits/voxel (lossless)")
        for pt in points:
            log.row(pt.csv_row())
            print(
                f"frame {idx} step {pt.step:g}: {pt.bpp:.4f} bpp, "
                f"Y-PSNR {pt.psnr:.2f} dB ({pt.n_voxels} voxels)"
            )
            if args.save_streams and pt.encoded is not None:
                from pathlib import Path

                out = Path(args.save_streams)
                out.mkdir(parents=True, exist_ok=True)
                if geom is not None:
                    pt.encoded.stream.geometry = geom
                fn = out / f"frame{idx:04d}_step{pt.step:g}.r3tc"
                fn.write_bytes(pt.encoded.stream.to_bytes())


if __name__ == "__main__":
    sys.exit(main())
