"""3DGS 56-channel codec driver (reference: python/encode_3dgs.py).

Reads a voxelized-3DGS PLY (from voxelize_3dgs), runs the RD sweep over all
56 attribute channels, logs the reference 19-column CSV, and optionally
renders the reconstruction for a debug comparison.

    python -m raht3dgs_tpu.cli.encode_3dgs \
        --input output_compressed/compressed_Nvox_gaussians.ply --depth 10
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
    p.add_argument("--input", required=True, help="voxelized 3DGS PLY")
    from raht3dgs_tpu.config import GsCodecConfig

    p.add_argument("--depth", type=int, default=GsCodecConfig.depth)
    p.add_argument(
        "--steps", type=float, nargs="+",
        default=list(GsCodecConfig.steps),
    )
    p.add_argument(
        "--per-attribute", action="store_true",
        help="importance-weighted per-attribute-group quantization "
        "(encode_3dgs_debug strategy)",
    )
    p.add_argument(
        "--render", choices=("auto", "gsplat", "jax", "preview", "none"),
        default="none", help="debug render comparison of the reconstruction",
    )
    p.add_argument("--save-streams", default=None)
    p.add_argument(
        "--entropy-chunk", type=int, default=0,
        help="entropy-code each of the 56 channels in independent chunks "
        "(parallel encode/decode on multi-core hosts; 0 = sequential)",
    )
    p.add_argument(
        "--target-bpp", type=float, default=None,
        help="search the step hitting this rate budget instead of sweeping "
        "--steps (honors --per-attribute multipliers)",
    )
    p.add_argument(
        "--tiles", type=int, default=0, metavar="D",
        help="write ONE spatially tiled .r3tt frame at this brick depth "
        "instead of monolithic streams (needs --save-streams and exactly "
        "one --steps value). Composes with --per-attribute, "
        "--code-geometry and --entropy; decode bricks with cli.decode "
        "--roi, or the whole frame with --color-space 3dgs for a "
        "renderable PLY",
    )
    add_geometry_arg(p)
    add_quant_args(p)
    add_runtime_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    configure_runtime(args)
    with maybe_profile(args):
        return _run(args)


def _encode_tiled_gs(args, V_int, attrs, voxel_size, vmin, group_scales,
                     dtype) -> int:
    """--tiles: one 56-channel .r3tt tiled frame (+ the usual 19-col CSV
    row), spatial random access on the 3DGS workload — decode a brick
    subset with ``cli.decode --roi`` or the full frame straight to a
    renderable PLY with ``--color-space 3dgs`` (the world mapping rides
    the shared header template: width = voxel_size * 2**J, true vmin)."""
    import time as _time
    from pathlib import Path

    from raht3dgs_tpu.eval.metrics import gs_group_psnr
    from raht3dgs_tpu.models.gs_codec import CSV_HEADER, GsRDPoint
    from raht3dgs_tpu.models.pipeline import AttributeCodec
    from raht3dgs_tpu.models.tiling import (
        decode_tiled_frame,
        encode_tiled_frame,
    )
    from raht3dgs_tpu.ops.prelude import morton_codes_np
    from raht3dgs_tpu.ops.quantize import channel_steps

    if not args.save_streams:
        raise SystemExit("--tiles writes a .r3tt stream; pass --save-streams")
    if len(args.steps) != 1:
        raise SystemExit("--tiles requires exactly one --steps value")
    step = float(args.steps[0])
    D = attrs.shape[1]
    step_vec = (
        channel_steps(D, step,
                      {k: step * m for k, m in group_scales.items()})
        if group_scales else step
    )
    codec = AttributeCodec(args.depth, dtype=dtype,
                           chunk=args.entropy_chunk, **quant_kwargs(args))
    t0 = _time.perf_counter()
    blob, stats = encode_tiled_frame(
        V_int, attrs, args.depth, args.tiles, codec, step_vec,
        code_geometry=bool(args.code_geometry),
        vmin=vmin, width=float(voxel_size) * (1 << args.depth),
    )
    enc_s = _time.perf_counter() - t0
    out = Path(args.save_streams)
    out.mkdir(parents=True, exist_ok=True)
    dst = out / f"gs_tiled{args.tiles}_step{step:g}.r3tt"
    dst.write_bytes(blob)
    n = len(V_int)
    _, A = decode_tiled_frame(
        blob, positions=None if args.code_geometry else V_int,
        dtype=codec.dtype, bucket=args.bucket,
    )
    order = np.argsort(morton_codes_np(V_int, args.depth), kind="stable")
    psnr = gs_group_psnr(np.asarray(attrs, dtype=np.float64)[order], A)
    print(
        f"{len(stats)} tiles (brick depth {args.tiles}), {len(blob)} B = "
        f"{8 * len(blob) / n:.4f} bpp, PSNR all {psnr['psnr_all']:.2f} dB "
        f"(quats {psnr['psnr_quats']:.2f}, scales {psnr['psnr_scales']:.2f}, "
        f"opacity {psnr['psnr_opacity']:.2f}, colors "
        f"{psnr['psnr_colors']:.2f}) -> {dst}"
    )
    log = CsvLogger(args.csv or "results/runtime_3dgs.csv", CSV_HEADER)
    log.row(GsRDPoint(
        frame=1, step=step, bpp=8 * len(blob) / n, psnr=psnr,
        n_voxels=n, stream_bytes=len(blob),
        times={"Entropy_enc_time": enc_s},
    ).csv_row())
    log.close()
    return 0


def _run(args) -> int:
    from raht3dgs_tpu.io.ply import read_compressed_3dgs_ply
    from raht3dgs_tpu.models.gs_codec import CSV_HEADER, encode_gs_frame
    from raht3dgs_tpu.ops.quantize import GS_ABLATION_PSNR_DB

    V_int, attrs, voxel_size, vmin = read_compressed_3dgs_ply(args.input)
    print(f"loaded {len(V_int)} voxels, {attrs.shape[1]} channels "
          f"(voxel_size={voxel_size}, vmin={vmin})")

    group_scales = None
    if args.per_attribute:
        # importance ~ 1/ablation-PSNR: more impactful groups (quats) get
        # finer steps. Multiplier = imp_min / imp_group in (0, 1].
        imp = {k: 1.0 / v for k, v in GS_ABLATION_PSNR_DB.items()}
        imp_min = min(imp.values())
        group_scales = {k: imp_min / imp[k] for k in imp}
        print("per-attribute step multipliers:", group_scales)

    dtype = jnp_dtype(args.dtype)
    if args.tiles:
        if args.target_bpp is not None:
            raise SystemExit("--tiles and --target-bpp do not combine "
                             "(tile at the searched step in two runs)")
        return _encode_tiled_gs(
            args, V_int, attrs, voxel_size, vmin, group_scales, dtype)
    if args.target_bpp is not None:
        from raht3dgs_tpu.config import GsCodecConfig

        if tuple(args.steps) != tuple(GsCodecConfig.steps):
            print("note: --steps ignored in --target-bpp mode", file=sys.stderr)
        from raht3dgs_tpu.models.pipeline import prepare_voxel_frame, AttributeCodec
        from raht3dgs_tpu.models.rd_search import search_step_for_bpp
        from raht3dgs_tpu.ops.quantize import channel_steps

        frame = prepare_voxel_frame(
            V_int, attrs.astype(np.float64), args.depth,
            bucket=args.bucket, dtype=dtype,
            vmin=vmin, width=float(voxel_size) * (1 << args.depth),
        )
        codec = AttributeCodec(args.depth, dtype=dtype,
                               chunk=args.entropy_chunk,
                               **quant_kwargs(args))
        D = attrs.shape[1]

        def steps_fn(step):
            if group_scales:
                return channel_steps(
                    D, float(step),
                    {k: float(step) * m for k, m in group_scales.items()},
                )
            return float(step)

        res = search_step_for_bpp(
            frame, args.target_bpp, codec=codec, steps_fn=steps_fn
        )
        print(
            f"target {args.target_bpp:.3f} bpp -> step {res.step:.4f}, "
            f"actual {res.bpp:.3f} bpp ({res.probes} device probes)"
        )
        if args.save_streams:
            from pathlib import Path

            out = Path(args.save_streams)
            out.mkdir(parents=True, exist_ok=True)
            if args.code_geometry:
                from raht3dgs_tpu.codec.geometry import (
                    geometry_from_positions,
                )

                st = res.encoded.stream
                st.geometry = geometry_from_positions(V_int, args.depth)
                print(f"geometry {st.geometry_bpp():.3f} bits/voxel "
                      "(lossless)")
            dest = out / f"gs_bpp{args.target_bpp:g}.r3tc"
            dest.write_bytes(res.encoded.stream.to_bytes())
            print(f"stream -> {dest}")
        return 0
    from raht3dgs_tpu.models.pipeline import AttributeCodec as _AC

    codec = _AC(args.depth, dtype=dtype, chunk=args.entropy_chunk,
                **quant_kwargs(args))
    points = encode_gs_frame(
        V_int, attrs, depth=args.depth, steps=args.steps,
        group_step_scales=group_scales, bucket=args.bucket, dtype=dtype,
        keep_streams=bool(args.save_streams or args.render != "none"),
        codec=codec,
        vmin=vmin, width=float(voxel_size) * (1 << args.depth),
    )

    geom = None
    if args.code_geometry and args.save_streams:
        from raht3dgs_tpu.codec.geometry import geometry_from_positions

        geom = geometry_from_positions(V_int, args.depth)
        print(f"geometry {len(geom) * 8.0 / len(V_int):.3f} bits/voxel "
              "(lossless)")

    log = CsvLogger(args.csv or "results/runtime_3dgs.csv", CSV_HEADER)
    for pt in points:
        log.row(pt.csv_row())
        print(
            f"step {pt.step:g}: {pt.bpp:.4f} bpp | PSNR all "
            f"{pt.psnr['psnr_all']:.2f} dB (quats {pt.psnr['psnr_quats']:.2f}, "
            f"scales {pt.psnr['psnr_scales']:.2f}, opacity "
            f"{pt.psnr['psnr_opacity']:.2f}, colors {pt.psnr['psnr_colors']:.2f})"
        )
        if args.save_streams and pt.encoded is not None:
            from pathlib import Path

            out = Path(args.save_streams)
            out.mkdir(parents=True, exist_ok=True)
            if geom is not None:
                pt.encoded.stream.geometry = geom
            (out / f"gs_step{pt.step:g}.r3tc").write_bytes(
                pt.encoded.stream.to_bytes()
            )
    log.close()

    if args.render != "none":
        from raht3dgs_tpu.eval.render import render_comparison
        from raht3dgs_tpu.models.pipeline import prepare_voxel_frame

        # Reconstruct at the finest step and render against the input scene.
        finest = min(points, key=lambda p: p.step)
        frame = prepare_voxel_frame(V_int, attrs.astype(np.float64), args.depth,
                                    bucket=args.bucket, dtype=dtype)
        rec, _ = codec.decode(finest.encoded.stream, frame.codes, frame.weights)
        # voxel CENTERS — the reference's world mapping (encode_3dgs.py:323)
        world = (V_int.astype(np.float64) + 0.5) * voxel_size + vmin
        # decoded rows are in Morton-sorted order; re-sort the originals too
        from raht3dgs_tpu.ops.prelude import morton_codes_np

        sort = np.argsort(morton_codes_np(V_int, args.depth), kind="stable")
        original = {
            "means": world[sort],
            "quats": attrs[sort, 0:4],
            "scales": attrs[sort, 4:7],
            "opacities": attrs[sort, 7],
            "colors": attrs[sort, 8:],
        }
        recon = {
            "means": world[sort],
            "quats": rec[:, 0:4],
            "scales": np.abs(rec[:, 4:7]),
            "opacities": np.clip(rec[:, 7], 0, 1),
            "colors": rec[:, 8:],
        }
        m = render_comparison(original, recon, backend=args.render)
        if m:
            print(f"render PSNR ({m['backend']}): {m['psnr_avg']:.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
