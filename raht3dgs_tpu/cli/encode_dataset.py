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
    add_geometry_arg,
    CsvLogger,
    add_quant_args,
    add_runtime_args,
    configure_runtime,
    maybe_profile,
    jnp_dtype,
    quant_kwargs,
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
    from raht3dgs_tpu.config import ColorCodecConfig

    p.add_argument(
        "--steps", type=float, nargs="+",
        default=list(ColorCodecConfig.steps),
    )
    p.add_argument("--no-decode", action="store_true")
    p.add_argument(
        "--entropy-chunk", type=int, default=0,
        help="entropy-code each channel in independent chunks "
        "(parallel encode/decode on multi-core hosts; 0 = sequential)",
    )
    p.add_argument(
        "--save-sequence", default=None,
        help="write all frames to one indexed .r3ts sequence file "
        "(requires exactly one --steps value)",
    )
    p.add_argument(
        "--batch", type=int, default=0,
        help="encode this many frames per device dispatch (0 = frame loop); "
        "uses the batched codec, optionally sharded over all local devices",
    )
    p.add_argument(
        "--target-bpp", type=float, default=None,
        help="instead of a step sweep, search each frame's quantization "
        "step for this rate budget (device-side rate model + refinement, "
        "models/rd_search.py — constant-rate sequence encoding); "
        "composes with --save-sequence/--code-geometry and with --inter "
        "(each I/P candidate searches its own step; finer step wins at "
        "equal rate), not with --batch",
    )
    p.add_argument(
        "--cbr", action="store_true",
        help="with --target-bpp: sequence-global leaky-bucket allocation — "
        "carry each frame's unspent budget forward as credit (capped at "
        "--cbr-burst), recovering the per-frame search's systematic "
        "underspend while keeping the one-sided streaming guarantee "
        "(cumulative spend <= n*target at every prefix; "
        "models/rate_control.py)",
    )
    p.add_argument(
        "--cbr-burst", type=float, default=None,
        help="with --cbr: bucket depth in bpp — the maximum credit carried "
        "across frames = the decoder buffer a fixed-rate channel needs "
        "(default: one frame's budget)",
    )
    p.add_argument(
        "--cbr-gop", type=int, default=0,
        help="with --cbr: reset the carried credit every K frames — "
        "per-GOP budgets, so a receiver joining at any GOP boundary "
        "streams within rate without history (each GOP independently "
        "satisfies the prefix invariant). With --inter, align K with "
        "--gop so budget segments match random-access segments",
    )
    p.add_argument(
        "--two-pass", action="store_true",
        help="with --target-bpp: constant-QUALITY sequence allocation — "
        "pass 1 sums the device rate model over all frames, pass 2 "
        "true-encodes the sequence at ONE shared step, the finest whose "
        "total rate fits sum(n)*target (capped-VBR: the guarantee is "
        "whole-sequence, not per-prefix; hard frames get the bits easy "
        "frames leave; models/rd_search.py:search_global_step_for_bpp). "
        "Holds the sequence's frames in memory; not with --cbr/--inter",
    )
    p.add_argument(
        "--tiles", type=int, default=0, metavar="D",
        help="write each frame as a TILED .r3tt blob inside the .r3ts "
        "sequence (octree bricks at depth D; spatial random access — "
        "decode any frame's --roi box from only the intersecting "
        "bricks). Requires --save-sequence and one --steps value; "
        "implies --code-geometry per brick; intra frames only "
        "(not with --inter/--batch/--target-bpp)",
    )
    p.add_argument(
        "--inter", action="store_true",
        help="temporal I/P coding: predict each frame from the previous "
        "reconstruction and code the residual (closed loop, adaptive "
        "per-frame intra fallback; requires exactly one --steps value; "
        "beyond-reference feature, see docs/rd_temporal.md)",
    )
    p.add_argument(
        "--gop", type=int, default=16,
        help="with --inter: force an intra frame every GOP frames",
    )
    p.add_argument(
        "--search-stride", type=int, default=None,
        help="with --inter: encoder-side motion-search witness sampling "
        "stride (default: size-adaptive — exact below 65536 voxels, 4 "
        "above it, where stride 4 measures 2.5x faster search on v5e at "
        "500k for ~0.06%% BD-rate; stream-compatible — the field is "
        "signalled; 1 = exact everywhere)",
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


def _run(args) -> int:

    from raht3dgs_tpu.io.datasets import get_pointcloud, get_pointcloud_n_frames
    from raht3dgs_tpu.models.color_codec import CSV_HEADER, encode_color_frame
    from raht3dgs_tpu.models.pipeline import AttributeCodec

    n_frames = get_pointcloud_n_frames(args.dataset, args.sequence)
    if n_frames is None:
        return 1
    first, last = args.frames or (1, n_frames)
    if (args.save_sequence and args.target_bpp is None
            and len(args.steps) != 1):
        print("--save-sequence requires exactly one --steps value",
              file=sys.stderr)
        return 2

    log = CsvLogger(args.csv or "results/runtime_dataset.csv", CSV_HEADER)
    dtype = jnp_dtype(args.dtype)
    codec_cache = {}

    if (args.cbr or args.cbr_burst is not None
            or args.cbr_gop) and args.target_bpp is None:
        print("--cbr is a rate-control mode; it requires --target-bpp",
              file=sys.stderr)
        return 2
    if args.tiles:
        if not args.save_sequence or len(args.steps) != 1:
            print("--tiles needs --save-sequence and exactly one --steps "
                  "value", file=sys.stderr)
            return 2
        if args.inter or args.batch or args.target_bpp is not None:
            print("--tiles is intra-only for now (not with --inter/"
                  "--batch/--target-bpp)", file=sys.stderr)
            return 2
        return _run_tiled(args, first, last, log, dtype)
    if args.two_pass:
        if args.target_bpp is None:
            print("--two-pass is a rate-control mode; it requires "
                  "--target-bpp", file=sys.stderr)
            return 2
        if args.cbr or args.cbr_burst is not None or args.inter or args.batch:
            print("--two-pass allocates the whole sequence at once; it "
                  "composes with --save-sequence/--code-geometry but not "
                  "with --cbr/--inter/--batch", file=sys.stderr)
            return 2
        return _run_two_pass(args, first, last, log, dtype)
    if args.target_bpp is not None:
        if args.batch:
            print("--target-bpp composes with the frame loop or --inter "
                  "(drop --batch)", file=sys.stderr)
            return 2
        if args.inter:
            return _run_inter(args, first, last, log, dtype)
        return _run_target(args, first, last, log, dtype)
    if args.inter:
        if len(args.steps) != 1:
            print("--inter requires exactly one --steps value",
                  file=sys.stderr)
            return 2
        if args.batch:
            print("--inter is sequential by nature; drop --batch",
                  file=sys.stderr)
            return 2
        return _run_inter(args, first, last, log, dtype)
    if args.batch > 0:
        return _run_batched(args, first, last, log, dtype)

    seq_streams = []
    for frame in range(first, last + 1):
        out = get_pointcloud(args.dataset, args.sequence, frame, args.data_root)
        if out is None:
            print(f"frame {frame}: load failed, skipping", file=sys.stderr)
            continue
        V, C, depth = out
        codec = codec_cache.setdefault(
            depth, AttributeCodec(depth, dtype=dtype,
                                  chunk=args.entropy_chunk,
                                  **quant_kwargs(args))
        )
        geom = None
        if args.code_geometry and args.save_sequence:
            from raht3dgs_tpu.codec.geometry import geometry_from_positions

            # intra geometry per frame: all-intra sequences keep the .r3ts
            # random-access promise (any frame decodes standalone). The
            # temporal geometry profile rides only --inter P-frames, which
            # already require sequential decode.
            geom = geometry_from_positions(V, depth)
        for pt in encode_color_frame(
            V, C, depth=depth, steps=args.steps, frame_index=frame,
            codec=codec, bucket=args.bucket, dtype=dtype,
            decode=not args.no_decode,
            keep_streams=bool(args.save_sequence),
        ):
            log.row(pt.csv_row())
            if args.save_sequence and pt.encoded is not None:
                if geom is not None:
                    pt.encoded.stream.geometry = geom
                seq_streams.append(pt.encoded.stream)
        print(f"frame {frame} done")
    log.close()
    if args.save_sequence:
        from raht3dgs_tpu.codec.bitstream import write_sequence

        total = write_sequence(args.save_sequence, seq_streams)
        print(f"sequence: {len(seq_streams)} frames, {total} bytes "
              f"-> {args.save_sequence}")
    return 0


def _make_controller(args):
    """The sequence-global allocator for --cbr, else None (independent
    per-frame budgets)."""
    if not (args.cbr or args.cbr_burst is not None
            or getattr(args, "cbr_gop", 0)):
        return None
    from raht3dgs_tpu.models.rate_control import RateController

    return RateController(args.target_bpp, burst=args.cbr_burst)


def _run_target(args, first, last, log, dtype) -> int:
    """Constant-rate sequence encoding: search each frame's quantization
    step for the --target-bpp budget (device-side RLGR rate model +
    true-encode refinement), log one CSV row per frame, optionally write
    the .r3ts. Beyond-reference: the reference has no rate control."""
    import time as _time

    import jax.numpy as jnp
    import numpy as np

    from raht3dgs_tpu.io.datasets import get_pointcloud
    from raht3dgs_tpu.models.color_codec import RDPoint, y_psnr_db
    from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
    from raht3dgs_tpu.models.rd_search import search_step_for_bpp
    from raht3dgs_tpu.ops.color import rgb_to_yuv

    codec_cache = {}
    seq_streams = []
    rc = _make_controller(args)
    for frame_idx in range(first, last + 1):
        out = get_pointcloud(args.dataset, args.sequence, frame_idx,
                             args.data_root)
        if out is None:
            print(f"frame {frame_idx}: load failed, skipping",
                  file=sys.stderr)
            continue
        V, C, depth = out
        codec = codec_cache.setdefault(
            depth, AttributeCodec(depth, dtype=dtype,
                                  chunk=args.entropy_chunk,
                                  **quant_kwargs(args))
        )
        t0 = _time.perf_counter()
        yuv = np.asarray(rgb_to_yuv(jnp.asarray(np.asarray(C)), dtype=dtype))
        fr = prepare_voxel_frame(
            np.floor(np.asarray(V)).astype(np.int64), yuv, depth,
            bucket=args.bucket, dtype=dtype,
        )
        if rc is not None and args.cbr_gop > 0 and (
                (frame_idx - first) % args.cbr_gop == 0):
            rc.reset_credit()
        budget = rc.frame_budget() if rc is not None else args.target_bpp
        res = search_step_for_bpp(fr, budget, codec=codec)
        if rc is not None:
            rc.update(res.bpp)
        search_s = _time.perf_counter() - t0
        rec, _ = codec.decode(res.encoded.stream, fr.codes, fr.weights)
        psnr = y_psnr_db(
            np.asarray(fr.attributes)[: fr.n_voxels, 0], rec[:, 0]
        )
        cbr = (f", cum {rc.mean_bpp:.4f}, credit {rc.credit:.4f}"
               if rc is not None else "")
        print(
            f"frame {frame_idx}: budget {budget:.3f} bpp -> "
            f"step {res.step:.4f}, actual {res.bpp:.4f} bpp{cbr}, Y-PSNR "
            f"{psnr:.2f} dB ({res.probes} device probes, {search_s:.2f}s)"
        )
        log.row(RDPoint(
            frame=frame_idx, step=float(res.step), bpp=res.bpp, psnr=psnr,
            n_voxels=fr.n_voxels,
            stream_bytes=res.encoded.stream.payload_bytes,
            times={"Quant_time": search_s},
        ).csv_row())
        if args.save_sequence:
            s = res.encoded.stream
            if args.code_geometry:
                from raht3dgs_tpu.codec.geometry import (
                    geometry_from_positions,
                )

                s.geometry = geometry_from_positions(V, depth)
            seq_streams.append(s)
    log.close()
    if args.save_sequence:
        from raht3dgs_tpu.codec.bitstream import write_sequence

        total = write_sequence(args.save_sequence, seq_streams)
        print(f"sequence: {len(seq_streams)} frames, {total} bytes "
              f"-> {args.save_sequence}")
    return 0


def _run_tiled(args, first, last, log, dtype) -> int:
    """Tiled intra sequence: one .r3tt blob per frame inside the .r3ts
    (every frame then supports decode --roi spatial random access)."""
    import time as _time

    import jax.numpy as jnp
    import numpy as np

    from raht3dgs_tpu.io.datasets import get_pointcloud
    from raht3dgs_tpu.models.color_codec import RDPoint, y_psnr_db
    from raht3dgs_tpu.models.pipeline import AttributeCodec
    from raht3dgs_tpu.models.tiling import (
        decode_tiled_frame,
        encode_tiled_frame,
    )
    from raht3dgs_tpu.ops.color import rgb_to_yuv
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    step = args.steps[0]
    codec_cache = {}
    blobs = []
    for frame_idx in range(first, last + 1):
        out = get_pointcloud(args.dataset, args.sequence, frame_idx,
                             args.data_root)
        if out is None:
            print(f"frame {frame_idx}: load failed, skipping",
                  file=sys.stderr)
            continue
        V, C, depth = out
        if not 0 < args.tiles < depth:
            print(f"--tiles must be in (0, {depth}) for this sequence's "
                  f"depth", file=sys.stderr)
            return 2
        codec = codec_cache.setdefault(
            depth, AttributeCodec(depth, dtype=dtype,
                                  chunk=args.entropy_chunk,
                                  **quant_kwargs(args))
        )
        t0 = _time.perf_counter()
        Vi = np.floor(np.asarray(V)).astype(np.int64)
        yuv = np.asarray(rgb_to_yuv(jnp.asarray(np.asarray(C)),
                                    dtype=dtype))
        blob, stats = encode_tiled_frame(
            Vi, yuv, depth, args.tiles, codec, step, code_geometry=True,
        )
        enc_s = _time.perf_counter() - t0
        psnr = float("nan")
        if not args.no_decode:
            _, Ad = decode_tiled_frame(blob, dtype=dtype)
            order = np.argsort(morton_codes_np(Vi, depth), kind="stable")
            psnr = y_psnr_db(yuv[order][:, 0], Ad[:, 0])
        n = len(Vi)
        print(f"frame {frame_idx}: {len(stats)} tiles, {len(blob)} B = "
              f"{8 * len(blob) / n:.4f} bpp, Y-PSNR {psnr:.2f} dB")
        log.row(RDPoint(
            frame=frame_idx, step=float(step), bpp=8 * len(blob) / n,
            psnr=psnr, n_voxels=n, stream_bytes=len(blob),
            times={"Entropy_enc_time": enc_s},
        ).csv_row())
        blobs.append(blob)
    log.close()
    from raht3dgs_tpu.codec.bitstream import write_sequence

    total = write_sequence(args.save_sequence, blobs)
    print(f"sequence: {len(blobs)} tiled frames, {total} bytes "
          f"-> {args.save_sequence}")
    return 0


def _run_two_pass(args, first, last, log, dtype) -> int:
    """Constant-quality sequence allocation under a total-rate cap: one
    shared step for every frame (models/rd_search.py:
    search_global_step_for_bpp). Loads and prepares the whole range
    first — the allocator needs every frame's rate curve before the
    first byte is spent."""
    import time as _time

    import jax.numpy as jnp
    import numpy as np

    from raht3dgs_tpu.io.datasets import get_pointcloud
    from raht3dgs_tpu.models.color_codec import RDPoint, y_psnr_db
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.models.rd_search import search_global_step_for_bpp
    from raht3dgs_tpu.ops.color import rgb_to_yuv

    t0 = _time.perf_counter()
    frames, metas = [], []
    for frame_idx in range(first, last + 1):
        out = get_pointcloud(args.dataset, args.sequence, frame_idx,
                             args.data_root)
        if out is None:
            print(f"frame {frame_idx}: load failed, skipping",
                  file=sys.stderr)
            continue
        V, C, depth = out
        yuv = np.asarray(rgb_to_yuv(jnp.asarray(np.asarray(C)), dtype=dtype))
        frames.append(prepare_voxel_frame(
            np.floor(np.asarray(V)).astype(np.int64), yuv, depth,
            bucket=args.bucket, dtype=dtype,
        ))
        metas.append((frame_idx, V, depth))
    if not frames:
        print("no frames loaded", file=sys.stderr)
        return 1
    depths = {d for _, _, d in metas}
    if len(depths) > 1:
        print(f"--two-pass needs one octree depth across the range, got "
              f"{sorted(depths)} (encode per-depth subranges, or use the "
              "per-frame --target-bpp search)", file=sys.stderr)
        return 2
    depth = metas[0][2]
    codec = AttributeCodec(depth, dtype=dtype, chunk=args.entropy_chunk,
                           **quant_kwargs(args))
    res = search_global_step_for_bpp(frames, args.target_bpp, codec=codec)
    search_s = _time.perf_counter() - t0
    print(f"two-pass: step {res.step:.4f} for {len(frames)} frames, "
          f"sequence {res.total_bpp:.4f} bpp vs target "
          f"{args.target_bpp:.3f} ({res.probes} device probes, "
          f"{search_s:.2f}s)")
    seq_streams = []
    for (frame_idx, V, _), fr, enc in zip(metas, frames, res.encoded):
        rec, _ = codec.decode(enc.stream, fr.codes, fr.weights)
        psnr = y_psnr_db(
            np.asarray(fr.attributes)[: fr.n_voxels, 0], rec[:, 0]
        )
        print(f"frame {frame_idx}: {enc.stream.bpp():.4f} bpp, Y-PSNR "
              f"{psnr:.2f} dB")
        log.row(RDPoint(
            frame=frame_idx, step=float(res.step), bpp=enc.stream.bpp(),
            psnr=psnr, n_voxels=fr.n_voxels,
            stream_bytes=enc.stream.payload_bytes,
            times={"Quant_time": search_s / len(frames)},
        ).csv_row())
        if args.save_sequence:
            s = enc.stream
            if args.code_geometry:
                from raht3dgs_tpu.codec.geometry import (
                    geometry_from_positions,
                )

                s.geometry = geometry_from_positions(V, depth)
            seq_streams.append(s)
    log.close()
    if args.save_sequence:
        from raht3dgs_tpu.codec.bitstream import write_sequence

        total = write_sequence(args.save_sequence, seq_streams)
        print(f"sequence: {len(seq_streams)} frames, {total} bytes "
              f"-> {args.save_sequence}")
    return 0


def _run_inter(args, first, last, log, dtype) -> int:
    """Temporal I/P path: stream frames through SequenceCodec's
    incremental API (closed-loop state carried across frames); CSV rows
    keep the reference 11-column schema, PSNR from the decoder-exact
    reconstructions."""
    import numpy as np

    from raht3dgs_tpu.io.datasets import get_pointcloud
    from raht3dgs_tpu.models.color_codec import RDPoint, y_psnr_db
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.models.temporal import SequenceCodec
    from raht3dgs_tpu.ops.color import rgb_to_yuv
    from raht3dgs_tpu.utils.timing import StageTimer

    import jax.numpy as jnp

    step = args.steps[0] if args.target_bpp is None else None
    rc = _make_controller(args) if args.target_bpp is not None else None
    codecs = {}
    seq_streams = []
    geom_prev = (None, None)  # (codes, depth) of the last saved frame
    n_inter = 0
    n_done = 0
    prev_depth = None
    for frame_idx in range(first, last + 1):
        out = get_pointcloud(args.dataset, args.sequence, frame_idx,
                             args.data_root)
        if out is None:
            print(f"frame {frame_idx}: load failed, skipping",
                  file=sys.stderr)
            continue
        V, C, depth = out
        if depth not in codecs:  # setdefault would build+discard per frame
            codecs[depth] = SequenceCodec(
                depth, gop=args.gop, chunk=args.entropy_chunk,
                dtype=dtype, search_stride=args.search_stride,
                **quant_kwargs(args),
            )
        sc = codecs[depth]
        # predictions chain only across CONSECUTIVE same-depth frames —
        # the decoder (cli/decode.py) applies the identical rule, so a
        # depth change breaks the chain on both sides
        if prev_depth != depth:
            sc.reset()
        prev_depth = depth
        yuv = np.asarray(rgb_to_yuv(jnp.asarray(np.asarray(C)),
                                    dtype=dtype))
        frame = prepare_voxel_frame(
            np.floor(np.asarray(V)).astype(np.int64), yuv, depth,
            bucket=args.bucket, dtype=dtype,
        )
        timer = StageTimer()
        if args.target_bpp is not None:
            if rc is not None and args.cbr_gop > 0 and (
                    (frame_idx - first) % args.cbr_gop == 0):
                rc.reset_credit()
            budget = (rc.frame_budget() if rc is not None
                      else args.target_bpp)
            stream, rec, used_step = sc.encode_frame_target(
                frame, budget, timer=timer
            )
            if rc is not None:
                rc.update(stream.bpp())
        else:
            stream, rec = sc.encode_frame(frame, step, timer=timer)
            used_step = step
        n_inter += bool(stream.inter)
        n_done += 1
        psnr = y_psnr_db(
            np.asarray(frame.attributes)[: frame.n_voxels, 0], rec[:, 0]
        )
        pt = RDPoint(
            frame=frame_idx, step=float(used_step),
            bpp=stream.bpp(), psnr=psnr, n_voxels=frame.n_voxels,
            stream_bytes=stream.payload_bytes, times=timer.stages,
        )
        log.row(pt.csv_row())
        kind = "P" if stream.inter else "I"
        cbr = (f", cum {rc.mean_bpp:.4f}, credit {rc.credit:.4f}"
               if rc is not None else "")
        print(f"frame {frame_idx} [{kind}] step {used_step:g}: "
              f"{pt.bpp:.4f} bpp{cbr}, Y-PSNR {psnr:.2f} dB "
              f"({frame.n_voxels} voxels)")
        if args.save_sequence:
            if args.code_geometry:
                from raht3dgs_tpu.codec.geometry import encode_geometry

                # temporal geometry rides P-frames only (they already
                # require sequential decode); I-frames reset the chain so
                # random access survives at every GOP boundary. The
                # attribute stream's signalled global motion compensates
                # the reference (geometry profile 2).
                from raht3dgs_tpu.models.temporal import (
                    signalled_global_motion,
                )

                # the frame's padded codes already hold the sorted unique
                # Morton codes — no need to recompute them from positions
                cur_codes = np.asarray(frame.codes[: frame.n_voxels])
                use_prev = stream.inter and geom_prev[1] == depth
                stream.geometry = encode_geometry(
                    cur_codes, depth,
                    prev_codes=geom_prev[0] if use_prev else None,
                    motion=signalled_global_motion(stream)
                    if use_prev else None,
                )
                geom_prev = (cur_codes, depth)
            seq_streams.append(stream)
    log.close()
    print(f"inter frames: {n_inter}/{n_done}")
    if args.save_sequence:
        from raht3dgs_tpu.codec.bitstream import write_sequence

        total = write_sequence(args.save_sequence, seq_streams)
        print(f"sequence: {len(seq_streams)} frames, {total} bytes "
              f"-> {args.save_sequence}")
    return 0


def _run_batched(args, first, last, log, dtype) -> int:
    """Batched path: B frames per device dispatch (one jitted program),
    sharded over the local device mesh when more than one device exists."""
    import numpy as np

    from raht3dgs_tpu.io.datasets import get_pointcloud
    from raht3dgs_tpu.models.batch_codec import (
        BatchAttributeCodec,
        prepare_frame_batch,
    )
    from raht3dgs_tpu.models.color_codec import RDPoint, y_psnr_db
    from raht3dgs_tpu.ops.color import rgb_to_yuv
    from raht3dgs_tpu.parallel.sharding import make_mesh
    import jax
    import jax.numpy as jnp

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, dp=n_dev, tp=1) if n_dev > 1 else None

    frames_idx = list(range(first, last + 1))
    seq_streams = []
    codec_cache = {}
    for chunk_start in range(0, len(frames_idx), args.batch):
        chunk = frames_idx[chunk_start : chunk_start + args.batch]
        loaded = []
        for fr in chunk:
            out = get_pointcloud(args.dataset, args.sequence, fr, args.data_root)
            if out is None:
                print(f"frame {fr}: load failed, skipping", file=sys.stderr)
            else:
                loaded.append((fr, out))
        if not loaded:
            continue
        # per-frame depth comes from the PLY header (same contract as the
        # frame-loop path): sub-batch frames sharing a depth — mixing
        # depths in one device batch would truncate the deeper frames
        by_depth = {}
        for fr, out in loaded:
            by_depth.setdefault(out[2], []).append((fr, out))
        for depth, members in by_depth.items():
            _encode_depth_batch(
                args, members, depth, mesh, n_dev, dtype, log, seq_streams,
                codec_cache,
            )
        print(f"frames {chunk[0]}..{chunk[-1]} done (batched)")
    log.close()
    if args.save_sequence:
        from raht3dgs_tpu.codec.bitstream import write_sequence

        total = write_sequence(args.save_sequence, seq_streams)
        print(f"sequence: {len(seq_streams)} frames, {total} bytes "
              f"-> {args.save_sequence}")
    return 0


def _encode_depth_batch(args, members, depth, mesh, n_dev, dtype, log,
                        seq_streams, codec_cache) -> None:
    """Encode one equal-depth batch of loaded frames through the batched
    codec, logging per-frame rows (no padding duplicates leak out)."""
    import contextlib

    import jax.numpy as jnp
    import numpy as np

    from raht3dgs_tpu.models.batch_codec import (
        BatchAttributeCodec,
        prepare_frame_batch,
    )
    from raht3dgs_tpu.models.color_codec import RDPoint, y_psnr_db
    from raht3dgs_tpu.ops.color import rgb_to_yuv

    n_real = len(members)
    padded = list(members)
    # batch shapes must match: pad to a multiple of dp; the padding frames
    # are encoded but sliced off every output below
    while mesh is not None and len(padded) % n_dev != 0:
        padded.append(padded[-1])
    pos = [np.floor(np.asarray(v)).astype(np.int64) for _, (v, c, j) in padded]
    yuv = [
        np.asarray(rgb_to_yuv(jnp.asarray(np.asarray(c)), dtype=dtype))
        for _, (v, c, j) in padded
    ]
    frames = prepare_frame_batch(pos, yuv, depth, bucket=args.bucket,
                                 dtype=dtype)
    bc = codec_cache.setdefault(
        depth,
        BatchAttributeCodec(depth, dtype=dtype, mesh=mesh,
                            chunk=args.entropy_chunk,
                            **quant_kwargs(args)),
    )
    geoms = None
    if args.code_geometry and args.save_sequence:
        from raht3dgs_tpu.codec.geometry import geometry_from_positions

        # intra geometry per frame (random access; see the frame-loop path)
        geoms = [geometry_from_positions(p, depth) for p in pos[:n_real]]
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    with ctx:
        # transform once, reuse across the whole quantization-step sweep
        coeffs, orderp, t_timer = bc.transform(frames)
        # the shared transform is amortized across the sweep: each step's
        # rows carry transform_time / n_steps so summed stage columns still
        # account for the full pipeline time (reporting-script contract)
        transform_share = {
            k: v / len(args.steps) for k, v in t_timer.stages.items()
        }
        # the decode-side permutation is step-independent: one per batch
        inv_b = None if args.no_decode else bc.inverse_order(frames)
        # pipelined sweep: all steps' device programs dispatch up front,
        # host entropy drains behind the async fetches (byte-identical
        # to the serial per-step path; see BatchAttributeCodec.encode_sweep)
        sweep = bc.encode_sweep(
            frames, [float(s) for s in args.steps],
            coeffs=coeffs, orderp=orderp,
        )
        for step, (streams, timer) in zip(args.steps, sweep):
            for k, v in transform_share.items():
                timer.add(k, v)
            if args.no_decode:
                recs = None
            else:
                recs, timer = bc.decode(streams, frames, timer=timer,
                                        inv=inv_b)
            if args.save_sequence:
                if geoms is not None:
                    for st, g in zip(streams[:n_real], geoms):
                        st.geometry = g
                seq_streams.extend(streams[:n_real])
            # stage times cover the whole batch: report the per-frame share
            B = len(frames)
            per_frame_times = {k: v / B for k, v in timer.stages.items()}
            for i, (fr, _) in enumerate(members):
                psnr = float("nan")
                if recs is not None:
                    ref = np.asarray(frames[i].attributes)[: frames[i].n_voxels]
                    psnr = y_psnr_db(ref[:, 0], recs[i][:, 0])
                pt = RDPoint(
                    frame=fr, step=float(step), bpp=streams[i].bpp(),
                    psnr=psnr, n_voxels=streams[i].n_voxels,
                    stream_bytes=streams[i].payload_bytes,
                    times=per_frame_times,
                )
                log.row(pt.csv_row())


if __name__ == "__main__":
    sys.exit(main())
