"""Standalone decoder: .r3tc stream (+ optional positions) -> reconstructed PLY.

By default the codec transmits attributes only; positions travel out of
band (the reference's contract — its drivers decode in-process and never
persist reconstructions). This driver completes the loop: given the
bitstream and the voxel positions (any PLY with x/y/z), it rebuilds the
transform structure from the positions, decodes, and writes a
reconstructed PLY.

Streams written with ``--code-geometry`` are SELF-CONTAINED: they carry a
lossless geometry section (``codec/geometry.py``) and decode without
``--positions`` at all — a beyond-reference capability.

    python -m raht3dgs_tpu.cli.decode --stream frame.r3tc \
        --positions frame.ply --output recon.ply [--color-space yuv]
    python -m raht3dgs_tpu.cli.decode --stream frame.r3tc --output recon.ply
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from raht3dgs_tpu.cli._common import add_runtime_args, configure_runtime, jnp_dtype
from raht3dgs_tpu.cli._common import maybe_profile


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stream", required=True,
                   help=".r3tc frame bitstream or .r3ts sequence file")
    p.add_argument(
        "--frame-index", type=int, default=0,
        help="frame to decode when --stream is an .r3ts sequence. "
        "Predicted (P) frames replay the chain from the nearest "
        "preceding I-frame automatically (needs --code-geometry "
        "streams); bound the replay cost at encode time with --gop",
    )
    p.add_argument(
        "--all-frames", action="store_true",
        help="decode every frame of an .r3ts sequence; --positions and "
        "--output must contain a '{i}' placeholder (0-based frame index)",
    )
    p.add_argument(
        "--positions", default=None,
        help="PLY carrying the voxel positions (x/y/z; other properties "
        "ignored). Optional when the stream carries a lossless geometry "
        "section (encoders' --code-geometry)",
    )
    p.add_argument("--output", required=True, help="reconstructed PLY path")
    p.add_argument(
        "--progressive", type=int, default=0, metavar="K",
        help="decode only the first K entropy symbols per channel — a "
        "coarse-to-fine preview (both coefficient orders store coarse "
        "coefficients first; with --entropy-chunk streams the prefix is "
        "byte-addressable). 0 = full decode. Intra frames only",
    )
    p.add_argument(
        "--lod", type=int, default=0, metavar="L",
        help="level-of-detail decode: output the frame at octree depth L "
        "(one point per occupied level-L cell, attributes = exact cell "
        "means for unit-weight frames) from just the matching stream "
        "prefix. Needs the RA-GFT order (the default). Intra frames only",
    )
    p.add_argument(
        "--geometry-lod", type=int, default=0, metavar="L",
        help="positions-only preview: decode the stream's lossless "
        "geometry section at octree depth L (a prefix-level walk — deep "
        "levels are never entropy-decoded) and write the coarse 2^L-grid "
        "positions as a PLY, skipping attribute decode entirely. Needs "
        "--code-geometry streams; intra geometry sections only",
    )
    p.add_argument(
        "--roi", type=int, nargs=6, default=None,
        metavar=("X0", "Y0", "Z0", "X1", "Y1", "Z1"),
        help="with a tiled .r3tt stream: decode ONLY the bricks "
        "intersecting the voxel-coordinate box [X0,X1)x[Y0,Y1)x[Z0,Z1) "
        "and write exactly the voxels inside it (spatial random access; "
        "encode with encode_ply --tiles)",
    )
    p.add_argument(
        "--color-space", choices=("yuv", "raw", "3dgs"), default="yuv",
        help="'yuv': stream holds BT.709 YUV (the encode_ply path) and is "
        "converted back to RGB; 'raw': attributes written as-is; "
        "'3dgs': 56-channel stream re-packed as a renderable 3DGS PLY "
        "(positions must be the compressed-3DGS PLY with voxel metadata)",
    )
    add_runtime_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    configure_runtime(args)
    with maybe_profile(args):
        return _run(args)


def _run(args) -> int:

    with open(args.stream, "rb") as f:
        magic = f.read(4)
    if magic == b"R3TS":
        from raht3dgs_tpu.codec.bitstream import SequenceReader

        seq = SequenceReader(args.stream)
        if args.all_frames:
            if "{i}" not in args.output or (
                args.positions is not None and "{i}" not in args.positions
            ):
                raise SystemExit(
                    "--all-frames needs a '{i}' placeholder in --output "
                    "(and in --positions when given)"
                )
            if seq.frame_bytes(0)[:4] == b"R3TT":
                for i in range(len(seq)):
                    _decode_tiled_blob(
                        args, seq.frame_bytes(i), args.output.format(i=i),
                        positions_path=None if args.positions is None
                        else args.positions.format(i=i),
                    )
                print(f"decoded all {len(seq)} tiled frames of "
                      f"{args.stream}")
                return 0
            streams = [seq.frame(i) for i in range(len(seq))]
            seq_codecs = {}
            if any(s.inter for s in streams):
                # temporal sequence: chain predictions from frame 0. One
                # codec per depth, reset whenever the depth changes
                # between consecutive frames — the encoder applies the
                # SAME rule (encode_dataset._run_inter), so predictions
                # only ever chain across consecutive same-depth frames.
                # The transform dtype must replay the encoder's (recorded
                # in the stream), not the CLI flag.
                import jax.numpy as jnp

                from raht3dgs_tpu.models.temporal import SequenceCodec

                for s in streams:
                    seq_codecs.setdefault(s.depth, SequenceCodec(
                        s.depth,
                        dtype=jnp.float32 if s.dtype32 else jnp.float64,
                    ))
            prev_depth = None
            geom_prev = (None, None)  # (codes, depth) of frame i-1
            for i, stream in enumerate(streams):
                sc = seq_codecs.get(stream.depth)
                if sc is not None and prev_depth != stream.depth:
                    sc.reset()
                cur_codes = _decode_one(
                    args, stream,
                    None if args.positions is None
                    else args.positions.format(i=i),
                    args.output.format(i=i),
                    seq_codec=sc,
                    geom_prev=geom_prev[0]
                    if geom_prev[1] == stream.depth else None,
                )
                geom_prev = (cur_codes, stream.depth)
                prev_depth = stream.depth
            print(f"decoded all {len(seq)} frames of {args.stream}")
            return 0
        print(f"sequence of {len(seq)} frames; decoding frame "
              f"{args.frame_index}")
        fb = seq.frame_bytes(args.frame_index)
        if fb[:4] == b"R3TT":
            return _decode_tiled_blob(args, fb, args.output)
        stream = seq.frame(args.frame_index)
        seq_codec, geom_prev = _replay_to(seq, args, stream)
        _decode_one(args, stream, args.positions, args.output,
                    seq_codec=seq_codec, geom_prev=geom_prev)
        return 0
    elif magic == b"R3TT":
        with open(args.stream, "rb") as f:
            return _decode_tiled_blob(args, f.read(), args.output)
    else:
        from raht3dgs_tpu.codec.bitstream import FrameStream

        with open(args.stream, "rb") as f:
            stream = FrameStream.from_bytes(f.read())
    if args.roi is not None:
        raise SystemExit("--roi needs a tiled .r3tt stream "
                         "(encode with encode_ply --tiles)")
    _decode_one(args, stream, args.positions, args.output)
    return 0


def _decode_tiled_blob(args, data: bytes, output_path: str,
                       positions_path: str = None) -> int:
    """Tiled .r3tt frame: full decode, or only the --roi bricks.

    ``positions_path`` overrides ``args.positions`` (the --all-frames
    loop formats the per-frame '{i}' placeholder before calling in)."""
    if positions_path is None:
        positions_path = args.positions
    import jax.numpy as jnp

    from raht3dgs_tpu.io.ply import save_ply_ascii
    from raht3dgs_tpu.models.tiling import TiledReader, decode_tiled_frame
    from raht3dgs_tpu.ops.color import yuv_to_rgb

    if args.progressive or args.lod or args.geometry_lod:
        raise SystemExit(
            "--progressive/--lod/--geometry-lod apply to monolithic "
            "streams (tiles are already the spatial-random-access axis)"
        )
    reader = TiledReader(data)
    roi = None
    if args.roi is not None:
        lo, hi = np.asarray(args.roi[:3]), np.asarray(args.roi[3:])
        roi = (lo, hi)
        sel = reader.select_roi(lo, hi)
        total = sum(
            reader._offsets[i + 1] - reader._offsets[i]
            for i in range(len(reader))
        )
        got = sum(reader._offsets[i + 1] - reader._offsets[i] for i in sel)
        print(f"ROI {lo.tolist()}..{hi.tolist()}: {len(sel)}/{len(reader)} "
              f"bricks, {got}/{total} payload bytes")
    positions = None
    if positions_path is not None:
        from raht3dgs_tpu.io.ply import read_ply_8i

        positions = np.floor(read_ply_8i(positions_path)[0]).astype(np.int64)
    V, A = decode_tiled_frame(
        reader, roi=roi, positions=positions,
        dtype=jnp_dtype(args.dtype), bucket=args.bucket,
    )
    if args.color_space == "3dgs":
        # 56-channel tiled stream -> renderable compressed-3DGS PLY (the
        # same convention as the monolithic path above: x/y/z keep the
        # INTEGER voxel coordinates, world mapping rides the
        # voxel_size/vmin header comments — encode_3dgs --tiles stores
        # width = voxel_size * 2**J and the true vmin in the shared
        # template, so any tile subset reconstructs in frame coordinates)
        from raht3dgs_tpu.io.ply import save_ply_3dgs

        if A.shape[1] < 8:
            raise SystemExit(
                f"--color-space 3dgs needs the 56-channel layout, stream "
                f"has {A.shape[1]}"
            )
        meta = reader.meta
        quats = A[:, 0:4]
        norm = np.linalg.norm(quats, axis=1, keepdims=True)
        quats = np.where(norm > 1e-8, quats / np.maximum(norm, 1e-8),
                         np.array([[1.0, 0, 0, 0]]))
        save_ply_3dgs(
            output_path,
            means=V.astype(np.float64),
            quats=quats,
            scales=np.abs(A[:, 4:7]),
            opacities=np.clip(A[:, 7], 0.0, 1.0),
            colors=A[:, 8:],
            voxel_size=float(meta.width) / (1 << reader.depth),
            vmin=meta.vmin,
        )
        print(f"decoded {len(V)} voxels x {A.shape[1]} channels "
              f"(J={reader.depth}, {len(reader)} bricks) -> {output_path}")
        return 0
    if args.color_space == "yuv" and A.shape[1] == 3:
        rgb = np.asarray(yuv_to_rgb(jnp.asarray(A)))
        save_ply_ascii(output_path, V.astype(float),
                       np.clip(rgb, 0, 255).astype(int))
    else:
        save_ply_ascii(output_path, V.astype(float), A)
    print(f"decoded {len(V)} voxels x {A.shape[1]} channels "
          f"(J={reader.depth}, {len(reader)} bricks) -> {output_path}")
    return 0


def _replay_to(seq, args, stream):
    """GOP random access to one frame of an .r3ts sequence.

    A predicted frame (inter attributes and/or temporal geometry) depends
    on its predecessors, so `--frame-index` on one walks BACK to the
    nearest clean entry point (intra attributes + intra geometry — the
    encoder keeps I-frames geometry-intra exactly so these entry points
    exist, docs/geometry.md) and silently replays the chain up to the
    target. Returns (seq_codec, geom_prev_codes) for the target's decode;
    (None, None) when the target is itself a clean entry point. Cost is
    O(frames since the last I-frame) — bound it at encode time with
    --gop."""
    i = args.frame_index

    def _clean(s):
        return not s.inter and (
            s.geometry is None or s.geometry[0] in (0, 3)
        )

    if i == 0 or _clean(stream):
        return None, None
    if args.progressive or args.lod or args.geometry_lod:
        raise SystemExit(
            "--progressive/--lod/--geometry-lod apply to intra frames "
            "only — this frame is predicted (pick an I-frame index)"
        )
    chain = {i: stream}
    start = i
    while start > 0 and not _clean(chain[start]):
        start -= 1
        chain[start] = seq.frame(start)
    if not _clean(chain[start]):
        raise SystemExit(
            "no clean random-access point precedes this frame (frame 0 "
            "is predicted?) — decode with --all-frames"
        )
    import jax.numpy as jnp

    from raht3dgs_tpu.codec.geometry import decode_geometry
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.models.temporal import SequenceCodec
    from raht3dgs_tpu.ops.morton import morton_decode

    print(f"predicted frame: replaying the chain from frame {start}")
    sc = None
    geom_prev = None
    prev_depth = None
    for j in range(start, i):
        s = chain.get(j) or seq.frame(j)
        if s.geometry is None:
            raise SystemExit(
                "random access to a predicted frame needs self-contained "
                "geometry in every chained frame (re-encode with "
                "--code-geometry) or --all-frames with --positions"
            )
        if sc is None or s.depth != prev_depth:
            sc = SequenceCodec(
                s.depth,
                dtype=jnp.float32 if s.dtype32 else jnp.float64,
            )
        codes = decode_geometry(
            s.geometry, s.depth, s.n_voxels,
            prev_codes=geom_prev if prev_depth == s.depth else None,
        )
        V = np.asarray(
            morton_decode(jnp.asarray(codes), s.depth), dtype=np.int64
        )
        frame = prepare_voxel_frame(
            V, np.zeros((len(V), s.n_channels)), s.depth,
            bucket=args.bucket, dtype=sc.codec.dtype,
        )
        sc.decode_frame(s, frame)  # advances the prediction chain
        geom_prev = codes
        prev_depth = s.depth
    if prev_depth != stream.depth:
        # depth changed right before the target: predictions don't chain
        # across depth changes (encoder rule), so the target must be
        # intra — but _clean() said otherwise. Corrupt stream.
        raise SystemExit(
            "corrupt sequence: predicted frame follows a depth change"
        )
    return sc, geom_prev


def _decode_one(args, stream, positions_path, output_path,
                seq_codec=None, geom_prev=None):
    """Decode one frame. Returns the frame's geometry codes when they came
    from the stream (the caller threads them as the next frame's temporal
    reference), else None."""
    from raht3dgs_tpu.io.ply import read_ply

    if args.geometry_lod:
        if args.progressive or args.lod:
            raise SystemExit(
                "--geometry-lod is a positions-only preview — it cannot "
                "combine with --progressive/--lod attribute decode"
            )
        if stream.geometry is None:
            raise SystemExit(
                "--geometry-lod needs a stream with a lossless geometry "
                "section (re-encode with --code-geometry)"
            )
        if stream.geometry[0] not in (0, 3):
            raise SystemExit(
                "--geometry-lod applies to intra geometry sections only "
                "(temporal sections chain full-depth codes from frame 0)"
            )
        if not 1 <= args.geometry_lod <= stream.depth:
            raise SystemExit(
                f"--geometry-lod must be in 1..{stream.depth} "
                f"(stream depth), got {args.geometry_lod}"
            )
        from raht3dgs_tpu.codec.geometry import positions_from_geometry_lod
        from raht3dgs_tpu.io.ply import save_ply_ascii

        V = positions_from_geometry_lod(
            stream.geometry, stream.depth, stream.n_voxels,
            args.geometry_lod,
        )
        # scale coarse cells back onto the stream's full-depth grid so
        # previews at different L overlay (cell centers at full depth)
        scale = float(2 ** (stream.depth - args.geometry_lod))
        save_ply_ascii(
            output_path, (V.astype(np.float64) + 0.5) * scale - 0.5,
            width=(1 << stream.depth) - 1,
        )
        print(
            f"geometry LOD {args.geometry_lod}/{stream.depth}: "
            f"{len(V)} coarse cells from {stream.n_voxels} voxels "
            f"-> {output_path}"
        )
        return None

    if positions_path is None:
        if stream.geometry is None:
            raise SystemExit(
                "stream carries no geometry section; pass --positions "
                "(or re-encode with --code-geometry)"
            )
        import jax.numpy as jnp

        from raht3dgs_tpu.codec.geometry import decode_geometry
        from raht3dgs_tpu.ops.morton import morton_decode

        try:
            codes = decode_geometry(
                stream.geometry, stream.depth, stream.n_voxels,
                prev_codes=geom_prev,
            )
        except ValueError as e:
            if "needs prev_codes" in str(e):
                raise SystemExit(
                    "temporal geometry stream: decode the whole sequence "
                    "with --all-frames so the geometry chain can replay "
                    "from frame 0"
                )
            raise
        V_int = np.asarray(
            morton_decode(jnp.asarray(codes), stream.depth), dtype=np.int64
        )
        V = V_int.astype(np.float64)
        gs_meta = None
        if args.color_space == "3dgs":
            # world metadata rides the stream header: encode_3dgs stores
            # width = voxel_size * 2**J and the true vmin
            gs_meta = (
                V_int,
                stream.width / (1 << stream.depth),
                stream.vmin,
            )
        _decode_attrs(args, stream, V, gs_meta, output_path, seq_codec,
                      morton_ordered=True)
        return codes

    gs_meta = None
    if args.color_space == "3dgs":
        from raht3dgs_tpu.io.ply import read_compressed_3dgs_ply

        try:
            V_int_gs, _, voxel_size, vmin_gs = read_compressed_3dgs_ply(
                positions_path
            )
        except (ValueError, KeyError) as e:
            raise SystemExit(
                f"--color-space 3dgs: {positions_path} is not a "
                f"compressed-3DGS PLY (needs rot_*/scale_*/opacity/f_dc_* "
                f"properties): {e}"
            )
        gs_meta = (V_int_gs, voxel_size, vmin_gs)

    if gs_meta is not None:
        # positions were already parsed by read_compressed_3dgs_ply — the
        # integer voxel coordinates ARE the x/y/z columns
        V = np.asarray(V_int_gs, dtype=np.float64)
    else:
        ply = read_ply(positions_path)
        v = ply.vertices
        V = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float64)
    if len(V) != stream.n_voxels:
        raise SystemExit(
            f"stream encodes {stream.n_voxels} voxels but {positions_path} "
            f"has {len(V)} points"
        )
    if stream.geometry is not None and stream.geometry[0] in (0, 3):
        # both sources available: cross-check the sidecar against the
        # stream's own (intra: profile 0 or ext3 profile 3) geometry — a
        # wrong positions file with the right point count would otherwise
        # decode attributes onto wrong voxels silently
        from raht3dgs_tpu.codec.geometry import (
            codes_from_positions,
            decode_geometry,
        )

        own = decode_geometry(stream.geometry, stream.depth,
                              stream.n_voxels)
        if not np.array_equal(
            codes_from_positions(V, stream.depth).astype(np.int64),
            own.astype(np.int64),
        ):
            raise SystemExit(
                f"{positions_path} does not match the geometry coded in "
                "the stream (same count, different voxels) — wrong "
                "positions file?"
            )
    _decode_attrs(args, stream, V, gs_meta, output_path, seq_codec)
    return None


def _decode_attrs(args, stream, V, gs_meta, output_path, seq_codec,
                  morton_ordered=False) -> None:
    import jax.numpy as jnp

    from raht3dgs_tpu.io.ply import save_ply_ascii
    from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
    from raht3dgs_tpu.ops.color import yuv_to_rgb

    # sequence decode replays the ENCODER's transform dtype (stream flag
    # bit 7; the SequenceCodec was built from it) — the frame arrays must
    # follow it too, or the closed loop's butterfly precision diverges
    # from the encoder's (CLAUDE.md: "decoder must replay encoder dtype")
    dtype = (seq_codec.codec.dtype if seq_codec is not None
             else jnp_dtype(args.dtype))
    frame = prepare_voxel_frame(
        np.floor(V).astype(np.int64),
        np.zeros((len(V), stream.n_channels)),
        stream.depth, bucket=args.bucket, dtype=dtype,
    )
    if stream.inter and seq_codec is None:
        raise SystemExit(
            "inter (predicted) frame: decode the whole sequence with "
            "--all-frames so the prediction can chain from frame 0"
        )
    if seq_codec is not None:
        if args.progressive or args.lod:
            raise SystemExit(
                "--progressive/--lod apply to standalone intra frames only "
                "(sequence decode chains predictions through full frames)"
            )
        rec = seq_codec.decode_frame(stream, frame)
    elif args.lod:
        if args.progressive:
            raise SystemExit(
                "--progressive and --lod are mutually exclusive (an LOD "
                "decode IS a specific progressive prefix)"
            )
        if gs_meta is not None and stream.n_channels < 8:
            raise SystemExit(
                f"--color-space 3dgs needs the 56-channel layout, stream "
                f"has {stream.n_channels}"
            )
        codec = AttributeCodec(stream.depth, dtype=dtype,
                               order_mode=stream.order_mode)
        try:
            pos_lod, rec_lod, cell_w = codec.decode_lod(
                stream, frame.codes, frame.weights, args.lod
            )
        except ValueError as e:  # bad level / non-RA-GFT order
            raise SystemExit(str(e))
        # the coefficients above the cut are exactly one per occupied
        # level-L cell (lod_prefix_count == len(pos_lod) by construction)
        print(
            f"LOD {args.lod}/{stream.depth}: {len(pos_lod)} cells from "
            f"{stream.n_voxels} voxels ({len(pos_lod)} of "
            f"{stream.n_voxels} coefficients decoded)"
        )
        if gs_meta is not None:
            from raht3dgs_tpu.io.ply import save_ply_3dgs

            _, voxel_size, vmin_gs = gs_meta
            scale_f = float(2 ** (stream.depth - args.lod))
            quats = rec_lod[:, 0:4]
            nq = np.linalg.norm(quats, axis=1, keepdims=True)
            quats = np.where(nq > 1e-8, quats / np.maximum(nq, 1e-8),
                             np.array([[1.0, 0, 0, 0]]))
            save_ply_3dgs(
                output_path,
                means=pos_lod.astype(np.float64),
                quats=quats,
                scales=np.abs(rec_lod[:, 4:7]),
                opacities=np.clip(rec_lod[:, 7], 0.0, 1.0),
                colors=rec_lod[:, 8:],
                voxel_size=float(voxel_size) * scale_f,
                vmin=vmin_gs,
            )
        elif args.color_space == "yuv" and stream.n_channels == 3:
            rgb = np.asarray(yuv_to_rgb(jnp.asarray(rec_lod)))
            save_ply_ascii(output_path, pos_lod.astype(float),
                           np.clip(rgb, 0, 255).astype(int))
        else:
            save_ply_ascii(output_path, pos_lod.astype(float), None)
            np.save(output_path + ".attrs.npy", rec_lod)
        np.save(output_path + ".cellw.npy", cell_w)
        return
    else:
        codec = AttributeCodec(stream.depth, dtype=dtype,
                               order_mode=stream.order_mode)
        if args.progressive:
            if args.progressive < 0:
                raise SystemExit(
                    f"--progressive must be positive (got {args.progressive})"
                )
            from raht3dgs_tpu.models.pipeline import progressive_prefix_bytes

            rec, _ = codec.decode_progressive(
                stream, frame.codes, frame.weights, args.progressive
            )
            k_eff = min(max(args.progressive, 1), stream.n_voxels)
            print(
                f"progressive preview: {k_eff}"
                f"/{stream.n_voxels} coefficients, entropy prefix "
                f"{progressive_prefix_bytes(stream, args.progressive)} bytes "
                f"(full: {sum(len(s) for s in stream.channels)})"
            )
        else:
            rec, _ = codec.decode(stream, frame.codes, frame.weights)

    if morton_ordered:
        # geometry-derived positions are already in Morton order — the
        # permutation below would be the identity
        out_attrs = rec
    else:
        # decoded rows are Morton-sorted; map back to the input point order
        from raht3dgs_tpu.ops.prelude import morton_codes_np

        order = np.argsort(
            morton_codes_np(np.floor(V).astype(np.int64), stream.depth),
            kind="stable",
        )
        out_attrs = np.empty_like(rec)
        out_attrs[order] = rec

    if gs_meta is not None:
        from raht3dgs_tpu.io.ply import save_ply_3dgs

        if stream.n_channels < 8:
            raise SystemExit(
                f"--color-space 3dgs needs the 56-channel layout, stream "
                f"has {stream.n_channels}"
            )
        # Compressed-3DGS convention (reference quality_eval.py writer /
        # data_util.py reader): x/y/z hold INTEGER voxel coordinates; world
        # positions are recovered as V*voxel_size+vmin from the header
        # metadata. Writing the same convention keeps the reconstruction
        # round-trippable through read_compressed_3dgs_ply and usable by
        # eval/render (which does the world conversion).
        V_int_gs, voxel_size, vmin_gs = gs_meta
        quats = out_attrs[:, 0:4]
        norm = np.linalg.norm(quats, axis=1, keepdims=True)
        quats = np.where(norm > 1e-8, quats / np.maximum(norm, 1e-8),
                         np.array([[1.0, 0, 0, 0]]))
        save_ply_3dgs(
            output_path,
            means=V_int_gs.astype(np.float64),
            quats=quats,
            scales=np.abs(out_attrs[:, 4:7]),
            opacities=np.clip(out_attrs[:, 7], 0.0, 1.0),
            colors=out_attrs[:, 8:],
            voxel_size=float(voxel_size),
            vmin=vmin_gs,
        )
    elif args.color_space == "yuv" and stream.n_channels == 3:
        rgb = np.asarray(yuv_to_rgb(jnp.asarray(out_attrs)))
        save_ply_ascii(output_path, V, np.clip(rgb, 0, 255).astype(int))
    else:
        save_ply_ascii(output_path, V, None)
        # attributes sidecar for non-color payloads
        np.save(output_path + ".attrs.npy", out_attrs)
        print(f"attributes written to {output_path}.attrs.npy")
    print(
        f"decoded {stream.n_voxels} voxels x {stream.n_channels} channels "
        f"(J={stream.depth}, steps={stream.steps.tolist()}, "
        f"order={stream.order_mode}) -> {output_path}"
    )


if __name__ == "__main__":
    sys.exit(main())
