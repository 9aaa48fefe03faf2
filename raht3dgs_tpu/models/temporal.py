"""Inter-frame sequence codec: I/P-frame coding of dynamic voxel sequences.

The reference encodes every frame of a dataset sweep independently
(``/root/reference/python/encode_dataset.py:104-222``). Dynamic scans are
temporally coherent, so this codec adds closed-loop DPCM across frames on
top of the intra machinery:

- **I-frames** (every ``gop``-th frame) use :class:`AttributeCodec`
  unchanged.
- **P-frames** predict each voxel's attributes from the previous frame's
  *reconstruction* via motion-compensated neighbor probes over sorted
  Morton codes (``ops/temporal.py``), RAHT-transform the residual, and
  entropy-code it with the same quantize/reorder/RLGR stack. The default
  (container v3) SIGNALS the per-block motion field the encoder found by
  searching against the true residual — ~3 near-zero RLGR symbols per
  occupied 16³ block, charged to the rate — so the decoder replays
  nothing but integers and future encoder search improvements need no
  format change. ``signal_motion=False`` writes the v2 stream, whose
  motion pipeline is DERIVED from geometry on both sides.
- **Adaptive fallback**: with ``adaptive=True`` a P-frame that codes
  larger than its intra encoding ships as an I-frame instead (both are
  produced; the cheaper wins — the standard closed-loop mode decision).

The loop is closed: the encoder reconstructs every frame exactly as the
decoder will (same jitted programs, same inputs -> bitwise-identical
predictions), so there is no drift.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.codec.bitstream import FrameStream
from raht3dgs_tpu.codec.rlgr import rlgr_decode, rlgr_encode
from raht3dgs_tpu.models.pipeline import AttributeCodec, VoxelFrame
from raht3dgs_tpu.ops.temporal import (
    block_first,
    estimate_global_motion,
    predict_from_previous,
    refine_block_motion,
    search_block_motion,
)
from raht3dgs_tpu.utils.timing import StageTimer

# signalled-motion payload (the v3 container's opaque motion section):
#   u8 block_side_log | u8 reserved | i32 global[3] | u32 n_blocks |
#   RLGR(signed) of 3*n_blocks per-block shifts relative to global,
#   xyz-interleaved in sorted-code block order
_MOTION_HEAD = struct.Struct("<BBiiiI")

# size-adaptive witness-sampling gate (encoder-side only, stream-
# compatible): frames with fewer occupied voxels than this search
# exactly (stride 1) — small blocks hold too few witnesses to
# subsample; larger frames use stride 4 (2.5x faster search on v5e at
# 500k for ~0.06% BD-rate, docs/roadmap.md).
_STRIDE_ADAPTIVE_MIN = 65536


def _pack_motion(codes_np, n_voxels, depth, bsl, global_mv, mv_np):
    """Serialize the per-block motion field (encoder side).

    ``mv_np`` is block-constant (search_block_motion contract), so row 0
    of each occupied block carries the block's vector; blocks are
    top-code-bit runs of the OCCUPIED prefix — identical on the decoder
    regardless of its pad bucket size.
    """
    bf = np.asarray(block_first(codes_np[:n_voxels], depth, bsl))
    sym = (mv_np[:n_voxels][bf] - global_mv[None, :]).astype(np.int64)
    payload, _ = rlgr_encode(sym.ravel(), signed=True)
    return _MOTION_HEAD.pack(
        bsl, 0, int(global_mv[0]), int(global_mv[1]), int(global_mv[2]),
        sym.shape[0],
    ) + payload


def signalled_global_motion(stream):
    """Global motion vector from a v3 inter stream's motion section, or
    None (intra frame / v2 derived-motion stream). The geometry coder
    reuses it to motion-compensate its temporal reference (profile 2)."""
    if (not getattr(stream, "inter", False) or stream.motion is None
            or len(stream.motion) < _MOTION_HEAD.size):
        return None
    _, _, gx, gy, gz, _ = _MOTION_HEAD.unpack(
        stream.motion[: _MOTION_HEAD.size]
    )
    return np.array([gx, gy, gz], dtype=np.int64)


def _unpack_motion(motion: bytes, codes_np, n_voxels, n_padded, depth):
    """Rebuild the (n_padded, 3) int32 per-voxel motion field."""
    if len(motion) < _MOTION_HEAD.size:
        raise ValueError("corrupt motion section: header cut off")
    bsl, _, gx, gy, gz, n_blocks = _MOTION_HEAD.unpack(
        motion[: _MOTION_HEAD.size]
    )
    bf = np.asarray(block_first(codes_np[:n_voxels], depth, bsl))
    if int(bf.sum()) != n_blocks:
        raise ValueError(
            f"corrupt motion section: {n_blocks} blocks signalled but the "
            f"frame's codes form {int(bf.sum())} — positions do not match "
            "this stream"
        )
    sym, _ = rlgr_decode(
        motion[_MOTION_HEAD.size:], 3 * n_blocks, signed=True
    )
    sym = sym.reshape(n_blocks, 3)
    g = np.array([gx, gy, gz], np.int64)
    mv = np.broadcast_to(g, (n_padded, 3)).copy()
    seg = np.cumsum(bf) - 1
    mv[:n_voxels] = g[None, :] + sym[seg]
    return mv.astype(np.int32)


def _residual_frame(frame: VoxelFrame, pred) -> VoxelFrame:
    """The frame whose attributes are the prediction residual (pad slots
    zeroed — their predictions are unmasked garbage by contract)."""
    occ = (frame.weights > 0)[:, None]
    resid = jnp.where(occ, frame.attributes - pred, 0.0)
    return VoxelFrame(
        codes=frame.codes,
        attributes=resid,
        weights=frame.weights,
        n_voxels=frame.n_voxels,
        depth=frame.depth,
        vmin=frame.vmin,
        width=frame.width,
    )


class SequenceCodec:
    """Encode/decode temporally coherent frame sequences with I/P frames.

    ``codec_kwargs`` are forwarded to :class:`AttributeCodec` (dtype,
    order_mode, chunk, quant_mode, ...). Frames must be prepared with a
    shared bucket size when their voxel counts differ (the predictor only
    needs sorted padded codes, which ``prepare_voxel_frame`` guarantees).
    """

    def __init__(self, depth: int, gop: int = 8, adaptive: bool = True,
                 probes: int = 27, signal_motion: bool = True,
                 block_side_log: int = 4, search_iters: int = 2,
                 search_stride: Optional[int] = None, **codec_kwargs):
        if gop < 1:
            raise ValueError(f"gop must be >= 1, got {gop}")
        if probes not in (7, 27):
            raise ValueError(f"probes must be 7 or 27, got {probes}")
        if search_stride is not None and int(search_stride) < 1:
            raise ValueError(
                f"search_stride must be >= 1, got {search_stride}"
            )
        if int(search_iters) < 1:
            raise ValueError(f"search_iters must be >= 1, got {search_iters}")
        # predict=True composes: I-frames (and the adaptive intra
        # candidate) run the predicted closed loop on the frame itself,
        # P-frames run it on the temporal residual — the praht loop is
        # content-agnostic and decode is flag-driven per stream
        # (pipeline._praht_decode replays the recorded dtype), so the
        # sequence closed loop stays bitwise: encoder reconstructions come
        # from the same decode path the receiver runs.
        self.depth = depth
        self.gop = int(gop)
        self.adaptive = bool(adaptive)
        self.probes = int(probes)
        # signalled per-block motion (container v3): the encoder searches
        # the field against the true residual (attribute-guided witnesses,
        # ops/temporal.py:search_block_motion) and ships it (~3 near-zero
        # RLGR symbols per occupied block); False reproduces the v2
        # derived-motion stream for format back-compat tests.
        self.signal_motion = bool(signal_motion)
        self.block_side_log = int(block_side_log)
        # encoder-side search depth (±search_iters voxels Chebyshev around
        # the global vector) and witness sampling stride; both
        # stream-compatible — only the signalled integers matter to the
        # decoder. stride None = size-adaptive: exact (1) below
        # _STRIDE_ADAPTIVE_MIN occupied voxels (small blocks hold too few
        # witnesses to subsample — the rate-win fixture regresses), 4
        # above it (2.5x faster search on v5e at 500k, ~0.06% BD-rate,
        # docs/roadmap.md).
        self.search_iters = int(search_iters)
        self.search_stride = (None if search_stride is None
                              else int(search_stride))
        self.codec = AttributeCodec(depth, **codec_kwargs)
        self.reset()

    # -- shared helpers ---------------------------------------------------

    def _padded_recon(self, frame: VoxelFrame, rec: np.ndarray):
        """Reconstruction re-padded to the frame's slot layout (zeros in
        pad slots) for use as the next frame's prediction source."""
        full = np.zeros(
            (frame.codes.shape[0], rec.shape[1]), dtype=np.float64
        )
        full[: frame.n_voxels] = rec
        return jnp.asarray(full, dtype=self.codec.dtype)

    def _predict(self, frame: VoxelFrame, prev: Tuple, probes=None):
        """v2 (derived) motion-compensated neighbor prediction: global
        integer motion plus a per-block refinement, both DERIVED from the
        two frames' geometry (both sides have it), so nothing is
        signalled. The two-stage derivation is part of the v2 inter
        stream contract — decoder and encoder must run the identical
        pipeline. v3 streams signal the field instead (:meth:`_search`)
        and never enter here."""
        prev_frame, prev_recon = prev
        motion = estimate_global_motion(
            frame.codes, frame.weights, prev_frame.codes,
            prev_frame.weights, self.depth,
        )
        motion = refine_block_motion(
            frame.codes, frame.weights, prev_frame.codes,
            prev_frame.weights, self.depth, motion,
        )
        pred, _ = predict_from_previous(
            frame.codes, prev_frame.codes, prev_recon, prev_frame.weights,
            self.depth, probes or self.probes, motion,
        )
        return pred

    def _effective_stride(self, n_voxels: int) -> int:
        """Witness-sampling stride for a frame: the explicit setting, or
        the size-adaptive default (exact under ``_STRIDE_ADAPTIVE_MIN``
        occupied voxels, 4 above it)."""
        if self.search_stride is not None:
            return self.search_stride
        return 4 if n_voxels >= _STRIDE_ADAPTIVE_MIN else 1

    def _search(self, frame: VoxelFrame, prev: Tuple):
        """Encoder-side v3 prediction: search the per-block field against
        the true residual, then predict with it. Returns (pred,
        motion_bytes); the decoder reproduces ``pred`` bitwise from
        ``motion_bytes`` alone (:meth:`_predict_signalled`) — the closed
        loop depends only on the signalled integers, not on replaying
        the search."""
        prev_frame, prev_recon = prev
        motion = estimate_global_motion(
            frame.codes, frame.weights, prev_frame.codes,
            prev_frame.weights, self.depth,
        )
        stride = self._effective_stride(frame.n_voxels)
        mv = search_block_motion(
            frame.codes, frame.attributes, frame.weights,
            prev_frame.codes, prev_recon, prev_frame.weights,
            self.depth, motion, block_side_log=self.block_side_log,
            iters=self.search_iters, stride=stride,
        )
        mv_np = np.asarray(mv)
        motion_bytes = _pack_motion(
            np.asarray(frame.codes), frame.n_voxels, self.depth,
            self.block_side_log, np.asarray(motion).astype(np.int64),
            mv_np,
        )
        pred, _ = predict_from_previous(
            frame.codes, prev_frame.codes, prev_recon, prev_frame.weights,
            self.depth, self.probes, mv,
        )
        return pred, motion_bytes

    def _predict_signalled(self, frame: VoxelFrame, prev: Tuple,
                           stream: FrameStream):
        """Decoder-side v3 prediction from the stream's motion section."""
        prev_frame, prev_recon = prev
        mv = _unpack_motion(
            stream.motion, np.asarray(frame.codes), frame.n_voxels,
            frame.codes.shape[0], self.depth,
        )
        pred, _ = predict_from_previous(
            frame.codes, prev_frame.codes, prev_recon, prev_frame.weights,
            self.depth, stream.probes, jnp.asarray(mv),
        )
        return pred

    # -- encode -----------------------------------------------------------

    def reset(self) -> None:
        """Drop the prediction state (start a new independent sequence)."""
        self._prev = None
        self._index = 0

    def encode_frame(
        self, frame: VoxelFrame, steps, timer: Optional[StageTimer] = None,
    ) -> Tuple[FrameStream, np.ndarray]:
        """Incremental encode: one frame in, (stream, reconstruction) out.

        Streaming counterpart of :meth:`encode_sequence` — carries the
        closed-loop prediction state across calls so dataset drivers can
        process arbitrarily long sequences one frame at a time. The
        returned reconstruction is decoder-exact.

        ``timer`` receives only the CHOSEN path's stages (plus
        Predict_time when inter wins) — the losing adaptive candidate's
        work is not folded in, so summed CSV stage columns stay
        comparable with intra driver rows (each column = one encode)."""
        timer = timer if timer is not None else StageTimer()
        force_intra = self._prev is None or (self._index % self.gop == 0)
        enc_intra, t_intra = None, None
        if force_intra or self.adaptive:
            t_intra = StageTimer()
            enc_intra = self.codec.encode(frame, steps, timer=t_intra)
        chosen, t_chosen = enc_intra, t_intra
        pred = None
        if not force_intra:
            t_inter = StageTimer()
            if self.signal_motion:
                pred, motion_bytes = t_inter.time(
                    "Predict_time", self._search, frame, self._prev
                )
            else:
                pred = t_inter.time("Predict_time", self._predict, frame,
                                    self._prev)
                motion_bytes = None
            enc_inter = self.codec.encode(
                _residual_frame(frame, pred), steps, timer=t_inter
            )
            enc_inter.stream.inter = True
            enc_inter.stream.probes = self.probes
            enc_inter.stream.motion = motion_bytes
            if (
                enc_intra is None
                or enc_inter.stream.payload_bytes
                < enc_intra.stream.payload_bytes
            ):
                chosen, t_chosen = enc_inter, t_inter
        stream = chosen.stream
        if not stream.inter:
            pred = None
        for name, sec in t_chosen.stages.items():
            timer.add(name, sec)
        rec, _ = self.codec.decode(
            stream, frame.codes, frame.weights, timer=timer
        )
        if pred is not None:
            rec = rec + np.asarray(pred)[: frame.n_voxels]
        self._prev = (frame, self._padded_recon(frame, rec))
        self._index += 1
        return stream, rec

    def encode_frame_target(
        self, frame: VoxelFrame, target_bpp: float,
        timer: Optional[StageTimer] = None,
    ) -> Tuple[FrameStream, np.ndarray, float]:
        """Rate-targeted incremental encode: (stream, reconstruction,
        achieved step).

        Each candidate (intra; inter when the GOP allows it) searches its
        OWN quantization step for the budget (models/rd_search.py; the
        inter candidate's budget is reduced by its signalled motion
        bytes). At equal rate the adaptive choice is the candidate with
        the FINER step: the transform is orthonormal and the residual
        rides the same transform, so uniform-quantizer distortion is
        ~step^2/12 in either domain — smaller step = lower distortion.
        Decoders need nothing new: the chosen step is recorded in the
        stream like any other."""
        import time as _time

        from raht3dgs_tpu.models.rd_search import search_step_for_bpp

        timer = timer if timer is not None else StageTimer()
        force_intra = self._prev is None or (self._index % self.gop == 0)
        enc_intra = step_intra = None
        if force_intra or self.adaptive:
            t0 = _time.perf_counter()
            r = search_step_for_bpp(frame, target_bpp, codec=self.codec)
            timer.add("Quant_time", _time.perf_counter() - t0)
            enc_intra, step_intra = r.encoded, r.step
        chosen, step, pred = enc_intra, step_intra, None
        if not force_intra:
            t0 = _time.perf_counter()
            if self.signal_motion:
                p, motion_bytes = self._search(frame, self._prev)
            else:
                p = self._predict(frame, self._prev, probes=self.probes)
                motion_bytes = None
            n = max(frame.n_voxels, 1)
            budget = target_bpp - (
                len(motion_bytes) * 8.0 / n if motion_bytes else 0.0
            )
            r2 = None
            if budget > 0:
                r2 = search_step_for_bpp(
                    _residual_frame(frame, p), budget, codec=self.codec
                )
            timer.add("Predict_time", _time.perf_counter() - t0)
            if r2 is not None:
                enc_inter = r2.encoded
                enc_inter.stream.inter = True
                enc_inter.stream.probes = self.probes
                enc_inter.stream.motion = motion_bytes
                if enc_intra is None or r2.step < step_intra:
                    chosen, step, pred = enc_inter, r2.step, p
        if chosen is None:  # adaptive off AND the motion ate the budget
            r = search_step_for_bpp(frame, target_bpp, codec=self.codec)
            chosen, step = r.encoded, r.step
        stream = chosen.stream
        if not stream.inter:
            pred = None
        rec, _ = self.codec.decode(
            stream, frame.codes, frame.weights, timer=timer
        )
        if pred is not None:
            rec = rec + np.asarray(pred)[: frame.n_voxels]
        self._prev = (frame, self._padded_recon(frame, rec))
        self._index += 1
        return stream, rec, float(step)

    def encode_sequence(
        self,
        frames: Sequence[VoxelFrame],
        steps,
        timers: Optional[List[StageTimer]] = None,
    ) -> Tuple[List[FrameStream], List[np.ndarray]]:
        """Returns (streams, reconstructions) — one per frame.

        Reconstructions are the decoder-exact closed-loop outputs (the
        encoder decodes every frame to predict the next one), so callers
        get decode-side PSNR for free.
        """
        self.reset()
        streams: List[FrameStream] = []
        recons: List[np.ndarray] = []
        for frame in frames:
            timer = StageTimer()
            stream, rec = self.encode_frame(frame, steps, timer=timer)
            if timers is not None:
                timers.append(timer)
            streams.append(stream)
            recons.append(rec)
        return streams, recons

    # -- decode -----------------------------------------------------------

    def decode_frame(
        self, stream: FrameStream, frame: VoxelFrame,
    ) -> np.ndarray:
        """Incremental decode mirror of :meth:`encode_frame` (shares the
        same ``reset()``-managed prediction state)."""
        if stream.inter and self._prev is None:
            raise ValueError(
                "inter stream without a preceding reconstructed frame"
            )
        if stream.inter:
            is32 = jnp.dtype(self.codec.dtype) == jnp.dtype("float32")
            if bool(stream.dtype32) != bool(is32):
                raise ValueError(
                    "inter stream was encoded with "
                    f"{'float32' if stream.dtype32 else 'float64'} "
                    "transforms but this decoder runs "
                    f"{'float32' if is32 else 'float64'} — the closed "
                    "loop needs identical precision (pass the matching "
                    "dtype)"
                )
        rec, _ = self.codec.decode(stream, frame.codes, frame.weights)
        if stream.inter:
            if stream.motion is not None:
                pred = self._predict_signalled(frame, self._prev, stream)
            else:
                pred = self._predict(frame, self._prev,
                                     probes=stream.probes)
            rec = rec + np.asarray(pred)[: frame.n_voxels]
        self._prev = (frame, self._padded_recon(frame, rec))
        self._index += 1
        return rec

    def decode_sequence(
        self,
        streams: Sequence[FrameStream],
        frames: Sequence[VoxelFrame],
    ) -> List[np.ndarray]:
        """Mirror of :meth:`encode_sequence`; ``frames`` supply the
        (losslessly known) per-frame positions. The first stream must be
        intra; each inter stream is decoded as residual + prediction from
        the previous reconstruction."""
        self.reset()
        return [
            self.decode_frame(stream, frame)
            for stream, frame in zip(streams, frames)
        ]
