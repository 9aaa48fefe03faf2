"""Batched multi-frame codec: encode/decode a whole frame batch per dispatch.

The reference's dataset sweep (``encode_dataset.py``) is a Python loop —
one GPU dispatch chain per frame per step. Here frames are stacked into a
(B, N, D) batch (shape-bucketed; padding is invisible to the transform) and
the whole batch runs as ONE jitted program, optionally sharded over a
(dp, tp) device mesh — the BASELINE.json "batched dataset encode fully on
TPU" configuration.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.codec.bitstream import FrameStream
from raht3dgs_tpu.models.pipeline import VoxelFrame, prepare_voxel_frame
from raht3dgs_tpu.parallel.sharding import (
    batched_decode_step,
    batched_forward,
    batched_inverse_order,
    batched_quant_reorder,
    shard_batch,
)
from raht3dgs_tpu.utils.padding import round_up_bucket
from raht3dgs_tpu.utils.timing import StageTimer


def prepare_frame_batch(
    positions_list: Sequence[np.ndarray],
    attributes_list: Sequence[np.ndarray],
    depth: int,
    bucket: int = 1 << 13,
    dtype=jnp.float64,
) -> List[VoxelFrame]:
    """Prepare frames padded to one shared bucketed size."""
    n_max = max(p.shape[0] for p in positions_list)
    shared = round_up_bucket(n_max, bucket)
    return [
        prepare_voxel_frame(p, a, depth, bucket=shared, dtype=dtype)
        for p, a in zip(positions_list, attributes_list)
    ]


class BatchAttributeCodec:
    """Encode/decode stacks of equally-bucketed frames in one device call."""

    def __init__(
        self,
        depth: int,
        dtype=jnp.float64,
        order_mode: str = "ragft",
        mesh=None,
        chunk: int = 0,
        quant_mode: str = "mid",
        quant_f: float = 0.3,
        rec_delta: float = 0.12,
        entropy: str = "rlgr",
        predict: bool = False,
    ):
        self.depth = depth
        self.dtype = dtype
        self.order_mode = order_mode
        self.mesh = mesh
        self.chunk = int(chunk)
        # quantizer selection mirrors AttributeCodec (pipeline.py)
        if quant_mode not in ("mid", "deadzone"):
            raise ValueError(f"unknown quant_mode {quant_mode!r}")
        self.quant_mode = quant_mode
        self.quant_f = float(quant_f)
        self.rec_delta = float(rec_delta)
        # entropy coder selection mirrors AttributeCodec (pipeline.py)
        if entropy not in ("rlgr", "rac", "auto"):
            raise ValueError(f"unknown entropy coder {entropy!r}")
        self.entropy = entropy
        # predict=True: the predicted transform is a sequential host
        # closed loop (ops/praht.py) — there is no device batch to shard,
        # so the batch API delegates per frame to an AttributeCodec with
        # identical parameters (streams are byte-identical to the
        # single-frame path; `mesh` has no effect on this mode). The
        # batch surface stays uniform so drivers compose --batch with
        # --predict without special-casing.
        self.predict = bool(predict)
        self._frame_codec = None
        if predict:
            from raht3dgs_tpu.models.pipeline import AttributeCodec

            self._frame_codec = AttributeCodec(
                depth, dtype=dtype, order_mode=order_mode, chunk=chunk,
                quant_mode=quant_mode, quant_f=quant_f,
                rec_delta=rec_delta, entropy=entropy, predict=True,
            )

    def _stack(self, frames: Sequence[VoxelFrame]):
        codes = jnp.stack([f.codes for f in frames])
        attrs = jnp.stack([f.attributes for f in frames])
        weights = jnp.stack([f.weights for f in frames])
        if self.mesh is not None:
            codes, attrs, weights = shard_batch(self.mesh, codes, attrs, weights)
        return codes, attrs, weights

    def transform(
        self,
        frames: Sequence[VoxelFrame],
        timer: Optional[StageTimer] = None,
    ):
        """Step-independent half of the encode (forward RAHT + stream
        order), reusable across a quantization-step sweep."""
        timer = timer or StageTimer()
        codes, attrs, weights = self._stack(frames)
        nvox = jnp.asarray([f.n_voxels for f in frames], dtype=jnp.int32)
        coeffs, orderp = timer.time(
            "RAHT_transform_time",
            batched_forward,
            codes, attrs, weights, self.depth, self.order_mode, nvox,
        )
        return coeffs, orderp, timer

    def encode(
        self,
        frames: Sequence[VoxelFrame],
        steps,
        coeffs=None,
        orderp=None,
        timer: Optional[StageTimer] = None,
    ) -> Tuple[List[FrameStream], StageTimer]:
        timer = timer or StageTimer()
        if self.predict:
            streams = []
            for f in frames:
                enc = self._frame_codec.encode(f, steps, timer=timer)
                streams.append(enc.stream)
            return streams, timer
        if coeffs is None or orderp is None:
            coeffs, orderp, timer = self.transform(frames, timer)
        steps_arr = jnp.atleast_1d(jnp.asarray(steps, dtype=self.dtype))
        q_b = timer.time(
            "Quant_time", batched_quant_reorder, coeffs, steps_arr, orderp,
            self.quant_mode, jnp.asarray(self.quant_f, dtype=self.dtype),
        )
        from raht3dgs_tpu.models.pipeline import _narrow_fetch

        q_np = _narrow_fetch(q_b)  # (B, D, N) channel-major host int32
        streams, enc_ns = self._entropy_streams(q_np, frames, steps)
        timer.add("Entropy_enc_time", enc_ns / 1e9)
        return streams, timer

    def _entropy_streams(self, q_np, frames: Sequence[VoxelFrame], steps):
        """Per-frame host entropy over a fetched (B, D, N) batch; stream
        assembly is shared with the single-frame codec
        (``pipeline.build_entropy_stream``)."""
        from raht3dgs_tpu.models.pipeline import build_entropy_stream

        streams: List[FrameStream] = []
        enc_ns = 0
        for i, f in enumerate(frames):
            stream, ns = build_entropy_stream(
                q_np[i], f, steps, depth=self.depth,
                order_mode=self.order_mode, chunk=self.chunk,
                quant_mode=self.quant_mode, quant_f=self.quant_f,
                rec_delta=self.rec_delta,
                dtype32=jnp.dtype(self.dtype) == jnp.dtype("float32"),
                entropy=self.entropy,
            )
            enc_ns += ns
            streams.append(stream)
        return streams, enc_ns

    def encode_sweep(
        self,
        frames: Sequence[VoxelFrame],
        steps_list: Sequence,
        coeffs=None,
        orderp=None,
    ) -> List[Tuple[List[FrameStream], StageTimer]]:
        """Encode one quantization-step sweep with host/device overlap.

        Pipelined equivalent of ``[self.encode(frames, s, ...) for s in
        steps_list]`` (byte-identical streams): every step's quantize+
        reorder program is dispatched up front (JAX async dispatch queues
        them on the device), the device->host copies are started
        asynchronously in dispatch order, and only then does the host
        drain the entropy coder — so step k's RLGR overlaps step k+1's
        device work and transfer instead of serializing behind it. The
        reference sweep is strictly serial per step
        (``/root/reference/python/encode_ply.py:147-220``).

        Per-step "Quant_time" reports the *wait* for that step's device
        result + fetch (overlapped portions show up as ~0); the native
        entropy nanoseconds are exact. Summed stage columns therefore
        track the true pipelined wall time rather than double-counting
        overlapped work.
        """
        if self.predict:
            # frames OUTER, steps inner: the per-frame plan/true-coeff
            # caches (pipeline._praht_context) then hit on every step,
            # and the regrouped streams are byte-identical to
            # `[self.encode(frames, s) for s in steps_list]`
            per_frame = [
                self._frame_codec.encode_sweep(f, steps_list)
                for f in frames
            ]
            out = []
            for si in range(len(steps_list)):
                timer = StageTimer()
                streams = []
                for fi in range(len(frames)):
                    enc = per_frame[fi][si]
                    streams.append(enc.stream)
                    for name, sec in enc.timer.stages.items():
                        timer.add(name, sec)
                out.append((streams, timer))
            return out
        if coeffs is None or orderp is None:
            coeffs, orderp, _ = self.transform(frames)
        from raht3dgs_tpu.models.pipeline import (
            _fetch_stats,
            _finish_fetch,
            _narrow_fetch_enabled,
            _start_fetch,
        )

        narrow = _narrow_fetch_enabled()
        # phase 1: dispatch the whole sweep (async); the reorder gather is
        # hoisted — one gather serves every step (bitwise-commuting split,
        # parallel/sharding.batched_reorder_T)
        from raht3dgs_tpu.parallel.sharding import (
            batched_quant_T,
            batched_reorder_T,
        )

        coeffs_T = batched_reorder_T(coeffs, orderp)
        pend = []
        qf = jnp.asarray(self.quant_f, dtype=self.dtype)
        for s in steps_list:
            sa = jnp.atleast_1d(jnp.asarray(s, dtype=self.dtype))
            q = batched_quant_T(coeffs_T, sa, self.quant_mode, qf)
            pend.append((s, q, _fetch_stats(q) if narrow else None))
        # phase 2+3 interleaved under a bounded fetch window (see
        # pipeline.encode_sweep — unbounded queues can thrash the
        # transfer path; RAHT3DGS_FETCH_WINDOW=0 restores them)
        from raht3dgs_tpu.models.pipeline import _fetch_window

        window = _fetch_window(len(pend))
        out: List[Tuple[List[FrameStream], StageTimer]] = []
        bufs: List[tuple] = []
        i = 0
        while len(out) < len(pend):
            while len(bufs) < window and i < len(pend):
                s, q, st = pend[i]
                bufs.append(
                    (s, _start_fetch(q, np.asarray(st) if st is not None
                                     else None))
                )
                i += 1
            s, p = bufs.pop(0)
            timer = StageTimer()
            q_np = timer.time("Quant_time", lambda p=p: _finish_fetch(p))
            streams, enc_ns = self._entropy_streams(q_np, frames, s)
            timer.add("Entropy_enc_time", enc_ns / 1e9)
            out.append((streams, timer))
        return out

    def inverse_order(self, frames: Sequence[VoxelFrame], order_mode=None):
        """Step-independent decode-side stream->transform permutation,
        reusable across a sweep (``decode(..., inv=...)``)."""
        codes, _, weights = self._stack(frames)
        nvox = jnp.asarray([f.n_voxels for f in frames], dtype=jnp.int32)
        return batched_inverse_order(
            codes, weights, nvox, self.depth, order_mode or self.order_mode
        )

    def decode(
        self,
        streams: Sequence[FrameStream],
        frames: Sequence[VoxelFrame],
        timer: Optional[StageTimer] = None,
        inv=None,
    ) -> Tuple[List[np.ndarray], StageTimer]:
        """Decode a batch; frames supply the (losslessly known) positions.

        ``inv``: optional precomputed :meth:`inverse_order` result — it
        only depends on the frame geometry/order mode, so sweeps compute
        it once instead of once per step."""
        timer = timer or StageTimer()
        for s in streams:
            if s.inter:
                raise ValueError(
                    "inter (predicted) streams hold residuals — decode "
                    "them through SequenceCodec (models/temporal.py), "
                    "which chains the predictions"
                )
        if any(s.predict for s in streams):
            if not all(s.predict for s in streams):
                raise ValueError(
                    "batched decode requires a homogeneous transform mode "
                    "— these streams mix predicted and plain RAHT; decode "
                    "them frame by frame (AttributeCodec.decode)"
                )
            # predicted streams decode through the host closed loop (flag-
            # driven, per frame); results are identical to the single-
            # frame path
            from raht3dgs_tpu.models.pipeline import AttributeCodec

            codec = self._frame_codec or AttributeCodec(
                self.depth, dtype=self.dtype, order_mode=self.order_mode,
                chunk=self.chunk,
            )
            out = []
            for s, f in zip(streams, frames):
                rec, _ = codec.decode(s, f.codes, f.weights, timer=timer)
                out.append(rec)
            return out, timer
        # the batched device path dequantizes the whole stack with ONE step
        # vector and one order mode: mixed-parameter streams would silently
        # reconstruct with the wrong steps
        for s in streams[1:]:
            if (
                not np.array_equal(s.steps, streams[0].steps)
                or s.order_mode != streams[0].order_mode
                or s.quant_mode != streams[0].quant_mode
                or s.rec_delta != streams[0].rec_delta
            ):
                raise ValueError(
                    "batched decode requires homogeneous steps/order_mode/"
                    "quantizer across streams — decode mixed streams frame "
                    "by frame (AttributeCodec.decode)"
                )
        codes, _, weights = self._stack(frames)
        if inv is None:
            nvox = jnp.asarray([f.n_voxels for f in frames], dtype=jnp.int32)
            inv_b = timer.time(
                "Coeff_reorder_dec_time",
                batched_inverse_order,
                codes, weights, nvox, self.depth, streams[0].order_mode,
            )
        else:
            inv_b = inv
            timer.add("Coeff_reorder_dec_time", 0.0)

        B = len(frames)
        N = frames[0].codes.shape[0]
        D = streams[0].n_channels
        from raht3dgs_tpu.models.pipeline import decode_entropy_channels

        qfull = np.zeros((B, D, N), dtype=np.int32)
        dec_ns = 0
        for i, (s, f) in enumerate(zip(streams, frames)):
            _, ns = decode_entropy_channels(s, s.n_voxels, qfull[i])
            dec_ns += ns
        timer.add("Entropy_dec_time", dec_ns / 1e9)

        steps = jnp.asarray(
            streams[0].steps if streams[0].steps.shape[0] > 1
            else streams[0].steps[0],
            dtype=self.dtype,
        )
        from raht3dgs_tpu.models.pipeline import (
            pack_quantized_upload,
            upload_quantized,
        )

        rec = timer.time(
            "iRAHT_time",
            batched_decode_step,
            codes, weights, upload_quantized(pack_quantized_upload(qfull)),
            inv_b, steps, self.depth, self.dtype,
            streams[0].quant_mode,
            jnp.asarray(streams[0].rec_delta, dtype=self.dtype),
        )
        rec_np = np.asarray(rec)
        return [rec_np[i][: f.n_voxels] for i, f in enumerate(frames)], timer
