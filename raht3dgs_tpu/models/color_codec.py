"""Color point-cloud codec: the encode_ply / encode_dataset workload.

Reimplements the reference's canonical path
(``/root/reference/python/encode_ply.py:102-222``): RGB->YUV (BT.709),
RAHT, uniform quantization sweep, RA-GFT reorder, per-channel RLGR, full
decode, Y-PSNR vs the 255 peak and bpp logging — as a reusable function over
the TPU pipeline instead of a script with module-level constants.

Rate metric: payload bytes * 8 / Nvox. Distortion: Y-channel PSNR computed
in the coefficient domain (the transform is orthonormal, so coefficient MSE
equals signal MSE — same trick as ``encode_ply.py:150-152``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    EncodedFrame,
    prepare_voxel_frame,
)
from raht3dgs_tpu.ops.color import rgb_to_yuv
from raht3dgs_tpu.utils.timing import StageTimer

# Reference RD operating points (encode_ply.py:27-29).
from raht3dgs_tpu.config import ColorCodecConfig as _CCC

DEFAULT_DEPTH = _CCC.depth
DEFAULT_STEPS = _CCC.steps

# Reference 11-column CSV schema (encode_ply.py:57) — kept verbatim so the
# reporting scripts consume our logs unchanged.
CSV_HEADER = (
    "Frame,Quantization_Step,Rate_bpp,RAHT_prelude_time,RAHT_transform_time,"
    "Quant_time,Entropy_enc_time,Entropy_dec_time,Dequant_time,iRAHT_time,psnr"
)


@dataclass
class RDPoint:
    frame: int
    step: float
    bpp: float
    psnr: float
    n_voxels: int
    stream_bytes: int
    times: dict = field(default_factory=dict)
    encoded: Optional[EncodedFrame] = None

    def csv_row(self) -> str:
        t = self.times
        return (
            f"{self.frame},{self.step:g},{self.bpp:.6f},"
            f"{t.get('RAHT_prelude_time', 0.0):.6f},"
            f"{t.get('RAHT_transform_time', 0.0):.6f},"
            f"{t.get('Quant_time', 0.0):.6f},"
            f"{t.get('Entropy_enc_time', 0.0):.6f},"
            f"{t.get('Entropy_dec_time', 0.0):.6f},"
            # 11-col reference schema has no decode-reorder column: fold it
            # into Dequant (both are decode-side coefficient prep)
            f"{t.get('Dequant_time', 0.0) + t.get('Coeff_reorder_dec_time', 0.0):.6f},"
            f"{t.get('iRAHT_time', 0.0):.6f},"
            f"{self.psnr:.6f}"
        )


def y_psnr_db(y_ref: np.ndarray, y_rec: np.ndarray) -> float:
    """Y-channel PSNR against the 255 peak (encode_ply.py:151-152)."""
    mse = float(np.mean((np.asarray(y_ref) - np.asarray(y_rec)) ** 2)) / 255.0**2
    if mse == 0:
        return float("inf")
    return -10.0 * np.log10(mse)


def encode_color_frame(
    V: np.ndarray,
    C_rgb: np.ndarray,
    depth: int = DEFAULT_DEPTH,
    steps: Sequence[float] = DEFAULT_STEPS,
    frame_index: int = 1,
    codec: Optional[AttributeCodec] = None,
    bucket: int = 1 << 13,
    dtype=jnp.float64,
    decode: bool = True,
    keep_streams: bool = False,
) -> List[RDPoint]:
    """Run the full RD sweep on one frame. Returns one RDPoint per step.

    ``V`` are integer voxel-grid positions (the reference's PLY inputs are
    pre-voxelized; origin 0, width ``2**depth`` — ``encode_ply.py:113-115``).
    The transform is computed once and reused across quantization steps,
    exactly like the reference sweep.
    """
    timer = StageTimer()
    t0 = time.perf_counter()
    codec = codec or AttributeCodec(depth, dtype=dtype)
    if codec.impl == "golden":
        # byte-parity mode: the reference's exact homogeneous YUV form
        from raht3dgs_tpu.ops.color import rgb_to_yuv_parity

        yuv = rgb_to_yuv_parity(np.asarray(C_rgb))
    else:
        yuv = np.asarray(rgb_to_yuv(jnp.asarray(np.asarray(C_rgb)), dtype=dtype))
    frame = prepare_voxel_frame(
        np.floor(np.asarray(V)).astype(np.int64),
        yuv,
        depth,
        bucket=bucket,
        dtype=dtype,
    )
    timer.add("RAHT_prelude_time", time.perf_counter() - t0)

    if codec.predict:
        # the predicted transform runs its own closed loop inside
        # encode_sweep; there is no device coefficient array to hoist,
        # and the coefficient-domain PSNR shortcut does not apply
        if not decode:
            raise ValueError(
                "decode=False uses the coefficient-domain PSNR shortcut, "
                "which does not exist for the predicted transform"
            )
        coeffs = order = None
    else:
        coeffs, order, structure, timer = codec.transform(frame, timer)
    # coefficient fetch only on the coeff-domain-PSNR path (decode=False):
    # on the default path it is a pointless blocking device->host transfer
    coeffs_np = None if decode else np.asarray(coeffs)[: frame.n_voxels]
    # Reference signal in the codec's (Morton-sorted) order.
    yuv_sorted = np.asarray(frame.attributes)[: frame.n_voxels]

    points: List[RDPoint] = []
    # pipelined sweep: every step's device program dispatches up front and
    # the host drains entropy behind the async fetches — byte-identical to
    # per-step encode (AttributeCodec.encode_sweep)
    sweep = codec.encode_sweep(
        frame, [float(s) for s in steps], coeffs=coeffs, order=order
    )
    for step, enc in zip(steps, sweep):
        st = enc.timer
        for k, v in timer.stages.items():  # shared per-frame stage costs
            st.add(k, v)
        if decode:
            rec, st = codec.decode(enc.stream, frame.codes, frame.weights, timer=st)
            # PSNR in signal domain on the decoded Y channel.
            psnr = y_psnr_db(yuv_sorted[:, 0], rec[:, 0])
        else:
            # Coefficient-domain shortcut (orthonormal transform).
            q = np.floor(coeffs_np[:, 0] / step + 0.5)
            psnr = y_psnr_db(coeffs_np[:, 0], q * step)
        points.append(
            RDPoint(
                frame=frame_index,
                step=float(step),
                bpp=enc.stream.bpp(),
                psnr=psnr,
                n_voxels=frame.n_voxels,
                stream_bytes=enc.stream.payload_bytes,
                times=dict(st.stages),
                encoded=enc if keep_streams else None,
            )
        )
    return points
