"""3DGS 56-channel attribute codec (reference: python/encode_3dgs.py).

RD sweep over the full Gaussian payload [quats(4), scales(3), opacity(1),
SH colors(48)] on a voxelized scene: RAHT over all 56 channels at once,
uniform or per-attribute-group quantization (the research variant of
``encode_3dgs_debug.py:328-381``), per-channel RLGR, full decode, overall +
per-group PSNR, and the reference's 19-column CSV schema.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from raht3dgs_tpu.eval.metrics import gs_group_psnr
from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    EncodedFrame,
    prepare_voxel_frame,
)
from raht3dgs_tpu.ops.quantize import channel_steps
from raht3dgs_tpu.utils.timing import StageTimer

# Reference operating points (encode_3dgs.py:30-32).
DEFAULT_DEPTH = 10
DEFAULT_STEPS = (1, 4, 8, 12, 16, 20, 24, 32, 64)

# Reference 19-column CSV schema (encode_3dgs.py:70-76).
CSV_HEADER = (
    "Frame,Quantization_Step,Rate_bpp,"
    "RAHT_prelude_time,RAHT_transform_time,Quant_time,"
    "Coeff_reorder_enc_time,Entropy_enc_time,"
    "Entropy_dec_time,Dequant_time,"
    "Coeff_reorder_dec_time,iRAHT_time,"
    "Total_enc_time,Total_dec_time,Pipeline_time,"
    "PSNR_all,PSNR_quats,PSNR_scales,PSNR_opacity,PSNR_colors"
)


@dataclass
class GsRDPoint:
    frame: int
    step: float
    bpp: float
    psnr: Dict[str, float]
    n_voxels: int
    stream_bytes: int
    times: dict = field(default_factory=dict)
    encoded: Optional[EncodedFrame] = None

    def csv_row(self) -> str:
        t = self.times
        enc = (
            t.get("RAHT_transform_time", 0.0)
            + t.get("Quant_time", 0.0)
            + t.get("Entropy_enc_time", 0.0)
        )
        dec = (
            t.get("Entropy_dec_time", 0.0)
            + t.get("Dequant_time", 0.0)
            + t.get("Coeff_reorder_dec_time", 0.0)
            + t.get("iRAHT_time", 0.0)
        )
        pipeline = t.get("RAHT_prelude_time", 0.0) + enc + dec
        return (
            f"{self.frame},{self.step:g},{self.bpp:.6f},"
            f"{t.get('RAHT_prelude_time', 0.0):.6f},"
            f"{t.get('RAHT_transform_time', 0.0):.6f},"
            f"{t.get('Quant_time', 0.0):.6f},"
            f"0.000000,"  # reorder fused into Quant (device) — kept for schema
            f"{t.get('Entropy_enc_time', 0.0):.6f},"
            f"{t.get('Entropy_dec_time', 0.0):.6f},"
            f"{t.get('Dequant_time', 0.0):.6f},"
            f"{t.get('Coeff_reorder_dec_time', 0.0):.6f},"
            f"{t.get('iRAHT_time', 0.0):.6f},"
            f"{enc:.6f},{dec:.6f},{pipeline:.6f},"
            f"{self.psnr['psnr_all']:.6f},{self.psnr['psnr_quats']:.6f},"
            f"{self.psnr['psnr_scales']:.6f},{self.psnr['psnr_opacity']:.6f},"
            f"{self.psnr['psnr_colors']:.6f}"
        )


def encode_gs_frame(
    V_int: np.ndarray,
    attributes: np.ndarray,
    depth: int = DEFAULT_DEPTH,
    steps: Sequence[float] = DEFAULT_STEPS,
    group_step_scales: Optional[Dict[str, float]] = None,
    frame_index: int = 1,
    codec: Optional[AttributeCodec] = None,
    bucket: int = 1 << 13,
    dtype=jnp.float64,
    vmin: Optional[np.ndarray] = None,
    width: Optional[float] = None,
    keep_streams: bool = False,
) -> List[GsRDPoint]:
    """RD sweep over a voxelized 3DGS payload.

    ``attributes``: (N, 56) packed [quats, scales, opacity, colors].
    ``group_step_scales``: optional per-attribute-group multipliers applied
    to each sweep step (per-attribute quantization, the
    ``encode_3dgs_debug`` strategy); None = uniform steps.
    """
    timer = StageTimer()
    t0 = time.perf_counter()
    frame = prepare_voxel_frame(
        V_int, np.asarray(attributes, dtype=np.float64), depth,
        bucket=bucket, dtype=dtype, vmin=vmin, width=width,
    )
    timer.add("RAHT_prelude_time", time.perf_counter() - t0)

    codec = codec or AttributeCodec(depth, dtype=dtype)
    if codec.predict:
        # predicted transform: the closed loop runs inside encode_sweep;
        # no device coefficients to hoist across steps
        coeffs = order = None
    else:
        coeffs, order, structure, timer = codec.transform(frame, timer)
    ref_sorted = np.asarray(frame.attributes)[: frame.n_voxels]
    D = attributes.shape[1]

    points: List[GsRDPoint] = []
    step_vecs = []
    for step in steps:
        if group_step_scales:
            step_vecs.append(channel_steps(
                D, float(step),
                {k: float(step) * s for k, s in group_step_scales.items()},
            ))
        else:
            step_vecs.append(float(step))
    # pipelined sweep: byte-identical to per-step encode, host entropy
    # overlaps device work/fetches (AttributeCodec.encode_sweep)
    sweep = codec.encode_sweep(frame, step_vecs, coeffs=coeffs, order=order)
    for step, enc in zip(steps, sweep):
        st = enc.timer
        for k, v in timer.stages.items():
            st.add(k, v)
        rec, st = codec.decode(enc.stream, frame.codes, frame.weights, timer=st)
        psnr = gs_group_psnr(ref_sorted, rec)
        points.append(
            GsRDPoint(
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
