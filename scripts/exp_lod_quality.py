"""LOD quality ladder on scan-like vs noise-texture content.

Round-3 roadmap item 7: the LOD rate ladder's PSNR is only meaningful on
spatially correlated content — the serving shell's random per-voxel SH
floors it regardless of level. This study measures the attribute-LOD
quality/rate trade on the articulated body scan
(``eval/synth.synthetic_body_scan`` — 8iVFBv2-like occupancy, per-part
base color + lambertian shading + persistent fine texture) against the
shell color frame (``synthetic_color_frame`` — angular texture on a
noisy sphere), both through the REAL codec:

- encode once (chunked entropy so ``progressive_prefix_bytes`` is exact);
- per LOD level L: ``decode_lod`` (exact cell means from the matching
  stream prefix), upsample each voxel to its cell row, Y-PSNR vs the
  ORIGINAL full-resolution YUV (peak 255, the encode_ply definition);
- report the byte fraction of the prefix and the cells/voxels ratio.

Env: RAHT3DGS_LODQ_DEPTH (default 9), RAHT3DGS_LODQ_STEP (default 4),
RAHT3DGS_LODQ_LEVELS (comma list; default 3..depth),
RAHT3DGS_LODQ_PLATFORM (default cpu — host study, no TPU needed).
"""

import json
import os
import sys

import jax

jax.config.update(
    "jax_platforms", os.environ.get("RAHT3DGS_LODQ_PLATFORM", "cpu")
)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raht3dgs_tpu.eval.synth import synthetic_body_scan, synthetic_color_frame
from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    lod_prefix_count,
    prepare_voxel_frame,
    progressive_prefix_bytes,
)
from raht3dgs_tpu.ops.color import rgb_to_yuv

DEPTH = int(os.environ.get("RAHT3DGS_LODQ_DEPTH", 9))
STEP = float(os.environ.get("RAHT3DGS_LODQ_STEP", 4))
LEVELS = [
    int(x)
    for x in os.environ.get(
        "RAHT3DGS_LODQ_LEVELS", ",".join(str(l) for l in range(3, DEPTH + 1))
    ).split(",")
]


def ypsnr(a, b):
    mse = float(np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2))
    return 10.0 * np.log10(255.0**2 / mse) if mse else float("inf")


def study(name, V, rgb):
    yuv_in = np.asarray(rgb_to_yuv(jnp.asarray(rgb, dtype=jnp.float64)))
    frame = prepare_voxel_frame(V, yuv_in, DEPTH, bucket=1 << 17)
    codec = AttributeCodec(DEPTH, chunk=4096)
    enc = codec.encode(frame, steps=STEP)
    stream = enc.stream
    nvox = stream.n_voxels
    codes_np = np.asarray(frame.codes)[:nvox]
    # ground truth in the frame's (Morton-sorted) row order — the input
    # row order differs for voxelizer outputs like the body scan
    yuv = np.asarray(frame.attributes)[:nvox]
    total = sum(len(s) for s in stream.channels)
    full, _ = codec.decode(stream, frame.codes, frame.weights)
    rows = []
    print(f"\n== {name}: {nvox} voxels at J={DEPTH}, step {STEP}, "
          f"{8 * total / nvox:.2f} bpp, full-decode Y-PSNR "
          f"{ypsnr(full[:, 0], yuv[:, 0]):.2f} dB ==")
    print(f"{'L':>2} {'cells':>8} {'cells%':>7} {'bytes':>9} {'bytes%':>7} "
          f"{'Y-PSNR':>8} {'vs full':>8}")
    for L in LEVELS:
        pos, rec, cw = codec.decode_lod(stream, frame.codes,
                                        frame.weights, L)
        k = lod_prefix_count(codes_np, DEPTH, L)
        nbytes = progressive_prefix_bytes(stream, k)
        shift = 3 * (DEPTH - L)
        coarse = codes_np.astype(np.uint64) >> np.uint64(shift)
        _, inverse = np.unique(coarse, return_inverse=True)
        rec_up = rec[inverse]  # every voxel takes its cell's mean
        p = ypsnr(rec_up[:, 0], yuv[:, 0])
        p_vs_full = ypsnr(rec_up[:, 0], full[:, 0])
        rows.append(
            dict(level=L, cells=len(pos), bytes=nbytes,
                 byte_frac=nbytes / total, ypsnr=p, ypsnr_vs_full=p_vs_full)
        )
        print(f"{L:>2} {len(pos):>8} {100 * len(pos) / nvox:>6.1f}% "
              f"{nbytes:>9} {100 * nbytes / total:>6.1f}% {p:>8.2f} "
              f"{p_vs_full:>8.2f}")
    return dict(content=name, n_voxels=nvox, depth=DEPTH, step=STEP,
                bpp=8 * total / nvox, levels=rows)


def main():
    V_body, rgb_body = synthetic_body_scan(depth=DEPTH, seed=0)[0]
    out = [study("body-scan", V_body, rgb_body)]
    V_sh, rgb_sh = synthetic_color_frame(
        n=len(V_body) * 4, depth=DEPTH, seed=0
    )[:2]
    out.append(study("shell-smooth", V_sh, rgb_sh))
    # the floor case: spatially UNcorrelated colors on the same scan
    # geometry — cell means carry almost no signal at any level
    rng = np.random.default_rng(1)
    out.append(
        study("noise-color", V_body,
              rng.uniform(0, 255, size=(len(V_body), 3)))
    )
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
