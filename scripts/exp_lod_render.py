"""LOD serving study: decode the frame at several octree depths, render.

Builds the serving shell scene (exp_serving.py's 131k-voxel 56-channel
frame at J=10), encodes it, then for each LOD level decodes the matching
stream prefix (`AttributeCodec.decode_lod`) and renders V views with the
volumetric rasterizer — measuring splat count, the decoded coefficient
fraction, render ms/view (burst, last-only fetch), and image PSNR vs the
full-resolution render. Coarse splats inflate their scales by the cell
factor 2^(J-L) (display heuristic: merged scales are leaf means, which
understate the cell footprint).

Env: RAHT3DGS_LOD_N, RAHT3DGS_LOD_SIZE, RAHT3DGS_LOD_VIEWS,
RAHT3DGS_LOD_LEVELS (comma list), RAHT3DGS_LOD_PLATFORM.
"""

import json
import os
import sys
import time

import jax

if os.environ.get("RAHT3DGS_LOD_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RAHT3DGS_LOD_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raht3dgs_tpu.eval.cameras import generate_random_cameras
from raht3dgs_tpu.eval.metrics import image_psnr
from raht3dgs_tpu.eval.rasterize import rasterize_gaussians
from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    lod_prefix_count,
    prepare_voxel_frame,
    progressive_prefix_bytes,
)
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.prelude import morton_codes_np

DEPTH = 10
N = int(os.environ.get("RAHT3DGS_LOD_N", 131_072))
SIZE = int(os.environ.get("RAHT3DGS_LOD_SIZE", 512))
VIEWS = int(os.environ.get("RAHT3DGS_LOD_VIEWS", 4))
LEVELS = [int(x) for x in
          os.environ.get("RAHT3DGS_LOD_LEVELS", "10,8,7,6").split(",")]
STEP = 0.002
RASTER = dict(sh_degree=3, tile=16, max_tiles_per_gauss=16,
              max_per_tile=8192, chunk=128)


def build_frame():
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(6 * N, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = 1.0 + rng.normal(0, 0.02, (6 * N, 1))
    shell = (dirs * r * 0.45 + 0.5) * 2**DEPTH
    pts = np.clip(shell.astype(np.int64), 0, 2**DEPTH - 1)
    codes = np.unique(morton_codes_np(pts, DEPTH))[:N]
    pos = np.asarray(morton_decode(jnp.asarray(codes.astype(np.int32)),
                                   DEPTH))
    n = len(codes)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.002, 0.01, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    ).astype(np.float32)
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)
    # chunked entropy: makes the LOD prefixes byte-addressable
    codec = AttributeCodec(DEPTH, dtype=jnp.float32, chunk=8192)
    frame = prepare_voxel_frame(pos, attrs, DEPTH, bucket=max(n, 1),
                                dtype=jnp.float32)
    enc = codec.encode(frame, STEP)
    return codec, frame, enc.stream


def splats_from(attrs, pos_int, lod):
    """World-space splats from (cell) voxel coords + 56ch attributes."""
    voxel_size = 2.0 / 2**lod
    means = (pos_int.astype(np.float64) + 0.5) * voxel_size - 1.0
    quats = attrs[:, 0:4]
    nq = np.linalg.norm(quats, axis=1, keepdims=True)
    quats = np.where(nq > 1e-8, quats / np.maximum(nq, 1e-8),
                     np.array([[1.0, 0, 0, 0]]))
    # display heuristic: grow merged scales with the cell size
    scale_f = 2.0 ** (DEPTH - lod)
    scales = np.abs(attrs[:, 4:7]) * scale_f
    opac = np.clip(attrs[:, 7], 0.0, 1.0)
    colors = attrs[:, 8:]
    return [jnp.asarray(a, jnp.float32)
            for a in (means, quats, scales, opac, colors)]


def main():
    codec, frame, stream = build_frame()
    nvox = stream.n_voxels
    codes_np = np.asarray(frame.codes)[:nvox]
    viewmats, Ks, _, _ = generate_random_cameras(
        np.zeros(3), 3.0, n_views=VIEWS, image_width=SIZE,
        image_height=SIZE, seed=1,
    )
    bg = np.ones(3, np.float32)
    full_imgs = None
    total_bytes = sum(len(s) for s in stream.channels)

    for lod in LEVELS:
        if lod >= DEPTH:
            rec, _ = codec.decode(stream, frame.codes, frame.weights)
            pos_int = np.asarray(
                morton_decode(jnp.asarray(codes_np.astype(np.int64)), DEPTH)
            )
            k = nvox
        else:
            pos_int, rec, _ = codec.decode_lod(
                stream, frame.codes, frame.weights, lod
            )
            k = lod_prefix_count(codes_np, DEPTH, lod)
        sp = splats_from(rec, pos_int, min(lod, DEPTH))

        imgs, times = [], []
        for v in range(VIEWS):
            vm = jnp.asarray(viewmats[v], jnp.float32)
            km = jnp.asarray(Ks[v], jnp.float32)
            img, _ = rasterize_gaussians(
                *sp, vm, km, SIZE, SIZE, background=bg, **RASTER
            )  # warm + keep
            imgs.append(np.asarray(img))
        # burst timing on view 0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [rasterize_gaussians(
                *sp, jnp.asarray(viewmats[v % VIEWS], jnp.float32),
                jnp.asarray(Ks[v % VIEWS], jnp.float32), SIZE, SIZE,
                background=bg, **RASTER)[0] for v in range(4)]
            float(np.asarray(outs[-1])[0, 0, 0])
            times.append((time.perf_counter() - t0) / 4)

        if full_imgs is None:
            full_imgs = imgs
            psnr = float("inf")
        else:
            psnr = float(np.mean([
                image_psnr(a, b) for a, b in zip(imgs, full_imgs)
            ]))
        print(json.dumps({
            "lod": lod, "splats": int(len(pos_int)),
            "coeff_frac": round(k / nvox, 4),
            "ms_per_view": round(min(times) * 1e3, 1),
            "psnr_vs_full": round(psnr, 2) if np.isfinite(psnr) else None,
            "prefix_bytes": progressive_prefix_bytes(stream, k),
            "total_bytes": total_bytes,
        }), flush=True)


if __name__ == "__main__":
    main()
