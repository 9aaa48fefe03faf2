#!/usr/bin/env python3
"""Tiled serving experiment: frustum-culled .r3tt serve vs monolithic.

The serving shape tiles exist for: a viewer near the surface sees a CAP
of the scene, so a tiled frame lets the server entropy-decode, upload
and inverse-transform only the visible bricks — O(visible) host work
and wire bytes — where the monolithic stream pays O(frame) regardless
of the view. Same shell scene as exp_serving.py, brick depth
RAHT3DGS_TILED_BRICKS (default 2), a close-up camera looking at a
surface patch.

Reports, per configuration: stream bytes a receiver fetches, host
entropy ms, device+render ms (one wall — the tiled path interleaves
per-brick uploads/dispatches), image fetch ms, and the rendered-image
agreement between the two paths (the tiled reconstruction differs from
monolithic only by per-brick DC quantization).

Env: RAHT3DGS_SERVING_N, RAHT3DGS_SERVING_SIZE, RAHT3DGS_SERVING_VIEWS,
RAHT3DGS_TILED_BRICKS, RAHT3DGS_SERVING_PLATFORM, RAHT3DGS_TILED_MARGIN.
"""

import json
import os
import sys
import time

import jax

if os.environ.get("RAHT3DGS_SERVING_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RAHT3DGS_SERVING_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raht3dgs_tpu.eval.cameras import look_at_w2c
from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    decode_entropy_channels,
    prepare_voxel_frame,
)
from raht3dgs_tpu.models.serving import (
    build_inverse_order,
    pack_quantized_upload,
    serve_frame,
    serve_tiled_frame,
    upload_quantized,
)
from raht3dgs_tpu.models.tiling import TiledReader, encode_tiled_frame
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.prelude import morton_codes_np

DEPTH = 10
N = int(os.environ.get("RAHT3DGS_SERVING_N", 131_072))
SIZE = int(os.environ.get("RAHT3DGS_SERVING_SIZE", 512))
VIEWS = int(os.environ.get("RAHT3DGS_SERVING_VIEWS", 4))
BRICKS = int(os.environ.get("RAHT3DGS_TILED_BRICKS", 2))
MARGIN = float(os.environ.get("RAHT3DGS_TILED_MARGIN", 0.05))
STEP = 0.002
RASTER = dict(sh_degree=3, tile=16, max_tiles_per_gauss=16,
              max_per_tile=8192, chunk=128)


def build_scene():
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
    )
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)
    return pos, attrs


def close_up_cameras(v):
    """Cameras hovering near the +z surface patch, looking outward at it."""
    f = 1.2 * SIZE
    K = np.array([[f, 0, SIZE / 2], [0, f, SIZE / 2], [0, 0, 1.0]])
    vms = []
    for i in range(v):
        ang = 0.15 * i
        eye = np.array([0.25 * np.sin(ang), 0.25 * np.cos(ang), 0.35])
        target = np.array([0.1 * np.sin(ang), 0.1 * np.cos(ang), 0.95])
        vms.append(look_at_w2c(eye, target))
    return np.stack(vms), np.repeat(K[None], v, axis=0)


def main():
    pos, attrs = build_scene()
    n = len(pos)
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    vmin = np.array([-1.0, -1.0, -1.0])
    blob, stats = encode_tiled_frame(
        pos, attrs, DEPTH, BRICKS, codec, STEP, code_geometry=False,
        vmin=vmin, width=2.0,
    )
    reader = TiledReader(blob)
    vms, Kms = close_up_cameras(VIEWS)
    bg = jnp.ones((3,), jnp.float32)

    # ---- monolithic baseline (fused serve_frame)
    frame = prepare_voxel_frame(pos, attrs, DEPTH, bucket=max(n, 1),
                                dtype=jnp.float32)
    enc = codec.encode(frame, STEP)
    stream = enc.stream
    mono_bytes = len(stream.to_bytes())
    inv = build_inverse_order(frame.codes, frame.weights,
                              jnp.int32(stream.n_voxels), DEPTH,
                              stream.order_mode)

    def mono():
        t0 = time.perf_counter()
        vals_T = np.zeros((stream.n_channels, frame.codes.shape[0]),
                          dtype=np.int32)
        decode_entropy_channels(stream, stream.n_voxels, vals_T)
        t_ent = time.perf_counter() - t0
        t0 = time.perf_counter()
        imgs, dups, tiles = serve_frame(
            upload_quantized(pack_quantized_upload(vals_T)), inv,
            jnp.float32(STEP), frame.codes, frame.weights,
            jnp.float32(2.0 / 2**DEPTH), jnp.asarray(vmin, jnp.float32),
            jnp.asarray(vms, jnp.float32), jnp.asarray(Kms, jnp.float32),
            bg, depth=DEPTH, width=SIZE, height=SIZE, **RASTER,
        )
        float(imgs[0, 0, 0, 0])
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        images = np.asarray(imgs)
        t_fetch = time.perf_counter() - t0
        return t_ent, t_dev, t_fetch, images

    # ---- tiled frustum-culled serve
    def tiled():
        t0 = time.perf_counter()
        imgs, dups, tiles, sel = serve_tiled_frame(
            reader, vms, Kms, bg, width=SIZE, height=SIZE,
            positions=pos, bucket=1 << 11, margin=MARGIN, **RASTER,
        )
        float(imgs[0, 0, 0, 0])
        t_serve = time.perf_counter() - t0
        t0 = time.perf_counter()
        images = np.asarray(imgs)
        t_fetch = time.perf_counter() - t0
        return t_serve, t_fetch, images, sel

    mono()  # compile
    t_serve, t_fetch_t, imgs_t, sel = tiled()  # compile
    best_m = min((mono() for _ in range(3)), key=lambda r: r[0] + r[1])
    t_serve = min(tiled()[0] for _ in range(2))
    t_ent_m, t_dev_m, t_fetch_m, imgs_m = best_m

    tile_bytes = reader.fixed_bytes + sum(
        reader._offsets[i + 1] - reader._offsets[i] for i in sel)
    sel_vox = sum(stats[i][1] for i in sel)
    # image agreement on the served views (tiled reconstruction differs
    # by per-brick DC quantization only)
    diff = float(np.abs(imgs_t - imgs_m).max())
    rec = {
        "n": n, "views": VIEWS, "size": SIZE, "brick_depth": BRICKS,
        "bricks_total": len(reader), "bricks_served": len(sel),
        "voxels_served": sel_vox,
        "bytes": {"monolithic": mono_bytes, "tiled_total": len(blob),
                  "tiled_fetched": int(tile_bytes),
                  "fetch_fraction": round(tile_bytes / len(blob), 4)},
        "ms": {
            "mono_host_entropy": round(t_ent_m * 1e3, 1),
            "mono_device_render": round(t_dev_m * 1e3, 1),
            "mono_image_fetch": round(t_fetch_m * 1e3, 1),
            "tiled_serve": round(t_serve * 1e3, 1),
            "tiled_image_fetch": round(t_fetch_t * 1e3, 1),
        },
        "max_image_diff": diff,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
