"""Serving-path demo: compressed stream -> decode -> render, on-device.

The serving consumer of a 3DGS codec is a renderer, so the decoded
attributes should never leave the chip: host RLGR decode -> one upload of
the quantized channel matrix -> dequant + inverse RAHT + EWA rasterization
in ONE jitted program -> fetch only the rendered image.

Per-frame wall is reported in three pieces (host entropy / device program
incl. upload / image fetch); in this environment the upload rides the
~20-50 MB/s tunnel — a local TPU host pays ~none of that.
"""

import json
import sys
import time

import os

import jax

if os.environ.get("RAHT3DGS_SERVING_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RAHT3DGS_SERVING_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from functools import partial

from raht3dgs_tpu.codec.rlgr import rlgr_decode_channels
from raht3dgs_tpu.eval.rasterize import _rasterize_tiled
from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    _dequant_gather_device,
    _inverse_order_device,
    prepare_voxel_frame,
)
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.prelude import morton_codes_np
from raht3dgs_tpu.ops.raht_span import raht_inverse_span

DEPTH = 10
N = int(os.environ.get("RAHT3DGS_SERVING_N", 131_072))
SIZE = int(os.environ.get("RAHT3DGS_SERVING_SIZE", 512))
STEP = 0.002  # fine enough for the scale channels (0.002-0.01 world units)


# Two device programs (not one fused): both shapes match programs the
# persistent cache already holds from the codec and rasterizer benches, so
# the demo compiles nothing new on the shared TPU. A production deployment
# would fuse them (one dispatch) and pay the one-time compile.


@partial(jax.jit, static_argnames=("depth",))
def decode_scene(vals_T, inv, steps, codes, weights, voxel_size, vmin,
                 *, depth):
    """Quantized channel matrix -> reconstructed 3DGS scene, on device."""
    coeffs = _dequant_gather_device(vals_T, inv, steps, jnp.float32)
    attrs = raht_inverse_span(coeffs, codes, weights, depth)
    means = (
        morton_decode(codes, depth).astype(jnp.float32) + 0.5
    ) * voxel_size + vmin[None, :]
    quats = attrs[:, 0:4]
    scales = jnp.maximum(attrs[:, 4:7], 1e-5)
    opac = jnp.clip(attrs[:, 7], 0.0, 1.0) * (weights > 0)
    colors = attrs[:, 8:].reshape(attrs.shape[0], -1, 3)
    return means, quats, scales, opac, colors


def render_scene(scene, viewmat, Kmat, bg, width, height):
    means, quats, scales, opac, colors = scene
    return _rasterize_tiled(
        means, quats, scales, opac, colors, viewmat, Kmat, bg,
        width=width, height=height, sh_degree=3, tile=16,
        max_tiles_per_gauss=16, max_per_tile=8192, chunk=128,
    )


def main():
    rng = np.random.default_rng(0)
    # surface-like scene (unit-ish shell): realistic splat depth complexity
    # — a uniform volume at this density overflows any per-tile budget
    dirs = rng.normal(size=(6 * N, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = 1.0 + rng.normal(0, 0.02, (6 * N, 1))
    shell = (dirs * r * 0.45 + 0.5) * 2**DEPTH
    pts = np.clip(shell.astype(np.int64), 0, 2**DEPTH - 1)
    codes = np.unique(morton_codes_np(pts, DEPTH))[:N]
    pos = np.asarray(morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    attrs = np.concatenate(
        [
            rng.normal(size=(N, 4)),                      # quats
            rng.uniform(0.002, 0.01, (N, 3)),             # scales
            rng.uniform(0.3, 1.0, (N, 1)),                # opacity
            rng.normal(0, 0.3, (N, 48)),                  # SH colors
        ],
        axis=1,
    ).astype(np.float32)
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)

    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    frame = prepare_voxel_frame(pos, attrs, DEPTH, bucket=max(N, 1),
                                dtype=jnp.float32)
    enc = codec.encode(frame, STEP)
    stream = enc.stream
    n_padded = frame.codes.shape[0]

    voxel_size = jnp.float32(2.0 / 2**DEPTH)
    vmin = jnp.asarray([-1.0, -1.0, -1.0], jnp.float32)
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[2, 3] = 3.0
    K = np.array([[1.2 * SIZE, 0, SIZE / 2], [0, 1.2 * SIZE, SIZE / 2],
                  [0, 0, 1]], np.float32)
    bg = jnp.ones((3,), jnp.float32)
    inv = _inverse_order_device(frame.codes, frame.weights,
                                jnp.int32(stream.n_voxels), DEPTH,
                                stream.order_mode)
    steps = jnp.float32(STEP)

    def serve_once():
        t0 = time.perf_counter()
        vals_T = np.zeros((stream.n_channels, n_padded), dtype=np.int32)
        rlgr_decode_channels(stream.channels, stream.n_voxels, out=vals_T,
                             chunk=stream.chunk)
        t_ent = time.perf_counter() - t0
        t0 = time.perf_counter()
        scene = decode_scene(
            jnp.asarray(vals_T), inv, steps, frame.codes, frame.weights,
            voxel_size, vmin, depth=DEPTH,
        )
        img, meta = render_scene(
            scene, jnp.asarray(viewmat), jnp.asarray(K), bg, SIZE, SIZE
        )
        float(img[0, 0, 0])
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        image = np.asarray(img)
        t_fetch = time.perf_counter() - t0
        return t_ent, t_dev, t_fetch, image, meta

    serve_once()  # warm/compile
    rows = [serve_once() for _ in range(3)]
    t_ent = min(r[0] for r in rows)
    t_dev = min(r[1] for r in rows)
    t_fetch = min(r[2] for r in rows)
    total = t_ent + t_dev + t_fetch
    image = rows[-1][3]
    meta = rows[-1][4]
    assert int(meta.dup_clipped) == 0 and int(meta.tile_clipped) == 0, (
        "rasterizer capacity overflow — the timed image is incomplete"
    )
    assert image.std() > 0.01, "blank render"
    print(json.dumps({
        "n_voxels": stream.n_voxels,
        "bytes": sum(len(c) for c in stream.channels),
        "entropy_ms": round(t_ent * 1e3, 1),
        "device_ms_incl_upload": round(t_dev * 1e3, 1),
        "image_fetch_ms": round(t_fetch * 1e3, 1),
        "total_ms": round(total * 1e3, 1),
        "fps": round(1.0 / total, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
