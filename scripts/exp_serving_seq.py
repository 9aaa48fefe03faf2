#!/usr/bin/env python3
"""Sequence serving experiment: device-resident .r3ts playback.

Measures streaming playback (models/serving.py:serve_sequence — host
entropy + ONE device program per frame, reconstruction kept on-chip
across inter frames) against the normative replay path (SequenceCodec.
decode_sequence on host closed loop, then upload the reconstruction and
render). The serving path's pitch: per inter frame the wire carries
RESIDUAL symbols + a motion field instead of a full reconstruction, and
the host never touches the attributes.

Scene: the exp_serving.py shell translated by a per-frame integer drift
(rigid motion — the signalled per-block field compensates it), GOP from
the encoder default.

Env: RAHT3DGS_SERVING_N, RAHT3DGS_SERVING_SIZE, RAHT3DGS_SERVING_VIEWS,
RAHT3DGS_SEQ_FRAMES, RAHT3DGS_SERVING_PLATFORM.
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

from raht3dgs_tpu.eval.cameras import generate_random_cameras
from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
from raht3dgs_tpu.models.serving import (
    _render_scene_views,
    _scene_from_attrs,
    serve_sequence,
)
from raht3dgs_tpu.models.temporal import SequenceCodec
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.prelude import morton_codes_np

DEPTH = 10
N = int(os.environ.get("RAHT3DGS_SERVING_N", 131_072))
SIZE = int(os.environ.get("RAHT3DGS_SERVING_SIZE", 512))
VIEWS = int(os.environ.get("RAHT3DGS_SERVING_VIEWS", 4))
FRAMES = int(os.environ.get("RAHT3DGS_SEQ_FRAMES", 6))
STEP = 0.002
BUCKET = 1 << 13
RASTER = dict(sh_degree=3, tile=16, max_tiles_per_gauss=16,
              max_per_tile=8192, chunk=128)


def build_sequence():
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(6 * N, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = 1.0 + rng.normal(0, 0.02, (6 * N, 1))
    shell = (dirs * r * 0.40 + 0.5) * 2**DEPTH
    pts = np.clip(shell.astype(np.int64), 0, 2**DEPTH - 1)
    codes = np.unique(morton_codes_np(pts, DEPTH))[:N]
    base = np.asarray(morton_decode(jnp.asarray(codes.astype(np.int32)),
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
    drift = np.array([3, -2, 1])
    positions = [
        np.clip(base + i * drift, 0, 2**DEPTH - 1) for i in range(FRAMES)
    ]
    return positions, attrs


def main():
    positions, attrs = build_sequence()
    frames = [
        prepare_voxel_frame(p, attrs, DEPTH, bucket=BUCKET,
                            dtype=jnp.float32)
        for p in positions
    ]
    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, dtype=jnp.float32)
    t0 = time.perf_counter()
    streams, _ = sc.encode_sequence(frames, steps=STEP)
    t_enc = time.perf_counter() - t0
    sizes = [len(s.to_bytes()) for s in streams]

    viewmats, Ks, _, _ = generate_random_cameras(
        np.array([512.0, 512.0, 512.0]), 1400.0, n_views=VIEWS,
        image_width=SIZE, image_height=SIZE, seed=3)
    bg = jnp.ones((3,), jnp.float32)

    def play():
        walls = []
        t0 = time.perf_counter()
        for imgs, dups, tiles in serve_sequence(
                streams, viewmats, Ks, bg, width=SIZE, height=SIZE,
                positions=lambda i: positions[i], bucket=BUCKET,
                **RASTER):
            float(imgs[0, 0, 0, 0])  # force this frame's program
            walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
        return walls

    play()  # compile (intra + inter step programs)
    walls = play()
    per_frame = [round(w * 1e3, 1) for w in walls]

    # normative replay: host closed-loop decode, upload recon, render
    t0 = time.perf_counter()
    recons = sc.decode_sequence(streams, frames)
    t_norm_dec = time.perf_counter() - t0
    t0 = time.perf_counter()
    for frame, rec in zip(frames, recons):
        full = np.zeros((frame.codes.shape[0], rec.shape[1]), np.float32)
        full[: frame.n_voxels] = rec
        scene = _scene_from_attrs(
            jnp.asarray(full), frame.codes, frame.weights,
            jnp.float32(frames[0].width / 2**DEPTH),
            jnp.asarray(frames[0].vmin, jnp.float32), DEPTH)
        imgs, _, _ = _render_scene_views(
            scene, jnp.asarray(viewmats, jnp.float32),
            jnp.asarray(Ks, jnp.float32), bg, width=SIZE, height=SIZE,
            **RASTER)
        float(imgs[0, 0, 0, 0])
    t_norm_render = time.perf_counter() - t0

    steady = per_frame[1:]
    rec = {
        "n": len(positions[0]), "frames": FRAMES, "views": VIEWS,
        "size": SIZE,
        "stream_bytes": {"intra": sizes[0],
                         "inter_mean": int(np.mean(sizes[1:]))},
        "encode_s": round(t_enc, 2),
        "serve_ms_per_frame": per_frame,
        "serve_steady_ms": round(float(np.mean(steady)), 1),
        "serve_fps": round(1e3 / float(np.mean(steady)), 2),
        "normative_ms": {
            "host_closed_loop_decode": round(t_norm_dec * 1e3, 1),
            "upload_and_render": round(t_norm_render * 1e3, 1),
            "per_frame": round(
                (t_norm_dec + t_norm_render) * 1e3 / FRAMES, 1),
        },
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
