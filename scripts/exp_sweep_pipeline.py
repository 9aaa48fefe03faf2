"""E2E batched RD-sweep: serial per-step encode vs pipelined encode_sweep.

Measures the full encode path (device quant+reorder, device->host fetch,
host RLGR entropy) for an 11-step sweep over a B-frame batch, comparing
``[bc.encode(s) for s in steps]`` against ``bc.encode_sweep(steps)``
(async dispatch + async fetch + drained entropy). Streams are
byte-identical between the two (tests/test_batch_codec.py); only the
schedule differs. On remote-host backends the fetch rides the tunnel, so
the pipelined win is host entropy + device work hidden under transfers.
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raht3dgs_tpu.models.batch_codec import (
    BatchAttributeCodec,
    prepare_frame_batch,
)
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.prelude import morton_codes_np

B, N, DEPTH = 4, 125_000, 10
STEPS = [1.0, 2.0, 4.0, 6.0, 8.0, 12.0, 16.0, 20.0, 24.0, 32.0, 64.0]


def frame_inputs(seed):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 2**DEPTH, size=(2 * N, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:N]
    pos = np.asarray(morton_decode(jnp.asarray(codes.astype(np.int64)), DEPTH))
    attrs = rng.uniform(0, 255, size=(len(codes), 3)).astype(np.float32)
    return pos.astype(np.int64), attrs


def main():
    pos, attrs = zip(*[frame_inputs(s) for s in range(B)])
    frames = prepare_frame_batch(list(pos), list(attrs), DEPTH,
                                 bucket=1 << 17, dtype=jnp.float32)
    total = sum(f.n_voxels for f in frames)
    bc = BatchAttributeCodec(DEPTH, dtype=jnp.float32)
    coeffs, orderp, _ = bc.transform(frames)
    float(coeffs[0, 0, 0])  # sync
    bc.encode(frames, STEPS[0], coeffs=coeffs, orderp=orderp)  # warm/compile

    t0 = time.perf_counter()
    for s in STEPS:
        bc.encode(frames, s, coeffs=coeffs, orderp=orderp)
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    bc.encode_sweep(frames, STEPS, coeffs=coeffs, orderp=orderp)
    t_pipe = time.perf_counter() - t0

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "B": B, "n_per_frame": N, "steps": len(STEPS),
        "serial_s": round(t_serial, 3),
        "pipelined_s": round(t_pipe, 3),
        "speedup": round(t_serial / t_pipe, 2),
        "pipelined_frame_steps_mpts": round(
            total * len(STEPS) / t_pipe / 1e6, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
