"""3DGS 56-channel RD-sweep schedule A/B: serial encode vs pipelined encode_sweep.

The reference 3DGS driver (``/root/reference/python/encode_3dgs.py:38-68``)
encodes each quantization step serially: quantize, fetch, entropy-code, then
start the next step. ``AttributeCodec.encode_sweep`` dispatches every step's
device program up front, starts the device->host copies asynchronously, and
drains the host RLGR coder while later steps are still in flight — streams
stay byte-identical (pinned by tests/test_pipeline.py), only the schedule
changes. This script measures the wall-clock difference for the flagship
56-channel payload at serving scale on the real backend.

Usage: python scripts/exp_gs_sweep_tpu.py [N]   (default 131072)
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from raht3dgs_tpu.ops.prelude import morton_codes_np

DEPTH = 10
STEPS = [1.0, 4.0, 8.0, 12.0, 16.0, 20.0, 24.0, 32.0, 64.0]


def gs_frame(n, seed=0):
    """Realistic-scale 56ch payload (unit quats, log scales, logit opacity,
    SH ~N(0,0.3)) on a Morton-unique voxel set — the
    test_voxelize_3dgs.py:58-114 attribute regime."""
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 2**DEPTH, size=(3 * n, 3))
    codes, idx = np.unique(morton_codes_np(pts, DEPTH), return_index=True)
    V = pts[idx[:n]]
    m = len(V)
    q = rng.normal(size=(m, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    attrs = np.concatenate(
        [
            q,
            rng.normal(-1.5, 0.5, (m, 3)),
            rng.uniform(0.05, 0.95, (m, 1)),
            rng.normal(0.0, 0.3, (m, 48)),
        ],
        axis=1,
    )
    return V, attrs


def run(n):
    V, attrs = gs_frame(n)
    frame = prepare_voxel_frame(
        V, attrs, DEPTH, bucket=1 << 13, dtype=jnp.float32
    )
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    coeffs, order, _, _ = codec.transform(frame)

    # warm every step's program + both schedules once (compile)
    _ = [codec.encode(frame, s, coeffs=coeffs, order=order) for s in STEPS]
    _ = codec.encode_sweep(frame, STEPS, coeffs=coeffs, order=order)

    t0 = time.perf_counter()
    serial = [codec.encode(frame, s, coeffs=coeffs, order=order) for s in STEPS]
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    sweep = codec.encode_sweep(frame, STEPS, coeffs=coeffs, order=order)
    t_sweep = time.perf_counter() - t0

    for a, b in zip(serial, sweep):
        assert a.stream.to_bytes() == b.stream.to_bytes(), "stream mismatch!"
    print(
        f"N={frame.n_voxels} D=56 steps={len(STEPS)} "
        f"platform={jax.devices()[0].platform}"
    )
    print(f"serial   : {t_serial:.3f} s")
    print(f"pipelined: {t_sweep:.3f} s   ({t_serial / t_sweep:.2f}x)")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 131072)
