"""Batched dataset-encode measurement: vmapped forward + per-step quant.

Quantifies the single-chip batched path: the forward runs ONCE per sweep
(batched_forward/batched_quant_reorder split) and each quantization step
reuses it. See docs/performance.md "Batched dataset encode".
"""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from __graft_entry__ import _synthetic_frame
from raht3dgs_tpu.parallel.sharding import (
    batched_forward,
    batched_quant_T,
    batched_quant_reorder,
    batched_reorder_T,
)

B, N, DEPTH, PAD = 4, 125_000, 10, 1 << 17
frames = [_synthetic_frame(N, DEPTH, 3, seed=s, pad_to=PAD) for s in range(B)]
codes = jnp.asarray(np.stack([f[0] for f in frames]))
attrs = jnp.asarray(np.stack([f[1] for f in frames]), dtype=jnp.float32)
weights = jnp.asarray(np.stack([f[2] for f in frames]), dtype=jnp.float32)
nvox = jnp.asarray([int((f[2] > 0).sum()) for f in frames], dtype=jnp.int32)
total = int(sum((f[2] > 0).sum() for f in frames))

coeffs, orderp = batched_forward(codes, attrs, weights, DEPTH, "ragft", nvox)
float(coeffs[0, 0, 0])
t0 = time.perf_counter()
for _ in range(3):
    coeffs, orderp = batched_forward(codes, attrs, weights, DEPTH, "ragft", nvox)
float(coeffs[0, 0, 0])
t_fwd = (time.perf_counter() - t0) / 3

q = batched_quant_reorder(coeffs, jnp.float32(4.0), orderp)
float(q[0, 0, 0])
t0 = time.perf_counter()
for s in (1.0, 2.0, 4.0, 8.0):
    q = batched_quant_reorder(coeffs, jnp.float32(s), orderp)
float(q[0, 0, 0])
t_q = (time.perf_counter() - t0) / 4

# the hoisted split the drivers actually use: reorder ONCE + elementwise
# quant per step (bitwise-identical streams; models/batch_codec.py)
coeffs_T = batched_reorder_T(coeffs, orderp)
float(coeffs_T[0, 0, 0])
t0 = time.perf_counter()
coeffs_T = batched_reorder_T(coeffs, orderp)
float(coeffs_T[0, 0, 0])
t_r = time.perf_counter() - t0
q = batched_quant_T(coeffs_T, jnp.atleast_1d(jnp.float32(4.0)))
float(q[0, 0, 0])
t0 = time.perf_counter()
for s in (1.0, 2.0, 4.0, 8.0):
    q = batched_quant_T(coeffs_T, jnp.atleast_1d(jnp.float32(s)))
float(q[0, 0, 0])
t_qT = (time.perf_counter() - t0) / 4
print(json.dumps({
    "B": B, "n_per_frame": N,
    "batched_forward_ms": round(t_fwd * 1e3, 1),
    "per_frame_forward_ms": round(t_fwd / B * 1e3, 2),
    "quant_reorder_ms_per_step": round(t_q * 1e3, 1),
    "reorder_once_ms": round(t_r * 1e3, 1),
    "quant_T_ms_per_step": round(t_qT * 1e3, 1),
    "sweep11_amortized_mpts": round(
        total / ((t_fwd + t_r) / 11 + t_qT) / 1e6, 2),
}))
