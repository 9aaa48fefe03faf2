"""Experiment (roadmap #4): vmapped B-frame roundtrip vs per-frame dispatches.

Measures whether batching B frames into ONE jitted program amortizes the
per-dispatch fixed cost (~15 ms) enough to beat bench.py's burst of
sequential single-frame dispatches. Scales N and B gradually with a scalar
fetch at each size (TPU tunnel etiquette — never enqueue a large untested
program).

Usage: python scripts/exp_batch_roundtrip.py [stage]
  stage 0: 131k B=2 (validate + compile warm)
  stage 1: 524k B=1 vs B=2
  stage 2: 524k B=4
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
from __graft_entry__ import _synthetic_frame
from raht3dgs_tpu.ops.raht_span import raht_forward_span, raht_inverse_span

DEPTH = 10


def build(B, pad_to, d_attr=3):
    frames = [
        _synthetic_frame(int(pad_to * 0.95), DEPTH, d_attr, seed=s, pad_to=pad_to)
        for s in range(B)
    ]
    codes = jnp.asarray(np.stack([f[0] for f in frames]))
    attrs = jnp.asarray(np.stack([f[1] for f in frames]), dtype=jnp.float32)
    weights = jnp.asarray(np.stack([f[2] for f in frames]), dtype=jnp.float32)

    def one(c, a, w):
        res = raht_forward_span(c, a, w, DEPTH)
        return raht_inverse_span(res.coeffs, c, w, DEPTH)

    fn = jax.jit(jax.vmap(one))
    return fn, codes, attrs, weights, frames


def measure(B, pad_to, iters=3, burst=4, warmup=2):
    fn, codes, attrs, weights, frames = build(B, pad_to)
    n_real = sum(int((f[2] > 0).sum()) for f in frames)
    t0 = time.perf_counter()
    out = fn(codes, attrs, weights)
    float(out[0, 0, 0])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(codes, attrs, weights)
        float(out[0, 0, 0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(codes, attrs, weights) for _ in range(burst)]
        for o in outs:
            float(o[0, 0, 0])
        times.append((time.perf_counter() - t0) / burst)
    # correctness spot check on frame 0
    rec = np.asarray(outs[-1][0])
    nr0 = int((frames[0][2] > 0).sum())
    err = np.abs(rec[:nr0] - frames[0][1][:nr0]).max()
    best = min(times)
    print(
        json.dumps(
            {
                "B": B,
                "pad_to": pad_to,
                "compile_s": round(compile_s, 1),
                "per_dispatch_ms": round(best * 1e3, 1),
                "per_frame_ms": round(best / B * 1e3, 1),
                "mpts_per_s": round(n_real / best / 1e6, 2),
                "max_err": float(err),
            }
        ),
        flush=True,
    )
    assert err < 1e-2, f"roundtrip error {err}"


if __name__ == "__main__":
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    if stage == 0:
        measure(2, 1 << 17)
    elif stage == 1:
        measure(1, 1 << 19)
        measure(2, 1 << 19)
    elif stage == 2:
        measure(4, 1 << 19)
