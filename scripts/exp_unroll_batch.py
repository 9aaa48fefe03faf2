"""Experiment: UNROLLED B-frame roundtrip (one dispatch, no vmap).

exp_batch_roundtrip.py showed vmap costs ~2x per-frame compute; and
exp_inverse_split.py showed a ~30 ms per-dispatch floor through the
tunnel even when bursting. An unrolled program (Python loop over frames
inside one jit) keeps per-frame HLO identical while paying the floor once.

Usage: python scripts/exp_unroll_batch.py <pad_log2> <B>
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


def main(pad_to, B, iters=3, burst=3, warmup=2):
    frames = [
        _synthetic_frame(int(pad_to * 0.95), DEPTH, 3, seed=s, pad_to=pad_to)
        for s in range(B)
    ]
    codes = jnp.asarray(np.stack([f[0] for f in frames]))
    attrs = jnp.asarray(np.stack([f[1] for f in frames]), dtype=jnp.float32)
    weights = jnp.asarray(np.stack([f[2] for f in frames]), dtype=jnp.float32)

    @jax.jit
    def multi(codes, attrs, weights):
        outs = []
        for i in range(B):  # unrolled: B copies of the per-frame HLO
            res = raht_forward_span(codes[i], attrs[i], weights[i], DEPTH)
            outs.append(
                raht_inverse_span(res.coeffs, codes[i], weights[i], DEPTH)
            )
        return jnp.stack(outs)

    t0 = time.perf_counter()
    out = multi(codes, attrs, weights)
    float(out[0, 0, 0])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = multi(codes, attrs, weights)
        float(out[0, 0, 0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [multi(codes, attrs, weights) for _ in range(burst)]
        for o in outs:
            float(o[0, 0, 0])
        times.append((time.perf_counter() - t0) / burst)
    best = min(times)
    n_real = sum(int((f[2] > 0).sum()) for f in frames)
    rec = np.asarray(outs[-1][0])
    nr0 = int((frames[0][2] > 0).sum())
    err = np.abs(rec[:nr0] - frames[0][1][:nr0]).max()
    print(
        json.dumps(
            {
                "mode": "unroll",
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
    assert err < 1e-2


if __name__ == "__main__":
    main(1 << int(sys.argv[1]), int(sys.argv[2]))
