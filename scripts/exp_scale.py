"""Scaling measurements: transform roundtrip vs N and channel count D.

Usage: python scripts/exp_scale.py <pad_log2> <D>
e.g. 19 3 (bench config), 19 56 (3DGS channel count), 21 3 (2M points).
Last-only-fetch burst timing (see docs/performance.md "fetch floor").
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


def main(pad_log2, D, iters=3, burst=6, warmup=2):
    pad_to = 1 << pad_log2
    n = int(pad_to * 0.95)
    codes, attrs, weights = _synthetic_frame(n, DEPTH, D, pad_to=pad_to)
    c = jnp.asarray(codes)
    a = jnp.asarray(attrs, dtype=jnp.float32)
    w = jnp.asarray(weights, dtype=jnp.float32)
    n_real = int((weights > 0).sum())

    @jax.jit
    def roundtrip(c, a, w):
        res = raht_forward_span(c, a, w, DEPTH)
        return raht_inverse_span(res.coeffs, c, w, DEPTH)

    t0 = time.perf_counter()
    out = roundtrip(c, a, w)
    float(out[0, 0])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = roundtrip(c, a, w)
        float(out[0, 0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [roundtrip(c, a, w) for _ in range(burst)]
        float(outs[-1][0, 0])
        times.append((time.perf_counter() - t0) / burst)
    best = min(times)
    rec = np.asarray(outs[-1])[:n_real]
    err = np.abs(rec - attrs[:n_real]).max()
    print(
        json.dumps(
            {
                "pad_to": pad_to,
                "D": D,
                "compile_s": round(compile_s, 1),
                "ms_per_frame": round(best * 1e3, 1),
                "mpts_per_s": round(n_real / best / 1e6, 2),
                "mcoeffs_per_s": round(n_real * D / best / 1e6, 1),
                "max_err": float(err),
            }
        ),
        flush=True,
    )
    assert err < 5e-2, err


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
