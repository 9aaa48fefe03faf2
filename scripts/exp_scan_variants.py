"""Candidate prefix-scan formulations at codec shapes (burst, last-fetch).

  ds_blocked     current default: intra-block ds associative_scan +
                 ds block-total scan + combine
  cumsum_hybrid  candidate: intra-block NATIVE jnp.cumsum (plain f32,
                 reduce-window lowering) + ds block-total scan + exact
                 two-sum recombination. Integer lanes stay exact
                 (partials < 2^24); float lanes accept ~eps*block_sum
                 intra-block rounding.
  cumsum_plain   lower bound: plain jnp.cumsum on the full axis

Usage: python scripts/exp_scan_variants.py [N] [K]
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
from jax import lax

sys.path.insert(0, "/root/repo")
from raht3dgs_tpu.ops.raht_span import _ds_combine, _two_sum

N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
K = int(sys.argv[2]) if len(sys.argv) > 2 else 60


def timed(fn, args, tag, burst=8, iters=3, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(np.asarray(out).reshape(-1)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(burst)]
        float(np.asarray(outs[-1]).reshape(-1)[0])
        times.append((time.perf_counter() - t0) / burst)
    print(json.dumps({"piece": tag, "N": N, "K": K,
                      "ms": round(min(times) * 1e3, 2)}), flush=True)


def cumsum_hybrid(values_f32, block=256):
    n, k = values_f32.shape
    nb = -(-n // block)
    pad = nb * block - n
    v = jnp.pad(values_f32, ((0, pad), (0, 0))).reshape(nb, block, k)
    l = jnp.cumsum(v, axis=1)
    tot = l[:, -1, :]
    bh, bl = lax.associative_scan(
        _ds_combine, (tot, jnp.zeros_like(tot)), axis=0)
    zrow = jnp.zeros((1, k), values_f32.dtype)
    bh = jnp.concatenate([zrow, bh[:-1]])[:, None, :]
    bl = jnp.concatenate([zrow, bl[:-1]])[:, None, :]
    hi, lo = _two_sum(jnp.broadcast_to(bh, l.shape), l)
    lo = lo + bl
    return (hi.reshape(nb * block, k)[:n],
            lo.reshape(nb * block, k)[:n])


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.uniform(-1, 1, (N, K)).astype(np.float32))

    @jax.jit
    def ds_blocked(v):
        from raht3dgs_tpu.ops.segment import _ds_cumsum_blocked

        hi, lo = _ds_cumsum_blocked(v)
        return hi[-1, 0] + lo[-1, min(1, K - 1)]

    def hybrid(block):
        @jax.jit
        def f(v):
            hi, lo = cumsum_hybrid(v, block=block)
            return hi[-1, 0] + lo[-1, min(1, K - 1)]
        return f

    @jax.jit
    def cumsum_plain(v):
        return jnp.cumsum(v, axis=0)[-1, 0]

    # accuracy sanity on CPU-precision data: compare against float64
    v64 = np.asarray(vals, dtype=np.float64)
    ref = np.cumsum(v64, axis=0)
    hi, lo = jax.jit(lambda v: cumsum_hybrid(v))(vals)
    err = np.max(np.abs((np.asarray(hi, np.float64) +
                         np.asarray(lo, np.float64)) - ref) /
                 np.maximum(np.abs(ref), 1.0))
    print(json.dumps({"hybrid_max_rel_err_vs_f64": float(err)}), flush=True)

    timed(ds_blocked, (vals,), "ds_blocked")
    for b in (256, 512):
        timed(hybrid(b), (vals,), f"cumsum_hybrid{b}")
    timed(cumsum_plain, (vals,), "cumsum_plain")


if __name__ == "__main__":
    main()
