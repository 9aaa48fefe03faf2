"""Measure the span-inverse cost pieces standalone on the current device.

Times (as separate jitted programs, burst-amortized):
  A. _span_topology only            (the (V, N) nearest->= pass)
  B. topology + weight prefix + narrow W gathers (a/b setup)
  C. full inverse
  D. full inverse minus doubling rounds (rounds replaced by 1)

Each program returns a scalar-reducible output so nothing is DCE'd.
Tunnel etiquette: small N first, scalar fetch every stage.
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
from raht3dgs_tpu.ops import raht_span as rs

DEPTH = 10


def timed(fn, args, tag, burst=8, iters=3, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
        float(out.reshape(-1)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(burst)]
        # in-order device stream: the last output's completion bounds all —
        # fetch once per burst (the ~30 ms tunnel fetch otherwise dominates)
        float(outs[-1].reshape(-1)[0])
        times.append((time.perf_counter() - t0) / burst)
    print(json.dumps({"piece": tag, "ms": round(min(times) * 1e3, 2)}), flush=True)


def main(pad_to):
    codes, attrs, weights = _synthetic_frame(
        int(pad_to * 0.95), DEPTH, 3, pad_to=pad_to
    )
    c = jnp.asarray(codes)
    a = jnp.asarray(attrs, dtype=jnp.float32)
    w = jnp.asarray(weights, dtype=jnp.float32)

    @jax.jit
    def topo(c):
        drop, p, q, _, _B = rs._span_topology(c, DEPTH)
        return (drop + p + q).astype(jnp.float32)

    @jax.jit
    def setup(c, w):
        drop, p, q, levels, _B = rs._span_topology(c, DEPTH)
        N = c.shape[0]
        W, w_total = rs._weight_prefix(w, jnp.float32)
        W_here = W[:N]
        w1 = W[q] - W_here
        w0 = W_here - W[jnp.maximum(p, 0)]
        aa, bb = rs._safe_ab(w0, w1)
        return aa + bb

    @jax.jit
    def inv(coeffs, c, w):
        return rs.raht_inverse_span(coeffs, c, w, DEPTH)

    @jax.jit
    def fwd(c, a, w):
        return rs.raht_forward_span(c, a, w, DEPTH).coeffs

    @jax.jit
    def floor_prog(a):
        return jnp.sum(a) * 2.0

    @jax.jit
    def roundtrip(c, a, w):
        res = rs.raht_forward_span(c, a, w, DEPTH)
        return rs.raht_inverse_span(res.coeffs, c, w, DEPTH)

    coeffs = fwd(c, a, w)
    coeffs.block_until_ready()

    timed(floor_prog, (a,), f"floor@{pad_to}")
    timed(topo, (c,), f"topology@{pad_to}")
    timed(setup, (c, w), f"topo+W-setup@{pad_to}")
    timed(fwd, (c, a, w), f"forward@{pad_to}")
    timed(inv, (coeffs, c, w), f"inverse@{pad_to}")
    timed(roundtrip, (c, a, w), f"roundtrip@{pad_to}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17)
