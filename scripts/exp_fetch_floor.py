"""Diagnose the ~30 ms per-dispatch floor: dispatch cost or fetch cost?

Burst-dispatches a trivial program K times, then (a) fetches every output
scalar vs (b) fetches only the LAST output's scalar. TPU executions on one
device stream are in-order, so (b) still bounds completion of the whole
burst. If (b) collapses toward floor/K, the floor is the per-fetch tunnel
round-trip, not device dispatch.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

N = 1 << 17


@jax.jit
def prog(a):
    return jnp.sum(a) * 2.0


def run(fetch_all, burst=8, iters=4):
    a = jnp.arange(N, dtype=jnp.float32)
    for _ in range(2):
        float(prog(a))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [prog(a) for _ in range(burst)]
        if fetch_all:
            for o in outs:
                float(o)
        else:
            float(outs[-1])
        times.append((time.perf_counter() - t0) / burst)
    print(
        json.dumps(
            {
                "fetch": "all" if fetch_all else "last-only",
                "per_dispatch_ms": round(min(times) * 1e3, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    run(True)
    run(False)
    # chained dependency variant: each dispatch consumes the previous
    # output, so last-only fetch provably covers the whole chain
    a = jnp.arange(N, dtype=jnp.float32)

    @jax.jit
    def chain(a):
        return a * 1.0000001

    x = chain(a)
    float(x[0])
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        x = a
        for _ in range(8):
            x = chain(x)
        float(x[0])
        times.append((time.perf_counter() - t0) / 8)
    print(json.dumps({"fetch": "chained-last", "per_dispatch_ms": round(min(times) * 1e3, 2)}), flush=True)
