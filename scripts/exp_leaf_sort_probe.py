#!/usr/bin/env python3
"""Feasibility probe for the roadmap's in-VMEM leaf-sort idea.

The voxelizer's dominant stage is the Morton key sort (``lax.sort``,
~5 ms at 500k on v5e). The only surviving reformulation idea is a
block-local ("leaf") sort + merge: sort K-sized blocks in VMEM, then
merge. This probe measures the CHEAP precondition: can a vectorized
block-local bitonic network (pure elementwise compare-exchange over a
(B, K) layout — the XLA expression of what a Pallas kernel would do in
VMEM, with zero gathers) beat ``lax.sort``'s per-element cost by enough
to leave room for the merge passes a full algorithm still needs?

If blocked-bitonic >= ~0.5x of the full sort's wall, the idea is dead:
merge passes (ge-probes or bitonic merges across blocks) would eat any
remaining margin. Report per-N walls for lax.sort (1 and 2 operands)
and the bitonic row sort at K in {512, 1024, 2048}.
"""

import json
import os
import sys
import time
from functools import partial

import jax

if os.environ.get("RAHT3DGS_PROBE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RAHT3DGS_PROBE_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


@partial(jax.jit, static_argnames=("K",))
def bitonic_rows(x, *, K: int):
    """Ascending bitonic sort of each row of (B, K), K a power of two.

    Reshape-based compare-exchange: stride-j partners are adjacent in a
    (B, K//2j, 2, j) view, so no gathers — the shape a VMEM kernel
    would stream."""
    B = x.shape[0]
    k = 2
    while k <= K:
        j = k // 2
        while j >= 1:
            v = x.reshape(B, K // (2 * j), 2, j)
            lo = v[:, :, 0, :]
            hi = v[:, :, 1, :]
            blocks = jnp.arange(K // (2 * j), dtype=jnp.int32) * 2 * j
            asc = ((blocks & k) == 0)[None, :, None]
            a = jnp.where(asc, jnp.minimum(lo, hi), jnp.maximum(lo, hi))
            b = jnp.where(asc, jnp.maximum(lo, hi), jnp.minimum(lo, hi))
            x = jnp.stack([a, b], axis=2).reshape(B, K)
            j //= 2
        k *= 2
    return x


REPEAT = 8


def repeat_in_program(fn):
    """R applications inside ONE program, one scalar fetch: through a
    remote tunnel a per-dispatch fetch costs an RTT (~20 ms) that would
    swamp the ~ms sort walls being compared."""

    @jax.jit
    def run(x):
        def body(_, a):
            y = fn(a)
            # rotate so the compiler cannot hoist identical iterations
            return jnp.roll(y, 1)

        return jax.lax.fori_loop(0, REPEAT, body, x)

    return run


def wall(fn, x):
    run = repeat_in_program(fn)
    run(x)  # compile+warm
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        r = run(x)
        float(jnp.asarray(r).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / REPEAT


def main():
    rng = np.random.default_rng(0)
    out = {"platform": jax.devices()[0].platform, "ms": {}}
    for N in (1 << 19,):
        keys = rng.integers(0, 1 << 30, size=N, dtype=np.int32)
        payload = rng.integers(0, 1 << 30, size=N, dtype=np.int32)
        del payload
        kd = jnp.asarray(keys)
        out["ms"][f"lax_sort1_{N}"] = round(
            wall(lambda a: jax.lax.sort(a), kd), 3)
        for K in (512, 1024, 2048):
            B = N // K
            xb = jnp.asarray(keys[: B * K].reshape(B, K))
            ms = wall(lambda a, K=K: bitonic_rows(a, K=K), xb)
            out["ms"][f"bitonic_rows_{N}_K{K}"] = round(ms, 3)
        # sanity: rows really sorted
        got = np.asarray(bitonic_rows(xb, K=2048))
        assert (np.diff(got, axis=1) >= 0).all()
    s1 = out["ms"][f"lax_sort1_{1 << 19}"]
    best_blk = min(out["ms"][k] for k in out["ms"] if "bitonic" in k)
    out["block_fraction_of_full_sort"] = round(best_blk / s1, 3)
    out["verdict"] = (
        "headroom: block pass is cheap enough to leave margin for merges"
        if best_blk < 0.35 * s1 else
        "dead end: block-local pass alone eats the sort budget"
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
