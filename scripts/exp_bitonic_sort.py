"""Prototype: merge-based sort network vs lax.sort for the voxelizer.

The voxelizer's one structural disadvantage vs the reference's GPU radix
sort (`docs/voxelization.md`: 150 Mpts/s at 500k incl. sort) is
``lax.sort`` — XLA's TPU sort lowers a generic comparator network and
measures ~8.6 ms for the (code, row) pair at 524k (docs/performance.md).
This prototype tests whether a hand-laid sorting network is faster:

- leaf stage: one *batched* ``lax.sort`` over ``(N/leaf, leaf)`` rows
  (row-parallel, much shallower than a full-N sort);
- merge rounds: classic bitonic merges, but only the strides >= ``leaf``
  run as elementwise compare-exchange passes (static reshapes, VPU
  min/max) — after the partial network, consecutive ``leaf`` blocks
  dominate each other, so one batched leaf sort finishes the round.

Comparator is lexicographic on (key, payload) — payload rows are unique,
so the result is EXACTLY the stable sort's output, making the network a
drop-in for ``lax.sort((M, row), num_keys=1, is_stable=True)``.

Usage: python scripts/exp_bitonic_sort.py [log2_n] [cpu]
"""
import sys
import time

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from functools import partial

import jax.numpy as jnp
import numpy as np
from jax import lax


def _cmpex(k, v, s):
    """Compare-exchange pairs (i, i+s) within blocks of 2s, ascending,
    lexicographic on (k, v)."""
    kk = k.reshape(-1, 2, s)
    vv = v.reshape(-1, 2, s)
    a, b = kk[:, 0], kk[:, 1]
    va, vb = vv[:, 0], vv[:, 1]
    swap = (a > b) | ((a == b) & (va > vb))
    klo = jnp.where(swap, b, a)
    khi = jnp.where(swap, a, b)
    vlo = jnp.where(swap, vb, va)
    vhi = jnp.where(swap, va, vb)
    k2 = jnp.stack([klo, khi], axis=1).reshape(-1)
    v2 = jnp.stack([vlo, vhi], axis=1).reshape(-1)
    return k2, v2


def _leaf_sort(k, v, leaf):
    kk = k.reshape(-1, leaf)
    vv = v.reshape(-1, leaf)
    kk, vv = lax.sort((kk, vv), dimension=1, num_keys=2, is_stable=False)
    return kk.reshape(-1), vv.reshape(-1)


@partial(jax.jit, static_argnames=("leaf",))
def merge_sort_pairs(k, v, leaf=4096):
    """Sort (k, v) by (k, v) lexicographic; N must be a power of two.

    Equals ``lax.sort((k, v), num_keys=2)`` exactly (unique (k, v) pairs
    have one sorted order)."""
    N = k.shape[0]
    assert N & (N - 1) == 0 and N >= 2 * leaf
    k, v = _leaf_sort(k, v, leaf)
    size = leaf
    while size < N:
        # reverse odd blocks -> each 2*size block becomes bitonic
        k2 = k.reshape(-1, 2, size)
        v2 = v.reshape(-1, 2, size)
        k = jnp.concatenate([k2[:, 0], k2[:, 1, ::-1]], axis=1).reshape(-1)
        v = jnp.concatenate([v2[:, 0], v2[:, 1, ::-1]], axis=1).reshape(-1)
        size *= 2
        s = size // 2
        while s >= leaf:
            k, v = _cmpex(k, v, s)
            s //= 2
        # blocks of `leaf` now dominate in order; finish each block
        k, v = _leaf_sort(k, v, leaf)
    return k, v


def _cmpex1(k, s):
    kk = k.reshape(-1, 2, s)
    a, b = kk[:, 0], kk[:, 1]
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    return jnp.stack([lo, hi], axis=1).reshape(-1)


@partial(jax.jit, static_argnames=("leaf",))
def merge_sort_keys(k, leaf=4096):
    """Single-operand variant (the rasterizer binning-key case)."""
    N = k.shape[0]
    assert N & (N - 1) == 0 and N >= 2 * leaf
    k = lax.sort(k.reshape(-1, leaf), dimension=1).reshape(-1)
    size = leaf
    while size < N:
        k2 = k.reshape(-1, 2, size)
        k = jnp.concatenate([k2[:, 0], k2[:, 1, ::-1]], axis=1).reshape(-1)
        size *= 2
        s = size // 2
        while s >= leaf:
            k = _cmpex1(k, s)
            s //= 2
        k = lax.sort(k.reshape(-1, leaf), dimension=1).reshape(-1)
    return k


def bench(fn, *args, burst=8):
    """Burst timing: 8 dispatches, one scalar fetch (the tunnel's
    round-trip latency ~30 ms would otherwise floor every number)."""
    out = fn(*args)
    float(jnp.asarray(out[0][-1]))  # warm + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(burst):
            out = fn(*args)
        float(jnp.asarray(out[0][-1]))
        times.append((time.perf_counter() - t0) / burst)
    return min(times)


def main():
    log2n = 19
    for a in sys.argv[1:]:
        if a.isdigit():
            log2n = int(a)
    N = 1 << log2n
    rng = np.random.default_rng(0)
    # J=10 morton codes: 30-bit keys with duplicates (tie-break exercised)
    keys = jnp.asarray(
        rng.integers(0, 1 << 30, size=N, dtype=np.int32) & ~np.int32(3)
    )
    rows = jnp.arange(N, dtype=jnp.int32)

    ref_fn = jax.jit(
        lambda k, v: lax.sort((k, v), num_keys=1, is_stable=True)
    )
    kr, vr = ref_fn(keys, rows)
    for leaf in (2048, 4096, 8192):
        km, vm = merge_sort_pairs(keys, rows, leaf=leaf)
        ok = bool(jnp.all(km == kr)) and bool(jnp.all(vm == vr))
        t = bench(partial(merge_sort_pairs, leaf=leaf), keys, rows)
        print(
            f"N=2^{log2n} leaf={leaf}: network {t * 1e3:7.3f} ms  "
            f"stable-equal={ok}",
            flush=True,
        )
    t_ref = bench(ref_fn, keys, rows)
    print(f"N=2^{log2n} lax.sort stable pair: {t_ref * 1e3:7.3f} ms")
    t_ref_u = bench(
        jax.jit(lambda k, v: lax.sort((k, v), num_keys=1)), keys, rows
    )
    print(f"N=2^{log2n} lax.sort unstable pair: {t_ref_u * 1e3:7.3f} ms")

    # single-operand (binning-key) case
    ref1 = jax.jit(lambda k: lax.sort(k))
    ks = ref1(keys)
    for leaf in (2048, 4096, 8192):
        k1 = merge_sort_keys(keys, leaf=leaf)
        ok = bool(jnp.all(k1 == ks))
        t = bench(
            lambda kk, leaf=leaf: (merge_sort_keys(kk, leaf=leaf),), keys
        )
        print(
            f"N=2^{log2n} keys-only leaf={leaf}: network {t * 1e3:7.3f} ms  "
            f"equal={ok}",
            flush=True,
        )
    t1 = bench(lambda kk: (ref1(kk),), keys)
    print(f"N=2^{log2n} lax.sort keys-only: {t1 * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
