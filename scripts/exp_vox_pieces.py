"""Voxelizer piece-cost split on TPU (burst timing, last-only fetch).

Times the individual sub-programs of ``ops/voxelize.voxelize`` at the
reference scale (N=500k, J=10) to locate the remaining cost after the
round-1/2 optimizations (int32 code tier, fused wide gather, no
morton_decode):

  pair_sort      lax.sort((int32 code, int32 row)) — the main sort
  key_sort       lax.sort(int32 code) keys-only (lower bound for sorting)
  gather6        pair sort + one (N, 6) row gather (the PCs gather)
  compact_pair   segment_starts' stable bool-key argsort (the compaction)
  compact_key    single-int32-key unstable variant of the same compaction
  ds_scan4       _ds_cumsum on (N, 4) f32 (the compensated prefix)
  cumsum_i32     plain int32 cumsum (the point_voxel scan)
  full           voxelize(...) full program, codes+counts fetched
  full_attrs     voxelize(...) attributes output only (DCE view)

Usage: python scripts/exp_vox_pieces.py [N]
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
from raht3dgs_tpu.ops.morton import morton_encode
from raht3dgs_tpu.ops.voxelize import voxelize

DEPTH = 10
N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000


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
    print(json.dumps({"piece": tag, "N": N,
                      "ms": round(min(times) * 1e3, 2)}), flush=True)


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1024.0, (N, 3)).astype(np.float32)
    cols = rng.uniform(0, 255.0, (N, 3)).astype(np.float32)
    PC = jnp.asarray(np.concatenate([pts, cols], axis=1))
    V = jnp.asarray(pts)
    Vint = jnp.clip(jnp.floor(V / (1024.0 / (1 << DEPTH))), 0,
                    (1 << DEPTH) - 1).astype(jnp.int32)
    M = morton_encode(Vint, DEPTH)
    row = jnp.arange(N, dtype=jnp.int32)
    first_np = np.concatenate(
        [[True], np.diff(np.sort(np.asarray(M))) != 0])
    first = jnp.asarray(first_np)
    vals4 = jnp.asarray(rng.uniform(0, 255, (N, 4)).astype(np.float32))

    @jax.jit
    def pair_sort(M, row):
        Ms, si = jax.lax.sort((M, row), num_keys=1)
        return Ms[0] + si[0]

    @jax.jit
    def key_sort(M):
        return jnp.sort(M)[0]

    @jax.jit
    def gather6(M, row, PC):
        Ms, si = jax.lax.sort((M, row), num_keys=1)
        PCs = PC[si]
        return PCs[0, 0] + Ms[0].astype(jnp.float32)

    @jax.jit
    def compact_pair(first, row):
        starts = jnp.argsort(~first, stable=True).astype(jnp.int32)
        return starts[0]

    @jax.jit
    def compact_key(first, row):
        key = jnp.where(first, row, row + jnp.int32(N))
        ks = jax.lax.sort(key)
        nseg = jnp.sum(first.astype(jnp.int32))
        starts = jnp.where(row < nseg, ks - 0, ks - jnp.int32(N))
        return starts[0]

    @jax.jit
    def ds_scan4(vals):
        from raht3dgs_tpu.ops.raht_span import _ds_cumsum

        hi, lo = _ds_cumsum(vals)
        return hi[-1, 0] + lo[-1, 0]

    def ds_blocked(block):
        @jax.jit
        def f(vals):
            from raht3dgs_tpu.ops.segment import _ds_cumsum_blocked

            hi, lo = _ds_cumsum_blocked(vals, block=block)
            return hi[-1, 0] + lo[-1, 0]

        return f

    @jax.jit
    def cumsum_i32(first):
        return jnp.cumsum(first.astype(jnp.int32))[-1]

    @jax.jit
    def full(PC):
        r = voxelize(PC, DEPTH)
        return r.codes[0] + r.counts[0].astype(jnp.int32)

    @jax.jit
    def full_attrs(PC):
        return voxelize(PC, DEPTH).attributes[0, 0]

    import os

    pieces = os.environ.get("VOX_PIECES", "all")
    if pieces == "all":
        timed(key_sort, (M,), "key_sort")
        timed(pair_sort, (M, row), "pair_sort")
        timed(gather6, (M, row, PC), "gather6")
        timed(compact_pair, (first, row), "compact_pair")
        timed(compact_key, (first, row), "compact_key")
        timed(ds_scan4, (vals4,), "ds_scan4")
        timed(cumsum_i32, (first,), "cumsum_i32")
    for b in (256, 512, 1024):
        timed(ds_blocked(b), (vals4,), f"ds_blocked{b}")
    timed(full, (PC,), "full")


if __name__ == "__main__":
    main()
