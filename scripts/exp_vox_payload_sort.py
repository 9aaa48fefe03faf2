#!/usr/bin/env python3
"""Voxelizer lever: carry the payload THROUGH the sort vs post-sort gather.

The round-2 voxelizer costs ~10.7 ms at 500k/J=10 on v5e, of which ~2.5 ms
is the post-sort ``(N, 6)`` row gather (`docs/performance.md`). Rows move
through per-row DMA in a gather; a multi-operand ``lax.sort`` instead
moves them through the sort network's vector compare-exchanges. This
experiment measures, at the bench shape:

  pair    : sort (code, row) + (N, 6) f32 row gather   (current program)
  payload : sort (code, row, 6 payload lanes)          (no gather at all)
  full    : the full voxelize() program for context

Run ON TPU (defaults to the ambient platform):
    python scripts/exp_vox_payload_sort.py [--n 500000] [--depth 10]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from raht3dgs_tpu.ops.morton import code_dtype, morton_encode

    rng = np.random.default_rng(0)
    N, depth = args.n, args.depth
    PC = np.concatenate(
        [rng.uniform(0, 1, (N, 3)), rng.uniform(0, 255, (N, 3))], axis=1
    ).astype(np.float32)
    PCj = jnp.asarray(PC)

    cdt = code_dtype(depth, N)

    @jax.jit
    def prep(PC):
        V0 = PC[:, :3]
        voxel_size = 1.0 / (1 << depth)
        Vint = jnp.clip(
            jnp.floor(V0 / voxel_size), 0, (1 << depth) - 1
        ).astype(jnp.int32)
        return morton_encode(Vint, depth).astype(cdt)

    @jax.jit
    def pair_sort_gather(PC):
        M = prep(PC)
        row = jnp.arange(N, dtype=jnp.int32)
        Ms, sort_idx = jax.lax.sort((M, row), num_keys=1)
        PCs = PC[sort_idx]
        return Ms[-1], sort_idx[-1], PCs[-1].sum()

    @jax.jit
    def payload_sort(PC):
        M = prep(PC)
        row = jnp.arange(N, dtype=jnp.int32)
        ops = (M, row) + tuple(PC[:, i] for i in range(6))
        out = jax.lax.sort(ops, num_keys=1)
        Ms, sort_idx = out[0], out[1]
        PCs = jnp.stack(out[2:], axis=1)
        return Ms[-1], sort_idx[-1], PCs[-1].sum()

    from raht3dgs_tpu.ops.voxelize import voxelize

    @jax.jit
    def full(PC):
        res = voxelize(PC, depth)
        return res.nvox, res.attributes[-1].sum()

    def measure(fn, name):
        out = fn(PCj)
        float(jnp.asarray(out[-1]))  # warm + force
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            outs = [fn(PCj) for _ in range(args.burst)]
            float(jnp.asarray(outs[-1][-1]))
            best = min(best, (time.perf_counter() - t0) / args.burst)
        print(f"{name:22s}: {best * 1e3:7.2f} ms  "
              f"({N / best / 1e6:6.1f} Mpts/s)")
        return best

    print(f"platform={jax.devices()[0].platform} N={N} J={depth}")
    measure(pair_sort_gather, "pair sort + gather")
    measure(payload_sort, "payload sort (8 ops)")
    measure(full, "full voxelize()")
    return 0


if __name__ == "__main__":
    sys.exit(main())
