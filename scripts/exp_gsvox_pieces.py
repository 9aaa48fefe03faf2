"""Piece costs of the fused 3DGS voxelize+merge step (burst, last-fetch).

The full step measured ~70 ms at 524k while plain voxelize is ~11 ms —
this splits the program to locate the difference:

  vox_only      voxelize(means) (positions-only path)
  gather58      (N, 58) row gather by sort_idx
  segsum60      sorted_segment_sums on (N, 60) f32
  ds60          the blocked ds scan on (N, 60) alone
  inv_perm      argsort(sort_idx) inverse permutation
  full          _voxelize_merge_device

Usage: python scripts/exp_gsvox_pieces.py [N]
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
from raht3dgs_tpu.models.gs_voxelize import _voxelize_merge_device
from raht3dgs_tpu.ops.voxelize import voxelize

DEPTH = 10
N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288


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
    means = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.001, 0.01, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 1.0, (N,)).astype(np.float32))
    colors = jnp.asarray(rng.normal(0, 0.3, (N, 48)).astype(np.float32))
    sort_idx = jnp.asarray(rng.permutation(N).astype(np.int32))
    vals60 = jnp.asarray(rng.uniform(-1, 1, (N, 60)).astype(np.float32))
    first = jnp.asarray(
        np.concatenate([[True], rng.uniform(size=N - 1) < 0.9]))

    @jax.jit
    def vox_only(means):
        v = voxelize(means, DEPTH)
        return v.positions[0, 0] + v.nvox

    @jax.jit
    def gather58(quats, scales, opac, colors, means, sort_idx):
        packed = jnp.concatenate(
            [quats, scales, opac[:, None], colors, means], axis=1
        )[sort_idx]
        return packed[0, 0] + packed[-1, 1]

    @jax.jit
    def segsum60(vals, first):
        from raht3dgs_tpu.ops.segment import sorted_segment_sums

        sums, _, _, _ = sorted_segment_sums(vals, first)
        return sums[0, 0] + sums[-1, 1]

    @jax.jit
    def ds60(vals):
        from raht3dgs_tpu.ops.segment import _ds_cumsum_blocked

        hi, lo = _ds_cumsum_blocked(vals)
        return hi[-1, 0] + lo[-1, 1]

    @jax.jit
    def inv_perm(sort_idx):
        return jnp.argsort(sort_idx)[0]

    step = jax.jit(_voxelize_merge_device, static_argnames=("depth",))

    def full(means, quats, scales, opac, colors):
        outs = step(means, quats, scales, opac, colors, DEPTH)
        return outs[1][:1, :1]

    timed(vox_only, (means,), "vox_only")
    timed(gather58, (quats, scales, opac, colors, means, sort_idx),
          "gather58")
    timed(ds60, (vals60,), "ds60")
    timed(segsum60, (vals60, first), "segsum60")
    timed(inv_perm, (sort_idx,), "inv_perm")
    timed(full, (means, quats, scales, opac, colors), "full")


if __name__ == "__main__":
    main()
