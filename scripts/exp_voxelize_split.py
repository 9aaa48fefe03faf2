"""Voxelizer cost split with last-only-fetch burst timing (cf. exp_inverse_split).

Pieces: morton encode+sort only; + segment sums; full voxelize; and the
fused gs pipeline step (voxelize -> forward RAHT) to see cross-stage fusion.
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
from raht3dgs_tpu.ops.morton import morton_encode, pad_code
from raht3dgs_tpu.ops.voxelize import voxelize

DEPTH = 10
N = 500_000


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
    print(json.dumps({"piece": tag, "ms": round(min(times) * 1e3, 2)}), flush=True)


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1024.0, (N, 3)).astype(np.float32)
    cols = rng.uniform(0, 255.0, (N, 3)).astype(np.float32)
    PC = jnp.asarray(np.concatenate([pts, cols], axis=1))
    V = jnp.asarray(pts)

    @jax.jit
    def enc_only(V):
        Vint = jnp.clip(V.astype(jnp.int64), 0, (1 << DEPTH) - 1)
        return morton_encode(Vint, DEPTH)

    @jax.jit
    def enc_sort(V):
        M = enc_only(V)
        return jnp.sort(M)

    @jax.jit
    def vox(PC):
        return voxelize(PC, DEPTH).attributes

    @jax.jit
    def vox_counts(PC):
        r = voxelize(PC, DEPTH)
        return r.codes[0] + r.counts[0]

    timed(enc_only, (V,), "morton_encode")
    timed(enc_sort, (V,), "encode+sort")
    timed(vox_counts, (PC,), "voxelize[codes+counts only]")
    timed(vox, (PC,), "voxelize[full]")


if __name__ == "__main__":
    main()
