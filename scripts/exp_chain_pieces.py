"""Chain-inverse piece costs on the current device (burst, last-only fetch).

Isolates the pointer-doubling inverse's cost structure at bench scale:

  gatherK        one (N, 5) row gather by random int32 indices
  gatherK_local  one (N, 5) row gather by indices within +-128 of self
  dbl1..dbl5     k unrolled doubling rounds over synthetic (par, g, d)
  onehot_mm      blocked one-hot matmul "gather" (256-block-local indices
                 only): build (256, 256) one-hot per block, MXU matmul —
                 the candidate replacement for block-local chain hops

Usage: python scripts/exp_chain_pieces.py [pad_log2]
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

PAD_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 19
N = 1 << PAD_LOG2
D = 3


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
    par = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    par_local = jnp.asarray(
        np.clip(np.arange(N) + rng.integers(-128, 128, N), 0, N - 1)
        .astype(np.int32))
    g = jnp.asarray(rng.uniform(0.5, 1.0, N).astype(np.float32))
    d = jnp.asarray(rng.uniform(-1, 1, (N, D)).astype(np.float32))

    @jax.jit
    def gatherK(par, g, d):
        pack = jnp.concatenate(
            [g[:, None], d, par.astype(jnp.float32)[:, None]], axis=1)
        gp = pack[par]
        return gp[0, 0] + gp[-1, 1]

    def rounds(k):
        @jax.jit
        def f(par, g, d):
            for _ in range(k):
                pack = jnp.concatenate(
                    [g[:, None], d, par.astype(jnp.float32)[:, None]],
                    axis=1)
                gp = pack[par]
                g = g * gp[:, 0]
                d = d + g[:, None] * gp[:, 1:1 + D]
                par = gp[:, 1 + D].astype(jnp.int32)
            return d[:, 0].sum()
        return f

    @jax.jit
    def onehot_mm(par_local, g, d):
        B = 256
        nb = N // B
        pack = jnp.concatenate(
            [g[:, None], d, par_local.astype(jnp.float32)[:, None]],
            axis=1)                                   # (N, 5)
        K = pack.shape[1]
        packb = pack.reshape(nb, B, K)
        # local index of each row's target within its own block; rows whose
        # target leaves the block get 0 here (a real kernel would mask)
        local = par_local.reshape(nb, B) - (
            jnp.arange(nb, dtype=jnp.int32)[:, None] * B)
        local = jnp.clip(local, 0, B - 1)
        onehot = (local[:, :, None] ==
                  jnp.arange(B, dtype=jnp.int32)[None, None, :]
                  ).astype(jnp.float32)               # (nb, B, B)
        out = jnp.einsum("bij,bjk->bik", onehot, packb,
                         preferred_element_type=jnp.float32)
        return out[0, 0, 0] + out[-1, -1, 1]

    timed(gatherK, (par, g, d), "gatherK_random")
    timed(gatherK, (par_local, g, d), "gatherK_local")
    for k in (1, 2, 5):
        timed(rounds(k), (par, g, d), f"dbl{k}")
    timed(onehot_mm, (par_local, g, d), "onehot_mm256")


if __name__ == "__main__":
    main()
