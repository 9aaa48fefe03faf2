#!/usr/bin/env python3
"""Blocked cummax/cummin for the nearest-ge (V, N) scans.

`_nearest_ge` runs lax.cummax/cummin over (V=3J+2, N) arrays; the flat
lowering's cost scales with the scanned axis (the same pathology the
blocked ds prefix scan fixed in round 2 — raht_span._ds_cumsum). max/min
are selection ops, so ANY association is bitwise identical — the blocked
variant is a pure-speed candidate with no numeric contract risk.

Measures flat vs blocked at V=32 (J=10) and V=56 (J=18) on the bench
shape and asserts exact equality.

Run ON TPU:  python scripts/exp_nearest_ge.py [--block 256]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pad", type=int, default=1 << 19)
    ap.add_argument("--block", type=int, nargs="+", default=[256, 1024, 4096])
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
    from jax import lax

    sys.path.insert(0, "/root/repo")

    N = args.pad

    def blocked_scan(x, block, reverse, op, fill):
        V, n = x.shape
        nb = -(-n // block)
        pad = nb * block - n
        xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
        xp = xp.reshape(V, nb, block)
        inb = op(xp, axis=2, reverse=reverse)
        tot = inb[:, :, 0] if reverse else inb[:, :, -1]
        btot = op(tot, axis=1, reverse=reverse)
        if reverse:
            carry = jnp.concatenate(
                [btot[:, 1:], jnp.full((V, 1), fill, x.dtype)], axis=1
            )
        else:
            carry = jnp.concatenate(
                [jnp.full((V, 1), fill, x.dtype), btot[:, :-1]], axis=1
            )
        comb = jnp.maximum if op is lax.cummax else jnp.minimum
        out = comb(inb, carry[:, :, None])
        return out.reshape(V, nb * block)[:, :n]

    def nearest_ge_flat(B, n_vals):
        idx = jnp.arange(N, dtype=jnp.int32)
        vals = jnp.arange(n_vals, dtype=B.dtype)
        ge = B[None, :] >= vals[:, None]
        last = lax.cummax(jnp.where(ge, idx[None, :], -1), axis=1)
        nxt = lax.cummin(jnp.where(ge, idx[None, :], N), axis=1, reverse=True)
        onehot = (B[None, :] == vals[:, None]).astype(jnp.int32)
        last_excl = jnp.concatenate(
            [jnp.full((n_vals, 1), -1, jnp.int32), last[:, :-1]], axis=1)
        next_excl = jnp.concatenate(
            [nxt[:, 1:], jnp.full((n_vals, 1), N, jnp.int32)], axis=1)
        prev_ge = jnp.sum(onehot * last_excl, axis=0, dtype=jnp.int32)
        next_ge = jnp.sum(onehot * next_excl, axis=0, dtype=jnp.int32)
        return prev_ge, next_ge

    def nearest_ge_blocked(B, n_vals, block):
        idx = jnp.arange(N, dtype=jnp.int32)
        vals = jnp.arange(n_vals, dtype=B.dtype)
        ge = B[None, :] >= vals[:, None]
        last = blocked_scan(jnp.where(ge, idx[None, :], -1), block,
                            False, lax.cummax, -1)
        nxt = blocked_scan(jnp.where(ge, idx[None, :], N), block,
                           True, lax.cummin, N)
        onehot = (B[None, :] == vals[:, None]).astype(jnp.int32)
        last_excl = jnp.concatenate(
            [jnp.full((n_vals, 1), -1, jnp.int32), last[:, :-1]], axis=1)
        next_excl = jnp.concatenate(
            [nxt[:, 1:], jnp.full((n_vals, 1), N, jnp.int32)], axis=1)
        prev_ge = jnp.sum(onehot * last_excl, axis=0, dtype=jnp.int32)
        next_ge = jnp.sum(onehot * next_excl, axis=0, dtype=jnp.int32)
        return prev_ge, next_ge

    def measure(fn, *xs, name=""):
        out = fn(*xs)
        float(jnp.asarray(out[0][-1]))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            outs = [fn(*xs) for _ in range(args.burst)]
            float(jnp.asarray(outs[-1][0][-1]))
            best = min(best, (time.perf_counter() - t0) / args.burst)
        print(f"{name:34s}: {best * 1e3:7.2f} ms")
        return best

    print(f"platform={jax.devices()[0].platform} N={N}")
    rng = np.random.default_rng(0)
    for V in (32, 56):
        # realistic B distribution: mostly small values, geometric tail
        B = np.minimum(
            rng.geometric(0.35, size=N).astype(np.int32) - 1, V - 1
        )
        Bj = jnp.asarray(B, dtype=jnp.int32)
        flat = jax.jit(lambda b, V=V: nearest_ge_flat(b, V))
        want = tuple(np.asarray(x) for x in flat(Bj))
        measure(flat, Bj, name=f"flat V={V}")
        for blk in args.block:
            blkd = jax.jit(
                lambda b, V=V, blk=blk: nearest_ge_blocked(b, V, blk)
            )
            got = tuple(np.asarray(x) for x in blkd(Bj))
            assert all(np.array_equal(a, b) for a, b in zip(want, got)), (
                f"blocked V={V} block={blk} mismatch"
            )
            measure(blkd, Bj, name=f"blocked V={V} block={blk}")
    return 0


def variants_main():
    """Second experiment entry: contraction/materialization variants.

    flat        : the shipped formulation (onehot multiply-sum)
    take        : take_along_axis row selection instead of onehot-sum
    fused_where : threshold rows built once as (V, N) int32 with the
                  where() fused into the scan operand (no bool ge array)
    """
    import argparse
    import sys
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--pad", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(sys.argv[2:])

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    N = args.pad

    def core(B, n_vals, contraction):
        idx = jnp.arange(N, dtype=jnp.int32)
        vals = jnp.arange(n_vals, dtype=B.dtype)
        ge = B[None, :] >= vals[:, None]
        last = lax.cummax(jnp.where(ge, idx[None, :], -1), axis=1)
        nxt = lax.cummin(jnp.where(ge, idx[None, :], N), axis=1,
                         reverse=True)
        last_excl = jnp.concatenate(
            [jnp.full((n_vals, 1), -1, jnp.int32), last[:, :-1]], axis=1)
        next_excl = jnp.concatenate(
            [nxt[:, 1:], jnp.full((n_vals, 1), N, jnp.int32)], axis=1)
        if contraction == "take":
            prev_ge = jnp.take_along_axis(
                last_excl, B[None, :].astype(jnp.int32), axis=0)[0]
            next_ge = jnp.take_along_axis(
                next_excl, B[None, :].astype(jnp.int32), axis=0)[0]
        else:
            onehot = (B[None, :] == vals[:, None]).astype(jnp.int32)
            prev_ge = jnp.sum(onehot * last_excl, axis=0, dtype=jnp.int32)
            next_ge = jnp.sum(onehot * next_excl, axis=0, dtype=jnp.int32)
        return prev_ge, next_ge

    def measure(fn, *xs, name=""):
        out = fn(*xs)
        float(jnp.asarray(out[0][-1]))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            outs = [fn(*xs) for _ in range(args.burst)]
            float(jnp.asarray(outs[-1][0][-1]))
            best = min(best, (time.perf_counter() - t0) / args.burst)
        print(f"{name:34s}: {best * 1e3:7.2f} ms")
        return best

    print(f"platform={jax.devices()[0].platform} N={N}")
    rng = np.random.default_rng(0)
    for V in (32, 56):
        B = np.minimum(
            rng.geometric(0.35, size=N).astype(np.int32) - 1, V - 1)
        Bj = jnp.asarray(B, dtype=jnp.int32)
        flat = jax.jit(lambda b, V=V: core(b, V, "onehot"))
        take = jax.jit(lambda b, V=V: core(b, V, "take"))
        want = tuple(np.asarray(x) for x in flat(Bj))
        got = tuple(np.asarray(x) for x in take(Bj))
        assert all(np.array_equal(a, b) for a, b in zip(want, got))
        measure(flat, Bj, name=f"onehot-sum V={V}")
        measure(take, Bj, name=f"take_along_axis V={V}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "variants":
        variants_main()
        sys.exit(0)
    sys.exit(main())
