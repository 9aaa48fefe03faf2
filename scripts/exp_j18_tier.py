#!/usr/bin/env python3
"""J=18 (int64 code tier) throughput: find the cost, try digit-plane codes.

Round-2 measured the roundtrip at 19.6 Mpts/s (J=10, int32 codes) vs
13.8 Mpts/s (J=18, int64 codes). Two suspects:
  (a) int64 emulation in the topology pass (xor diff, _msb shifts,
      2x memory traffic on the codes array);
  (b) the (V, N) nearest-ge scans growing with V = 3J+2 (32 -> 56).

This experiment times, at the bench shape (N=500k):
  roundtrip J=10 / J=18          : context
  topology-only J=10 / J=18      : the codes-dependent subprogram
  topology J=18, digit-plane     : codes bitcast to 2x int32 up front;
                                   xor/msb on the planes, no int64 ops
  nearest-ge alone V=32 / V=56   : the (V, N) scan growth in isolation

Run ON TPU:  python scripts/exp_j18_tier.py
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--pad", type=int, default=1 << 19)
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
    from __graft_entry__ import _synthetic_frame
    from raht3dgs_tpu.ops.raht_span import (
        _msb,
        _nearest_ge,
        _span_topology,
        num_levels,
        raht_forward_span,
        raht_inverse_span,
    )

    frames = {}
    for depth in (10, 18):
        frames[depth] = _synthetic_frame(args.n, depth, 3, pad_to=args.pad)

    def measure(fn, *xs, name=""):
        out = fn(*xs)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            outs = [fn(*xs) for _ in range(args.burst)]
            float(jnp.asarray(
                jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / args.burst)
        print(f"{name:34s}: {best * 1e3:7.2f} ms "
              f"({args.n / best / 1e6:6.1f} Mpts/s)")
        return best

    print(f"platform={jax.devices()[0].platform} N={args.n} pad={args.pad}")

    for depth in (10, 18):
        codes, attrs, weights = frames[depth]
        cj = jnp.asarray(codes)
        aj = jnp.asarray(attrs, dtype=jnp.float32)
        wj = jnp.asarray(weights, dtype=jnp.float32)

        @jax.jit
        def roundtrip(c, a, w, depth=depth):
            res = raht_forward_span(c, a, w, depth)
            return raht_inverse_span(res.coeffs, c, w, depth)

        @jax.jit
        def topo(c, depth=depth):
            drop, prev_ge, next_ge, _, _ = _span_topology(c, depth)
            return drop[-1] + prev_ge[-1] + next_ge[-1]

        measure(roundtrip, cj, aj, wj, name=f"roundtrip J={depth}")
        measure(topo, cj, name=f"topology J={depth}")

    # digit-plane topology at J=18: bitcast the int64 codes to 2x int32
    # planes once, then xor/msb/diff purely in int32
    codes18 = jnp.asarray(frames[18][0])
    N = args.pad
    levels = num_levels(18, N)

    def _msb_u32(v):
        """msb of a uint32 (any value, v > 0) — pure 32-bit ops."""
        vf = v.astype(jnp.float32)
        e = ((lax.bitcast_convert_type(vf, jnp.int32) >> 23) & 0xFF) - 127
        e = jnp.clip(e, 0, 31).astype(jnp.int32)
        carry = (v >> e.astype(jnp.uint32)) == 0
        return jnp.where(carry, e - 1, e)

    def _digit_drop(c):
        pl = lax.bitcast_convert_type(c, jnp.int32)   # (N, 2) little-endian
        lo, hi = pl[:, 0], pl[:, 1]
        dlo = lax.bitcast_convert_type(lo[1:] ^ lo[:-1], jnp.uint32)
        dhi = lax.bitcast_convert_type(hi[1:] ^ hi[:-1], jnp.uint32)
        msb = jnp.where(dhi != 0, 32 + _msb_u32(dhi), _msb_u32(dlo))
        B = jnp.concatenate(
            [jnp.full((1,), levels + 1, jnp.int32), msb]
        )
        drop = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), (B[1:] + 1).astype(jnp.int32)]
        )
        return drop, B

    @jax.jit
    def topo_digit(c):
        drop, B = _digit_drop(c)
        prev_ge, next_ge = _nearest_ge(B, levels + 2)
        return drop[-1] + prev_ge[-1] + next_ge[-1]

    # correctness vs the int64 topology
    want = np.asarray(jax.jit(lambda c: _span_topology(c, 18)[0])(codes18))
    got = np.asarray(jax.jit(lambda c: _digit_drop(c)[0])(codes18))
    assert np.array_equal(want, got), "digit-plane drop mismatch"
    print("digit-plane topology == int64 topology (drop levels)")

    measure(topo_digit, codes18, name="topology J=18 digit-plane")

    # nearest-ge growth in isolation (V = 3J+2)
    rng = np.random.default_rng(0)
    for depth in (10, 18):
        V = 3 * depth + 2
        B = jnp.asarray(
            rng.integers(0, V, size=(args.pad,)), dtype=jnp.int32
        )

        @jax.jit
        def ge(B, V=V):
            p, n = _nearest_ge(B, V)
            return p[-1] + n[-1]

        measure(ge, B, name=f"nearest_ge V={V}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
