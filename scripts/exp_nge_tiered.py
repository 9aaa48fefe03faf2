#!/usr/bin/env python3
"""Tiered nearest->= scans: measure flat vs tiered on real code topology.

`_nearest_ge_tiered` (ops/raht_span.py) exploits the sorted-unique-code
bound |{i: B[i] >= v}| <= 2^(levels - v): high-threshold rows scan a
compacted candidate set instead of all N, cutting the dominant (V, N)
scan volume. Outputs are bitwise identical (selection ops picking the
same elements) — asserted here on every shape.

B must come from REAL sorted codes (exp_nearest_ge.py's geometric B does
not honor the structural bound the tiers rely on), so this script builds
Morton codes for surface-like clouds at the bench scale.

Run ON TPU:  python scripts/exp_nge_tiered.py
CPU sanity:  python scripts/exp_nge_tiered.py --platform cpu --pad 65536
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pad", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--with-w", action="store_true",
                    help="also measure the 4-scan W-propagation variant "
                    "(the chain-inverse topology)")
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
    from raht3dgs_tpu.ops.prelude import morton_codes_np
    from raht3dgs_tpu.ops.raht import num_levels
    from raht3dgs_tpu.ops.raht_span import (
        _msb,
        _nearest_ge_flat,
        _nearest_ge_tiered,
        _nge_tier_plan,
    )
    from raht3dgs_tpu.ops.voxelize import pad_code

    N = args.pad
    print(f"platform={jax.devices()[0].platform} N={N}")
    rng = np.random.default_rng(0)

    def build_B(J):
        """Padded sorted codes for a surface-like cloud -> (B, n_vals)."""
        side = 2 ** J
        m = int(N * 1.3)
        # spherical shell: surface-like occupancy (the codec's workload)
        u = rng.normal(size=(m, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
        r = 0.42 + 0.02 * rng.normal(size=(m, 1))
        pts = np.clip(((u * r + 0.5) * side), 0, side - 1).astype(np.int64)
        codes = np.unique(morton_codes_np(pts, J))[: N]
        n_real = len(codes)
        levels = num_levels(J, N)
        # pad exactly like prepare_voxel_frame: distinct ascending sentinels
        pads = np.asarray(
            pad_code(J, N, jnp.arange(N - n_real)).astype(jnp.uint64)
        )
        codes_p = np.concatenate([codes.astype(np.uint64), pads])
        dt = jnp.int32 if levels <= 31 else jnp.int64
        if levels >= 63:
            dt = jnp.uint64
        cj = jnp.asarray(codes_p.astype(np.uint64)).astype(dt)
        diff = cj[1:] ^ cj[:-1]
        B = jnp.concatenate([
            jnp.full((1,), levels + 1, jnp.int32),
            _msb(diff, levels).astype(jnp.int32),
        ])
        return B, levels + 2, n_real

    def measure(fn, *xs, name=""):
        out = fn(*xs)
        float(jnp.asarray(out[0][-1]))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            outs = [fn(*xs) for _ in range(args.burst)]
            float(jnp.asarray(outs[-1][0][-1]))
            best = min(best, (time.perf_counter() - t0) / args.burst)
        print(f"{name:40s}: {best * 1e3:7.2f} ms")
        return best

    for J in (10, 18, 21):
        B, n_vals, n_real = build_B(J)
        plan = _nge_tier_plan(N, n_vals)
        print(f"\nJ={J} n_real={n_real} V={n_vals} plan={plan}")
        flat = jax.jit(lambda b, nv=n_vals: _nearest_ge_flat(b, nv))
        tier = jax.jit(lambda b, nv=n_vals: _nearest_ge_tiered(b, nv))
        want = tuple(np.asarray(x) for x in flat(B))
        got = tuple(np.asarray(x) for x in tier(B))
        assert all(np.array_equal(a, b) for a, b in zip(want, got)), (
            f"J={J} positions mismatch"
        )
        tf = measure(flat, B, name=f"flat V={n_vals}")
        tt = measure(tier, B, name=f"tiered V={n_vals}")
        print(f"{'speedup':40s}: {tf / tt:7.2f}x")
        if args.with_w:
            w = rng.integers(1, 4, N).astype(np.float64)
            W = jnp.asarray(np.concatenate([[0.0], np.cumsum(w)]))
            flatw = jax.jit(lambda b, w_, nv=n_vals: _nearest_ge_flat(
                b, nv, w_))
            tierw = jax.jit(lambda b, w_, nv=n_vals: _nearest_ge_tiered(
                b, nv, w_))
            wantw = tuple(np.asarray(x) for x in flatw(B, W))
            gotw = tuple(np.asarray(x) for x in tierw(B, W))
            assert all(np.array_equal(a, b)
                       for a, b in zip(wantw, gotw)), f"J={J} W mismatch"
            tfw = measure(flatw, B, W, name=f"flat+W V={n_vals}")
            ttw = measure(tierw, B, W, name=f"tiered+W V={n_vals}")
            print(f"{'speedup (W)':40s}: {tfw / ttw:7.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
