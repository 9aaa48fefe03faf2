#!/usr/bin/env python3
"""Time the temporal prediction pipeline on the TPU at codec scale.

Measures the three derived stages of a P-frame (global motion, per-block
refinement, 27-probe prediction) plus the residual formation, at the
bench workload's scale (N=500k, J=10, D channels). Timing via scalar
fetch (block_until_ready is unreliable on the tunnel — CLAUDE.md).

    python scripts/exp_temporal_tpu.py [--n 500000] [--depth 10] [--d 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--d", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for smoke runs; "
                    "env vars alone lose to the sitecustomize TPU plugin)")
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # per-platform cache partition: CPU AOT entries in the TPU cache
    # poisoned round 1's bench (cross-machine feature mismatch)
    default_cache = ("/root/.jax_cache_cpu" if args.platform == "cpu"
                     else "/root/.jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAHT3DGS_COMPILE_CACHE",
                                     default_cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.ops.prelude import morton_codes_np
    from raht3dgs_tpu.ops.temporal import (
        estimate_global_motion,
        predict_from_previous,
        refine_block_motion,
        search_block_motion,
    )

    print("platform:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 2**args.depth, (2 * args.n, 3))
    _, first = np.unique(morton_codes_np(pts, args.depth),
                         return_index=True)
    pts = pts[first][: args.n]
    attrs = rng.uniform(0, 255, (len(pts), args.d))
    f_prev = prepare_voxel_frame(
        pts.astype(np.int64), attrs, args.depth, dtype=jnp.float32,
    )
    shifted = np.clip(pts + np.array([2, 1, 0]), 0, 2**args.depth - 1)
    _, first2 = np.unique(
        morton_codes_np(shifted, args.depth), return_index=True
    )
    f_cur = prepare_voxel_frame(
        shifted[np.sort(first2)].astype(np.int64),
        attrs[np.sort(first2)], args.depth,
        bucket=f_prev.codes.shape[0], dtype=jnp.float32,
    )

    def timed(name, fn):
        out = fn()
        jnp.asarray(out).reshape(-1)[0].item()  # fetch = barrier
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn()
            jnp.asarray(out).reshape(-1)[0].item()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3:.2f} ms")
        return out

    gm = timed("estimate_global_motion", lambda: estimate_global_motion(
        f_cur.codes, f_cur.weights, f_prev.codes, f_prev.weights,
        args.depth,
    ))
    print("  motion:", np.asarray(gm))
    rm = timed("refine_block_motion", lambda: refine_block_motion(
        f_cur.codes, f_cur.weights, f_prev.codes, f_prev.weights,
        args.depth, gm,
    ))
    pred = timed("predict_from_previous(27)", lambda: predict_from_previous(
        f_cur.codes, f_prev.codes, f_prev.attributes, f_prev.weights,
        args.depth, 27, rm,
    )[0])
    # v3 signalled-field search (encoder only): witness sampling A/B
    for st in (1, 4):
        timed(
            f"search_block_motion(stride={st})",
            lambda st=st: search_block_motion(
                f_cur.codes, f_cur.attributes, f_cur.weights,
                f_prev.codes, f_prev.attributes, f_prev.weights,
                args.depth, gm, stride=st,
            ),
        )
    occ = np.asarray(f_cur.weights) > 0
    hit = float(np.asarray(predict_from_previous(
        f_cur.codes, f_prev.codes, f_prev.attributes, f_prev.weights,
        args.depth, 27, rm,
    )[1])[occ].mean())
    print(f"hit rate {hit:.4f} over {int(occ.sum())} voxels")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
