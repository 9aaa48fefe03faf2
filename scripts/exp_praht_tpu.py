#!/usr/bin/env python3
"""Device predicted-RAHT encoder throughput (ops/praht_device.py).

Times, on the default platform (TPU unless RAHT3DGS_BENCH_PLATFORM=cpu):
the per-frame plan build, one warm closed-loop step (program wait +
narrow symbol fetch), and a pipelined sweep — at the flagship operating
points (3DGS 56ch J=10; color 3ch J=10/J=18) on bench.py's synthetic
frame. Compare against the host-loop wall-clocks in docs/rd_predict.md.

    python scripts/exp_praht_tpu.py [--n 500000] [--sweep 9]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--sweep", type=int, default=9)
    ap.add_argument("--configs", nargs="+",
                    default=["10x56", "10x3", "18x3"],
                    help="depthxchannels legs")
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    if os.environ.get("RAHT3DGS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["RAHT3DGS_BENCH_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_frame
    from raht3dgs_tpu.models.pipeline import AttributeCodec, VoxelFrame

    for cfg in args.configs:
        depth, d_attr = (int(x) for x in cfg.split("x"))
        pad = 1 << 19
        codes, attrs, w = _synthetic_frame(args.n, depth, d_attr,
                                           pad_to=pad)
        n = int((np.asarray(w) > 0).sum())
        frame = VoxelFrame(
            codes=jnp.asarray(codes),
            attributes=jnp.asarray(attrs, dtype=jnp.float32),
            weights=jnp.asarray(w, dtype=jnp.float32),
            n_voxels=n, depth=depth, vmin=np.zeros(3),
            width=float(1 << depth),
        )
        codec = AttributeCodec(depth, dtype=jnp.float32, predict=True,
                               predict_impl="device")
        t0 = time.perf_counter()
        codec._praht_dev_context(frame)  # plan + true coeffs (async)
        enc = codec.encode(frame, 16.0)  # warm/compile + first step
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        enc = codec.encode(frame, 16.0)
        t_step = time.perf_counter() - t0
        steps = [float(s) for s in
                 np.geomspace(1, 64, args.sweep)]
        t0 = time.perf_counter()
        encs = codec.encode_sweep(frame, steps)
        t_sweep = time.perf_counter() - t0
        assert all(e.stream.bpp() > 0 for e in encs)
        print(json.dumps({
            "leg": f"praht_device_J{depth}_D{d_attr}", "n": n,
            "first_s": round(t_first, 3),
            "warm_step_s": round(t_step, 4),
            "sweep_steps": args.sweep,
            "sweep_s": round(t_sweep, 3),
            "sweep_s_per_step": round(t_sweep / args.sweep, 4),
            "warm_mpts_s": round(n / t_step / 1e6, 3),
            "mask": enc.stream.predict_mask,
            "bpp": round(enc.stream.bpp(), 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
