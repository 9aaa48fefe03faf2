#!/usr/bin/env python3
"""Measure the reference pipeline's CPU throughput on THIS host.

Produces the ``vs_baseline`` denominators bench.py cites (BASELINE.md
"Same-machine CPU measurements") as a reproducible script instead of a
prose protocol. Two legs, mirroring the reference's own driver loop
(``/root/reference/python/encode_ply.py:100-210``):

- ``transform``: RAHT_param_reorder_fast + RAHT2_optimized +
  inverse_RAHT_optimized (prelude + forward + inverse), torch fp64;
- ``e2e``: prelude + forward + quantize (``floor(C/step + 0.5)``) +
  RA-GFT reorder + RLGR encode + RLGR decode + dequant + inverse reorder
  + inverse RAHT. The entropy stage uses OUR byte-identical native coder
  on contiguous numpy buffers — faster than the reference's
  pybind ``.tolist()`` crossing, so the resulting denominator is
  conservative (the true reference pays more per frame).
- ``sweep``: the reference driver's ACTUAL per-frame workload
  (``encode_ply.py:102-222``): prelude + forward ONCE, then the full
  11-step quantization grid — per step quantize, RA-GFT reorder, RLGR
  encode + decode, dequant, inverse reorder, inverse RAHT. Throughput is
  (frame, step) points per second: ``n * n_steps / wall``.

The workload is bench.py's own synthetic frame (same generator, same
seed) so numerator and denominator see identical inputs.

    python scripts/measure_reference_cpu.py [--n 500000] [--depth 10]
        [--step 16] [--iters 3] [--reference /root/reference/python]

Prints one JSON line per leg.
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
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--step", type=float, default=16.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--reference", default="/root/reference/python")
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, args.reference)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from RAHT import RAHT2_optimized
    from RAHT_param import RAHT_param_reorder_fast
    from iRAHT import inverse_RAHT_optimized

    from __graft_entry__ import _synthetic_frame
    from raht3dgs_tpu.codec.rlgr import rlgr_decode, rlgr_encode

    codes, attrs, weights = _synthetic_frame(args.n, args.depth, 3,
                                             pad_to=None)
    n = int((np.asarray(weights) > 0).sum())
    # reference input: float64 positions + attributes on the voxel grid
    from raht3dgs_tpu.ops.morton import morton_decode

    import jax.numpy as jnp

    V = np.asarray(morton_decode(jnp.asarray(codes)[:n], args.depth)
                   ).astype(np.float64)
    C = torch.from_numpy(np.asarray(attrs)[:n].astype(np.float64))
    Vt = torch.from_numpy(V)
    origin = torch.tensor([0.0, 0.0, 0.0], dtype=Vt.dtype)
    step = float(args.step)

    def transform_once():
        ListC, FlagsC, weightsC, order_RAGFT = RAHT_param_reorder_fast(
            Vt, origin, 2 ** args.depth, args.depth)
        Coeff, w = RAHT2_optimized(C, ListC, FlagsC, weightsC)
        rec = inverse_RAHT_optimized(Coeff, ListC, FlagsC, weightsC)
        return ListC, FlagsC, weightsC, order_RAGFT, Coeff, rec

    def e2e_once():
        ListC, FlagsC, weightsC, order_RAGFT = RAHT_param_reorder_fast(
            Vt, origin, 2 ** args.depth, args.depth)
        Coeff, w = RAHT2_optimized(C, ListC, FlagsC, weightsC)
        Coeff_enc = torch.floor(Coeff / step + 0.5)
        reordered = Coeff_enc.index_select(0, order_RAGFT)
        np_coeff = reordered.to(dtype=torch.int32).numpy()
        bufs = [rlgr_encode(np.ascontiguousarray(np_coeff[:, d]),
                            signed=True)[0]
                for d in range(3)]
        dec = np.stack(
            [rlgr_decode(b, n, signed=True)[0] for b in bufs], axis=1)
        Coeff_dec = torch.from_numpy(dec.astype(np.float64)) * step
        inv_order = torch.argsort(order_RAGFT)
        Coeff_dec = Coeff_dec[inv_order, :]
        rec = inverse_RAHT_optimized(Coeff_dec, ListC, FlagsC, weightsC)
        return rec, sum(len(b) for b in bufs)

    # the reference drivers' step grid (encode_ply.py colorStep)
    SWEEP_GRID = [1, 2, 4, 6, 8, 12, 16, 20, 24, 32, 64]

    def sweep_once():
        ListC, FlagsC, weightsC, order_RAGFT = RAHT_param_reorder_fast(
            Vt, origin, 2 ** args.depth, args.depth)
        Coeff, w = RAHT2_optimized(C, ListC, FlagsC, weightsC)
        inv_order = torch.argsort(order_RAGFT)
        rec = None
        for s in SWEEP_GRID:
            Coeff_enc = torch.floor(Coeff / s + 0.5)
            reordered = Coeff_enc.index_select(0, order_RAGFT)
            np_coeff = reordered.to(dtype=torch.int32).numpy()
            bufs = [rlgr_encode(np.ascontiguousarray(np_coeff[:, d]),
                                signed=True)[0]
                    for d in range(3)]
            dec = np.stack(
                [rlgr_decode(b, n, signed=True)[0] for b in bufs], axis=1)
            Coeff_dec = torch.from_numpy(dec.astype(np.float64)) * s
            Coeff_dec = Coeff_dec[inv_order, :]
            rec = inverse_RAHT_optimized(Coeff_dec, ListC, FlagsC,
                                         weightsC)
        return rec, len(SWEEP_GRID)

    # warmup + sanity
    *_, Coeff, rec0 = transform_once()
    assert torch.allclose(C, rec0, rtol=1e-5, atol=1e-8), \
        "reference roundtrip not lossless"
    rec1, nbytes = e2e_once()
    assert float(torch.abs(C - rec1).max()) <= 2 * step, \
        "reference e2e reconstruction error out of range"

    for name, fn in (("transform", transform_once), ("e2e", e2e_once),
                     ("sweep", sweep_once)):
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        best = min(times)
        points = n * (len(SWEEP_GRID) if name == "sweep" else 1)
        print(json.dumps({
            "leg": name, "n": n, "depth": args.depth, "step": step,
            "seconds": round(best, 4),
            "mpts_per_s": round(points / best / 1e6, 4),
            "iters": args.iters,
            "torch_threads": torch.get_num_threads(),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
