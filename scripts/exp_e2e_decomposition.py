#!/usr/bin/env python3
"""E2E codec decomposition: measure each resource's standalone throughput
and derive the pipeline bound, separating tunnel cost from everything a
local TPU host would pay.

The full e2e leg (bench.py `e2e_codec`) schedules, per frame:

    device: transform+quant        host: entropy enc + entropy dec
    device: dequant + inverse      wire: symbols down (int8/16), up (int8/16)

Device programs serialize on the one device; host entropy serializes on
the host; transfers ride the link. With perfect overlap the steady-state
throughput is bounded by the SLOWEST resource:

    bound = 1 / max(t_device, t_host, t_wire)        [per frame]

and a LOCAL TPU host (PCIe/ICI instead of a ~25 ms-RTT remote tunnel)
pays t_wire ~ bytes/PCIe-BW ~ negligible at these sizes, so

    bound_local = 1 / max(t_device, t_host)

Every term here is MEASURED (driver-captured on the same programs bench
runs), not projected: device legs by last-only-fetch burst timing, host
by running the real entropy coder, the wire by timing the narrowed
transfers themselves. The residual between `bound` and the measured
`e2e_codec` is the un-overlappable tunnel round-trip cost.

    python scripts/exp_e2e_decomposition.py [--n 500000] [--depth 10]
        [--burst 8]

Prints one JSON line with all legs.
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
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    if os.environ.get("RAHT3DGS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["RAHT3DGS_BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_frame
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        VoxelFrame,
        _dequant_gather_device,
        _fetch_stats,
        _finish_fetch,
        _inverse_device,
        _inverse_order_device,
        _quant_reorder_device,
        _start_fetch,
        _transform_device,
        build_entropy_stream,
        decode_entropy_channels,
        pack_quantized_upload,
        upload_quantized,
    )

    PAD = 1 << 19
    depth = args.depth
    codes, attrs, w = _synthetic_frame(args.n, depth, 3, pad_to=PAD)
    n = int((np.asarray(w) > 0).sum())
    codes_j = jnp.asarray(codes)
    attrs_j = jnp.asarray(attrs, dtype=jnp.float32)
    w_j = jnp.asarray(w, dtype=jnp.float32)
    frame = VoxelFrame(codes=codes_j, attributes=attrs_j, weights=w_j,
                       n_voxels=n, depth=depth, vmin=np.zeros(3),
                       width=float(1 << depth))
    codec = AttributeCodec(depth, dtype=jnp.float32)
    steps_j = jnp.asarray(args.step, dtype=jnp.float32)
    steps_1 = jnp.atleast_1d(steps_j)
    qf_j = jnp.asarray(codec.quant_f, dtype=jnp.float32)
    nvox_j = jnp.int32(n)
    B, iters = args.burst, args.iters

    def best(fn):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) / B)
        return min(ts)

    # ---- device encode compute: B x (transform + quant), last-only fetch
    def enc_burst():
        q = None
        for _ in range(B):
            coeffs, order, _ = _transform_device(
                codes_j, attrs_j, w_j, depth, "ragft", codec.impl)
            q = _quant_reorder_device(coeffs, steps_1, order, nvox_j,
                                      codec.quant_mode, qf_j)
        float(q[0, 0])

    enc_burst()
    t_enc_dev = best(enc_burst)

    # one frame's real streams for the host/wire legs
    coeffs, order, _ = _transform_device(codes_j, attrs_j, w_j, depth,
                                         "ragft", codec.impl)
    q_T = _quant_reorder_device(coeffs, steps_1, order, nvox_j,
                                codec.quant_mode, qf_j)
    st = np.asarray(_fetch_stats(q_T))
    q_np = _finish_fetch(_start_fetch(q_T, st))
    stream, _ = build_entropy_stream(
        q_np, frame, args.step, depth=depth, order_mode=codec.order_mode,
        chunk=codec.chunk, quant_mode=codec.quant_mode,
        quant_f=codec.quant_f, rec_delta=codec.rec_delta, dtype32=True,
        entropy=codec.entropy)
    vals_T = np.zeros((stream.n_channels, PAD), dtype=np.int32)
    decode_entropy_channels(stream, stream.n_voxels, vals_T)
    up = pack_quantized_upload(vals_T)
    wire_down_bytes = q_np.size * (1 if abs(q_np).max() < 128 else 2)
    pend = _start_fetch(q_T, st)
    wire_down_bytes = _finish_fetch(pend).size * pend.buf.dtype.itemsize \
        if hasattr(pend.buf, "dtype") else wire_down_bytes
    wire_up_bytes = up.vals.nbytes + up.patch_idx.nbytes + \
        up.patch_val.nbytes

    # ---- device decode compute: B x (dequant + inverse), last-only fetch
    vals_dev = upload_quantized(up)  # stays on device across the burst
    inv = _inverse_order_device(codes_j, w_j, nvox_j, depth,
                                stream.order_mode)

    def dec_burst():
        rec = None
        for _ in range(B):
            c = _dequant_gather_device(vals_dev, inv, steps_j,
                                       jnp.float32, stream.quant_mode)
            rec = _inverse_device(c, codes_j, w_j, depth)
        float(rec[0, 0])

    dec_burst()
    t_dec_dev = best(dec_burst)

    # ---- host entropy: real coder, encode + decode, no device involved
    def host_leg():
        for _ in range(B):
            s, _ = build_entropy_stream(
                q_np, frame, args.step, depth=depth,
                order_mode=codec.order_mode, chunk=codec.chunk,
                quant_mode=codec.quant_mode, quant_f=codec.quant_f,
                rec_delta=codec.rec_delta, dtype32=True,
                entropy=codec.entropy)
            decode_entropy_channels(s, s.n_voxels, vals_T)

    host_leg()
    t_host = best(host_leg)

    # ---- wire legs: the narrowed transfers alone (down: async fetch of
    # the quantized matrix; up: upload + a trivial consuming reduction)
    def wire_down():
        for _ in range(B):
            _finish_fetch(_start_fetch(q_T, st))

    wire_down()
    t_wire_down = best(wire_down)

    def wire_up():
        acc = None
        for _ in range(B):
            v = upload_quantized(pack_quantized_upload(vals_T))
            acc = jnp.max(v)
        int(acc)

    wire_up()
    t_wire_up = best(wire_up)

    t_device = t_enc_dev + t_dec_dev
    t_wire = t_wire_down + t_wire_up
    bound = 1.0 / max(t_device, t_host, t_wire)
    bound_local = 1.0 / max(t_device, t_host)
    rec = {
        "n": n, "depth": depth, "step": args.step, "burst": B,
        "t_ms_per_frame": {
            "device_encode": round(t_enc_dev * 1e3, 2),
            "device_decode": round(t_dec_dev * 1e3, 2),
            "host_entropy_encdec": round(t_host * 1e3, 2),
            "wire_down": round(t_wire_down * 1e3, 2),
            "wire_up": round(t_wire_up * 1e3, 2),
        },
        "wire_bytes": {"down": int(wire_down_bytes),
                       "up": int(wire_up_bytes)},
        "pipeline_bound_mpts": round(bound * n / 1e6, 3),
        "local_host_bound_mpts": round(bound_local * n / 1e6, 3),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
