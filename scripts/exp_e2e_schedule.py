#!/usr/bin/env python3
"""Probe why the achieved E2E codec throughput sits below the bench's own
measured pipeline bound (round-4: 80% at J=10, 62% at J=18), and measure
candidate schedules that close the gap.

Hypothesis under test: through the axon tunnel nothing actually overlaps —
``copy_to_host_async`` may be a no-op (the down-wire only moves when
``np.asarray`` blocks) and ``device_put`` may block the caller for the
whole up-wire transfer. If so the serial drain loop pays
down + host + up per frame (J=10: 95.7+30.6+52.4 = 178.7 ms ~ the achieved
184.5), and real overlap needs host THREADS, not async APIs.

Probes (each timed on the real tunnel, N=500k):
  A. async-copy reality: start_fetch -> busy host for 100 ms -> finish;
     overlap iff total ~ max(fetch, 100ms) instead of the sum.
  B. threaded fetch: a worker thread blocks in np.asarray while the main
     thread busy-works — GIL release check for the down-wire.
  C. threaded upload+dispatch: worker runs pack+upload+decode dispatch
     while the main thread busy-works.
  D. duplex: concurrent down-fetch (thread) + upload (thread) vs serial
     sum — is the tunnel full-duplex?
  E. pipelined burst with fetch/upload worker threads (candidate bench
     schedule) vs the current serial drain — must produce byte-identical
     streams.

Usage: python scripts/exp_e2e_schedule.py [--depth 10] [--burst 8]

Outcome (round 5): probes A-D established partial duplexity and full
host-entropy overlap; a per-event timeline of probe E's threaded burst
then caught the fetcher starting frame i+1's copy only after frame i
drained (~45 ms/frame of idle down-wire). The production schedule —
probe E plus the START-AHEAD in-flight window — lives in
``bench.py:pipelined_drain`` and reached 101%/94% of the in-run
pipeline bound (docs/performance.md "Round 5 — the schedule reaches its
own bound"). This script keeps the simpler no-window variant as the
measured baseline of that story.
"""

from __future__ import annotations

import argparse
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def busy_ms(ms: float) -> None:
    """Busy-wait on the GIL like real numpy host work would (sleep would
    release the GIL and overstate overlap)."""
    t0 = time.perf_counter()
    x = 0
    while (time.perf_counter() - t0) * 1e3 < ms:
        x += 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--step", type=float, default=16.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

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
        _narrow_fetch_enabled,
        _quant_reorder_device,
        _start_fetch,
        _transform_device,
        build_entropy_stream,
        decode_entropy_channels,
        pack_quantized_upload,
        upload_quantized,
    )

    N = 500_000
    PAD_TO = 1 << 19
    depth = args.depth
    BURST = args.burst
    impl = os.environ.get("RAHT3DGS_RAHT_IMPL", "span")

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    codes, attrs, weights = _synthetic_frame(N, depth, 3, pad_to=PAD_TO)
    n_real = int((weights > 0).sum())
    codes_j = jnp.asarray(codes)
    attrs_j = jnp.asarray(attrs, dtype=jnp.float32)
    weights_j = jnp.asarray(weights, dtype=jnp.float32)
    frame = VoxelFrame(codes=codes_j, attributes=attrs_j, weights=weights_j,
                       n_voxels=n_real, depth=depth, vmin=np.zeros(3),
                       width=float(1 << depth))
    codec = AttributeCodec(depth, dtype=jnp.float32, impl=impl)
    steps_j = jnp.asarray(args.step, dtype=jnp.float32)
    steps_1 = jnp.atleast_1d(steps_j)
    qf_j = jnp.asarray(codec.quant_f, dtype=jnp.float32)
    nvox_j = jnp.int32(n_real)
    narrow = _narrow_fetch_enabled()

    def transform_quant():
        coeffs, order, _ = _transform_device(
            codes_j, attrs_j, weights_j, depth, "ragft", impl)
        return _quant_reorder_device(
            coeffs, steps_1, order, nvox_j, codec.quant_mode, qf_j)

    # warm everything once
    q_T = transform_quant()
    st = np.asarray(_fetch_stats(q_T)) if narrow else None
    q_np = _finish_fetch(_start_fetch(q_T, st))
    stream, _ = build_entropy_stream(
        q_np, frame, args.step, depth=depth, order_mode=codec.order_mode,
        chunk=codec.chunk, quant_mode=codec.quant_mode,
        quant_f=codec.quant_f, rec_delta=codec.rec_delta, dtype32=True,
        entropy=codec.entropy)
    vals_T = np.zeros((stream.n_channels, PAD_TO), dtype=np.int32)
    decode_entropy_channels(stream, stream.n_voxels, vals_T)
    inv = _inverse_order_device(codes_j, weights_j, nvox_j, depth,
                                stream.order_mode)

    def upload_dispatch(vt):
        c = _dequant_gather_device(
            upload_quantized(pack_quantized_upload(vt)), inv, steps_j,
            jnp.float32, stream.quant_mode)
        return _inverse_device(c, codes_j, weights_j, depth)

    r = upload_dispatch(vals_T)
    float(r[0, 0])

    def timeit(fn, iters=None):
        best = float("inf")
        for _ in range(iters or args.iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # --- single-leg times (for reference)
    def fetch_once():
        _finish_fetch(_start_fetch(q_T, st))

    def upload_once():
        rr = upload_dispatch(vals_T)
        float(rr[0, 0])

    t_fetch = timeit(fetch_once)
    t_upload = timeit(upload_once)  # includes decode exec + result sync
    print(f"single fetch (down): {t_fetch*1e3:.1f} ms")
    print(f"upload+decode+sync (up + dec exec): {t_upload*1e3:.1f} ms",
          flush=True)

    # --- A: does copy_to_host_async overlap a busy host?
    def probe_a():
        p = _start_fetch(q_T, st)
        busy_ms(100)
        _finish_fetch(p)

    t_a = timeit(probe_a)
    print(f"A start_fetch + busy100 + finish: {t_a*1e3:.1f} ms "
          f"(overlap if ~{max(t_fetch, 0.1)*1e3:.0f}, serial if "
          f"~{(t_fetch+0.1)*1e3:.0f})", flush=True)

    # --- B: threaded np.asarray fetch while main busy-works
    def probe_b():
        out = {}

        def work():
            out["v"] = _finish_fetch(_start_fetch(q_T, st))

        th = threading.Thread(target=work)
        th.start()
        busy_ms(100)
        th.join()

    t_b = timeit(probe_b)
    print(f"B threaded fetch + busy100: {t_b*1e3:.1f} ms", flush=True)

    # --- C: threaded upload+dispatch while main busy-works
    def probe_c():
        out = {}

        def work():
            out["r"] = upload_dispatch(vals_T)
            float(out["r"][0, 0])

        th = threading.Thread(target=work)
        th.start()
        busy_ms(100)
        th.join()

    t_c = timeit(probe_c)
    print(f"C threaded upload + busy100: {t_c*1e3:.1f} ms", flush=True)

    # --- D: duplex — concurrent down + up from two threads
    def probe_d():
        th1 = threading.Thread(target=fetch_once)
        th2 = threading.Thread(target=upload_once)
        th1.start(); th2.start()
        th1.join(); th2.join()

    t_d = timeit(probe_d)
    print(f"D concurrent down+up: {t_d*1e3:.1f} ms (serial sum "
          f"{(t_fetch+t_upload)*1e3:.0f}, full-duplex "
          f"{max(t_fetch, t_upload)*1e3:.0f})", flush=True)

    # --- E: pipelined burst with worker threads vs the serial drain
    def host_entropy(qv):
        s, _ = build_entropy_stream(
            qv, frame, args.step, depth=depth, order_mode=codec.order_mode,
            chunk=codec.chunk, quant_mode=codec.quant_mode,
            quant_f=codec.quant_f, rec_delta=codec.rec_delta, dtype32=True,
            entropy=codec.entropy)
        vt = np.zeros((s.n_channels, PAD_TO), dtype=np.int32)
        decode_entropy_channels(s, s.n_voxels, vt)
        return s, vt

    def serial_burst():
        pend = []
        for _ in range(BURST):
            qq = transform_quant()
            pend.append((qq, _fetch_stats(qq) if narrow else None))
        fetches = []
        i = done = 0
        rec = None
        while done < len(pend):
            while len(fetches) < 2 and i < len(pend):
                qq, s2 = pend[i]
                fetches.append(_start_fetch(
                    qq, np.asarray(s2) if s2 is not None else None))
                i += 1
            qv = _finish_fetch(fetches.pop(0))
            s, vt = host_entropy(qv)
            rec = upload_dispatch(vt)
            done += 1
        float(rec[0, 0])
        return s

    def threaded_burst():
        pend = []
        for _ in range(BURST):
            qq = transform_quant()
            pend.append((qq, _fetch_stats(qq) if narrow else None))

        fetched = queue.Queue(maxsize=2)
        to_upload = queue.Queue()
        result = {}

        def fetcher():
            for qq, s2 in pend:
                p = _start_fetch(
                    qq, np.asarray(s2) if s2 is not None else None)
                fetched.put(_finish_fetch(p))

        def uploader():
            rec = None
            for _ in range(BURST):
                vt = to_upload.get()
                rec = upload_dispatch(vt)
            float(rec[0, 0])
            result["done"] = True

        tf = threading.Thread(target=fetcher)
        tu = threading.Thread(target=uploader)
        tf.start(); tu.start()
        s = None
        for _ in range(BURST):
            qv = fetched.get()
            s, vt = host_entropy(qv)
            to_upload.put(vt)
        tf.join(); tu.join()
        assert result.get("done")
        return s

    s_serial = serial_burst()
    s_threaded = threaded_burst()
    assert s_serial.to_bytes() == s_threaded.to_bytes(), \
        "threaded schedule changed the stream bytes"
    ref_bytes = codec.encode(frame, args.step).stream.to_bytes()
    assert s_serial.to_bytes() == ref_bytes, "burst diverged from codec"

    t_serial = timeit(serial_burst) / BURST
    t_threaded = timeit(threaded_burst) / BURST
    print(f"E serial drain:   {t_serial*1e3:.1f} ms/frame = "
          f"{n_real/t_serial/1e6:.3f} Mpts/s")
    print(f"E threaded drain: {t_threaded*1e3:.1f} ms/frame = "
          f"{n_real/t_threaded/1e6:.3f} Mpts/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
