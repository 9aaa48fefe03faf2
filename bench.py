"""Benchmark: RAHT encode+decode transform throughput on one chip.

Measures the fused prelude+forward+inverse RAHT transform (the codec hot
path) at the reference scale: N=500k unique voxels, J=10, 3 color channels.

Baselines (vs_baseline denominators): the reference implementation
(RAHT_param_reorder_fast + RAHT2_optimized + inverse_RAHT_optimized,
/root/reference/python) measured on THIS machine's CPU (torch fp64; the
current driver host has one core) at the identical workload — see the
REFERENCE_CPU_* constants below and BASELINE.md for protocol and history
(the repo publishes no transform-throughput numbers of its own, and its
GPU figures cover voxelization only). A second metric, ``e2e_codec``,
covers the full encode->decode leg incl. entropy coding and the symbol
transfers.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "Mpts/s", "vs_baseline": ...,
   "platform": "tpu"|"cpu"|..., "fallback": bool, "probe_attempts": N}

Provenance fields: ``platform`` is the backend that actually produced the
number; ``fallback`` is true iff the default platform failed its health
probes and the run re-executed on CPU — a fallback number measures this
machine's CPU, not the codec's TPU throughput. The persistent compilation
cache is partitioned per platform so a CPU fallback can never load an AOT
entry compiled elsewhere (the round-1 failure mode: a cross-machine XLA:CPU
cache hit ran at 0.23 Mpts/s vs 0.79 measured natively).
"""

import json
import time

N = 500_000
DEPTH = 10
D_ATTR = 3
PAD_TO = 1 << 19  # 524288-slot bucket
# Same-machine reference denominators (BASELINE.md), reproducible via
# scripts/measure_reference_cpu.py. The current driver host has ONE CPU
# core; all legs re-measured on it 2026-08-20 on an otherwise-idle host
# (torch fp64; RLGR via the byte-identical native coder, which is FASTER
# than the reference's pybind path — a conservative denominator). These
# are HIGHER than the round-3 hand-measured 0.660/0.642 (taken while
# background work shared the single core), i.e. a harder bar:
REFERENCE_CPU_MPTS = 0.997        # prelude+RAHT+iRAHT roundtrip
REFERENCE_CPU_E2E_MPTS = 0.892    # + quant, reorder, RLGR enc+dec, dequant
REFERENCE_CPU_E2E_J18_MPTS = 0.467  # same e2e leg at the reference's J=18
# Amortized 11-step RD sweep — the reference drivers' ACTUAL per-frame
# workload (encode_ply.py:102-222: transform once, then per step quant +
# reorder + RLGR enc+dec + dequant + iRAHT). (frame, step) points/s,
# same-machine denominators via scripts/measure_reference_cpu.py "sweep"
# (measured 2026-08-21, idle host, best-of-4/3 iters; the same session's
# transform/e2e legs reproduced the recorded round-4 denominators to
# within the VM's ~10% steal variance).
REFERENCE_CPU_SWEEP_MPTS = 2.176
REFERENCE_CPU_SWEEP_J18_MPTS = 1.626
SWEEP_GRID = (1.0, 2.0, 4.0, 6.0, 8.0, 12.0, 16.0, 20.0, 24.0, 32.0, 64.0)
E2E_STEP = 16.0                   # mid-grid reference operating point
WARMUP = 2
ITERS = 3
BURST = 8
# E2E burst length: the threaded pipeline's fill/drain edges (first
# frame's transform+download, last frame's upload+decode) cost ~180 ms
# per burst regardless of length — 16 frames amortize them to ~11 ms/
# frame (8 left ~22 ms/frame of edge on the books)
E2E_BURST = 16
E2E_WINDOW = 2  # in-flight symbol fetches (mirrors encode_sweep)


PROBE_ATTEMPTS = 8


def pipelined_drain(n, start, finish, entropy, upload, window):
    """The shared 3-thread E2E schedule: a fetch thread (start-ahead
    window of in-flight device->host copies), host entropy on the
    calling thread, an upload+dispatch thread (FIFO keeps device-stream
    order, so a scalar fetched from the LAST dispatched output bounds
    the whole burst).

    ``start(i) -> pending``; ``finish(pending) -> q_np``;
    ``entropy(i, q_np) -> vals``; ``upload(i, vals)`` dispatches.
    Exception-safe: a failure in any stage unblocks the other threads
    via sentinels and re-raises in the caller — a raised
    build_entropy_stream must not leave the uploader parked in get()
    wedging the shared tunnel.
    """
    import queue
    import threading

    fetched = queue.Queue(maxsize=window)
    to_upload = queue.Queue()
    errs = []
    STOP = object()

    def fetcher():
        try:
            inflight = []
            i = 0
            for _ in range(n):
                while i < n and len(inflight) < window:
                    inflight.append(start(i))
                    i += 1
                fetched.put(finish(inflight.pop(0)))
        except BaseException as e:  # noqa: BLE001 - re-raised below
            errs.append(e)
            fetched.put(STOP)

    def uploader():
        try:
            for i in range(n):
                vals = to_upload.get()
                if vals is STOP:
                    return
                upload(i, vals)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    tf = threading.Thread(target=fetcher)
    tu = threading.Thread(target=uploader)
    tf.start()
    tu.start()
    try:
        for i in range(n):
            q_np = fetched.get()
            if q_np is STOP:
                break
            to_upload.put(entropy(i, q_np))
    except BaseException as e:  # noqa: BLE001
        errs.append(e)
    finally:
        to_upload.put(STOP)  # no-op after a full run; unblocks on error
        while tf.is_alive():  # drain so a full window can't wedge put()
            try:
                fetched.get(timeout=0.1)
            except queue.Empty:
                pass
        tf.join()
        tu.join()
    if errs:
        raise errs[0]


def _platform_healthy(timeout_s: float = 150.0,
                      attempts: int = PROBE_ATTEMPTS) -> int:
    """The TPU tunnel in this environment can wedge (in-flight fetches hang
    forever and block_until_ready returns without waiting). Probe with a
    real value fetch under a watchdog thread before committing to it.

    Retries: the tunnel also fails probes transiently (e.g. right after
    another client process exits), which must not be mistaken for a wedge —
    a false fallback to CPU under-reports by ~31x (the round-1 record).

    Returns the number of probe attempts made; > ``attempts`` means all
    failed (unhealthy).
    """
    import threading

    for attempt in range(attempts):
        ok = [False]

        def probe():
            try:
                import jax.numpy as jnp

                if float(jnp.sum(jnp.arange(64, dtype=jnp.float32))) == 2016.0:
                    ok[0] = True
            except Exception:
                pass

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout_s)
        if ok[0]:
            return attempt + 1
        if attempt + 1 < attempts:
            import sys

            print(
                f"bench: platform probe attempt {attempt + 1} failed; retrying",
                file=sys.stderr,
            )
            time.sleep(30)
    return attempts + 1


def main() -> None:
    import os
    import sys

    import jax

    probe_attempts = int(os.environ.get("RAHT3DGS_BENCH_PROBES", "0"))
    fallback = os.environ.get("RAHT3DGS_BENCH_FALLBACK", "") not in (
        "0", "false", "")
    if os.environ.get("RAHT3DGS_BENCH_PLATFORM"):
        plat = os.environ["RAHT3DGS_BENCH_PLATFORM"]
        jax.config.update("jax_platforms", plat)
        # Partition the persistent cache per platform: a CPU (fallback) run
        # must never load an XLA:CPU AOT entry compiled on another machine.
        cache_dir = "/root/.jax_cache" if plat != "cpu" else "/root/.jax_cache_cpu"
    else:
        cache_dir = "/root/.jax_cache"
        probe_attempts = _platform_healthy()
        if probe_attempts > PROBE_ATTEMPTS:
            print(
                f"bench: default platform unresponsive after {PROBE_ATTEMPTS}"
                " probes; falling back to CPU (provenance recorded in JSON)",
                file=sys.stderr,
            )
            os.execvpe(
                sys.executable,
                [sys.executable, os.path.abspath(__file__)],
                {**os.environ, "RAHT3DGS_BENCH_PLATFORM": "cpu",
                 "JAX_PLATFORMS": "cpu",
                 "RAHT3DGS_BENCH_FALLBACK": "1",
                 # report the probes actually made, not the > sentinel
                 "RAHT3DGS_BENCH_PROBES": str(PROBE_ATTEMPTS)},
            )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _synthetic_frame
    from raht3dgs_tpu.ops.raht import get_forward_impl, raht_inverse

    impl = os.environ.get("RAHT3DGS_RAHT_IMPL", "span")
    fwd = get_forward_impl(impl)
    codes, attrs, weights = _synthetic_frame(N, DEPTH, D_ATTR, pad_to=PAD_TO)
    n_real = int((weights > 0).sum())

    if impl == "span":
        from raht3dgs_tpu.ops.raht_span import raht_inverse_span

        @jax.jit
        def roundtrip(codes, attrs, weights):
            res = fwd(codes, attrs, weights, DEPTH)
            return raht_inverse_span(res.coeffs, codes, weights, DEPTH)
    else:
        @jax.jit
        def roundtrip(codes, attrs, weights):
            res = fwd(codes, attrs, weights, DEPTH)
            rec = raht_inverse(res.coeffs, res.structure, DEPTH)
            return rec

    codes_j = jnp.asarray(codes)
    attrs_j = jnp.asarray(attrs, dtype=jnp.float32)
    weights_j = jnp.asarray(weights, dtype=jnp.float32)

    # NB: block_until_ready does not reliably wait on the axon tunnel;
    # fetch a scalar each iteration to force completion.
    for _ in range(WARMUP):
        out = roundtrip(codes_j, attrs_j, weights_j)
        float(out[0, 0])

    # Sustained throughput: dispatch a burst of BURST frames through the
    # same executable, then drain. Executions on one device stream run
    # in-order, so fetching a scalar from the LAST output bounds completion
    # of the whole burst — fetching every output would pay the ~30 ms
    # host<->device tunnel round-trip per frame and dominate the
    # measurement (the same offline-throughput timing MLPerf uses).
    #
    # The shared tunnel occasionally degrades ~100x for a few seconds
    # (observed mid-round: 0.22 Mpts/s immediately followed by 15.3); a
    # clearly-degraded attempt is re-measured after a pause rather than
    # reported as the codec's throughput.
    def measure():
        times = []
        outs = None
        for _ in range(ITERS):
            t0 = time.perf_counter()
            outs = [roundtrip(codes_j, attrs_j, weights_j) for _ in range(BURST)]
            float(outs[-1][0, 0])
            times.append((time.perf_counter() - t0) / BURST)
        return min(times), outs[-1]

    # the threshold targets transient tunnel stalls on the TPU platform;
    # an explicit CPU run is legitimately slower than it
    DEGRADED_MPTS = 0.0 if os.environ.get("RAHT3DGS_BENCH_PLATFORM") == "cpu" else 2.0
    best, out = measure()
    for _ in range(2):
        if n_real / best / 1e6 >= DEGRADED_MPTS:
            break
        print("bench: degraded measurement (transient tunnel stall?); "
              "retrying", file=sys.stderr)
        time.sleep(20)
        b2, out = measure()
        best = min(best, b2)
    if DEGRADED_MPTS and n_real / best / 1e6 < DEGRADED_MPTS:
        print(
            "bench: WARNING - throughput still degraded after retries; the "
            "reported number reflects a stalled device link, not the codec",
            file=sys.stderr,
        )

    # sanity: reconstruction must be lossless to fp32 tolerance
    rec = np.asarray(out)[:n_real]
    err = np.abs(rec - attrs[:n_real]).max()
    assert err < 1e-2, f"roundtrip error {err}"

    # ---- second metric: the full E2E codec leg — per frame: transform +
    # quantize + reorder + device->host symbol fetch + RLGR encode + RLGR
    # decode + quantized upload + dequant + inverse RAHT. Every frame of
    # the burst pays the FULL encode (incl. its own forward transform —
    # round 3 amortized it sweep-style across the burst; this is the
    # honest per-frame cost) and the full decode; the burst is pipelined
    # with a LAST-ONLY fetch of the final reconstruction (executions on
    # one device stream run in order, so a scalar from the last frame's
    # output bounds the whole burst). All device programs dispatch
    # asynchronously; the host drains entropy encode+decode behind the
    # windowed symbol fetches, so frame k's host work overlaps frame
    # k+1's device work and transfers — the same schedule a streaming
    # sequence codec runs. Symbols cross the link in the narrowest exact
    # wire dtype (int8/int16 + sparse outlier patch) both ways. The
    # reconstruction stays on device — the serving path
    # (models/serving.py) consumes it there.
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

    def run_e2e_leg(depth, codes_j, attrs_j, weights_j, attrs_np, n_real,
                    baseline_mpts):
        frame = VoxelFrame(
            codes=codes_j, attributes=attrs_j, weights=weights_j,
            n_voxels=n_real, depth=depth, vmin=np.zeros(3),
            width=float(1 << depth),
        )
        codec = AttributeCodec(depth, dtype=jnp.float32, impl=impl)
        steps_j = jnp.asarray(E2E_STEP, dtype=jnp.float32)
        steps_1 = jnp.atleast_1d(steps_j)
        qf_j = jnp.asarray(codec.quant_f, dtype=jnp.float32)
        nvox_j = jnp.int32(n_real)

        def e2e_burst():
            # Threaded pipeline (round 5): the round-4 serial drain left
            # the wire idle during host entropy and the up-wire serial to
            # the down-wire; scripts/exp_e2e_schedule.py measured the
            # tunnel PARTIALLY DUPLEX (down+up concurrently ~127 ms vs
            # 178 serial at J=10) and host threads overlapping both
            # directions. pipelined_drain runs the 3-thread schedule
            # with the start-ahead fetch window (frame i+1's host copy
            # IN FLIGHT while frame i drains — without it the down-wire
            # idles ~45 ms/frame, timeline-traced). Byte-equality with
            # the serial codec API is asserted below — same programs,
            # same streams.
            narrow = _narrow_fetch_enabled()
            pend = []
            for _ in range(E2E_BURST):
                coeffs, order, _ = _transform_device(
                    codes_j, attrs_j, weights_j, depth, "ragft", impl)
                q_T = _quant_reorder_device(
                    coeffs, steps_1, order, nvox_j, codec.quant_mode, qf_j)
                pend.append((q_T, _fetch_stats(q_T) if narrow else None))
            # ONE stacked stats fetch for the whole burst: a per-frame
            # (3,) stats fetch costs a full tunnel RTT serialized with
            # the big fetch in the same thread
            sts = (np.asarray(jnp.stack([st for _, st in pend]))
                   if narrow else None)
            out = {}

            def entropy(i, q_np):
                stream, _ = build_entropy_stream(
                    q_np, frame, E2E_STEP, depth=depth,
                    order_mode=codec.order_mode, chunk=codec.chunk,
                    quant_mode=codec.quant_mode, quant_f=codec.quant_f,
                    rec_delta=codec.rec_delta, dtype32=True,
                    entropy=codec.entropy,
                )
                out["stream"] = stream
                vals_T = np.zeros((stream.n_channels, PAD_TO),
                                  dtype=np.int32)
                decode_entropy_channels(stream, stream.n_voxels, vals_T)
                return vals_T

            def upload(i, vals_T):
                inv = _inverse_order_device(
                    codes_j, weights_j, nvox_j, depth, codec.order_mode)
                coeffs_d = _dequant_gather_device(
                    upload_quantized(pack_quantized_upload(vals_T)),
                    inv, steps_j, jnp.float32, codec.quant_mode,
                )
                rec = _inverse_device(coeffs_d, codes_j, weights_j,
                                      depth)
                if i == E2E_BURST - 1:
                    float(rec[0, 0])  # bounds the burst (in-order)
                    out["rec"] = rec

            pipelined_drain(
                E2E_BURST,
                lambda i: _start_fetch(
                    pend[i][0], sts[i] if sts is not None else None),
                _finish_fetch, entropy, upload, E2E_WINDOW)
            return out["stream"], out["rec"]

        stream, rec2 = e2e_burst()  # warmup (compiles decode programs)
        # the hand-pipelined schedule must produce the exact bytes the
        # codec's serial API does — anything else measures a different
        # program
        assert stream.to_bytes() == codec.encode(
            frame, E2E_STEP).stream.to_bytes(), \
            "e2e stream diverged from codec"

        def measure_e2e():
            times = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                stream, rec2 = e2e_burst()
                times.append((time.perf_counter() - t0) / E2E_BURST)
            return min(times), stream, rec2

        E2E_DEGRADED = 0.0 if os.environ.get(
            "RAHT3DGS_BENCH_PLATFORM") == "cpu" else 0.5
        best_e2e, stream, rec2 = measure_e2e()
        for _ in range(2):
            if n_real / best_e2e / 1e6 >= E2E_DEGRADED:
                break
            print("bench: degraded e2e measurement; retrying",
                  file=sys.stderr)
            time.sleep(20)
            b2, stream, rec2 = measure_e2e()
            best_e2e = min(best_e2e, b2)
        err2 = np.abs(np.asarray(rec2)[:n_real] - attrs_np[:n_real]).max()
        # sanity (not the parity bound): quantization noise through the
        # inverse stays O(step); corruption would be orders larger
        assert err2 <= 2 * E2E_STEP, f"e2e reconstruction error {err2}"
        assert stream.bpp() > 0
        e2e_mpts = n_real / best_e2e / 1e6
        rec = {
            "value": round(e2e_mpts, 4),
            "unit": "Mpts/s",
            "vs_baseline": round(e2e_mpts / baseline_mpts, 2),
            "baseline_mpts": baseline_mpts,
            "step": E2E_STEP,
            "depth": depth,
            "burst": E2E_BURST,
            "bpp": round(stream.bpp(), 4),
        }
        # Per-resource decomposition (docs/performance.md "captured and
        # decomposed"): each leg's standalone per-frame cost on the SAME
        # programs — device bursts with last-only fetch, the real host
        # entropy coder, the narrowed wire transfers alone. Derives the
        # steady-state pipeline bound (slowest resource) and the
        # local-host bound (what these programs sustain where transfers
        # cost ~1 ms instead of the tunnel's share). Recorded so every
        # round's BENCH json carries the tunnel-vs-compute evidence.
        if os.environ.get("RAHT3DGS_BENCH_DECOMP", "1") not in (
                "0", "false", ""):
            def leg_best(fn, iters=2):
                ts = []
                for _ in range(iters):
                    t0 = time.perf_counter()
                    fn()
                    ts.append((time.perf_counter() - t0) / E2E_BURST)
                return min(ts)

            coeffs, order, _ = _transform_device(
                codes_j, attrs_j, weights_j, depth, "ragft", impl)
            q_T = _quant_reorder_device(
                coeffs, steps_1, order, nvox_j, codec.quant_mode, qf_j)
            st = np.asarray(_fetch_stats(q_T)) if _narrow_fetch_enabled() \
                else None
            q_np = _finish_fetch(_start_fetch(q_T, st))
            vals_T = np.zeros((stream.n_channels, PAD_TO), dtype=np.int32)
            decode_entropy_channels(stream, stream.n_voxels, vals_T)
            up = pack_quantized_upload(vals_T)
            vals_dev = upload_quantized(up)
            inv = _inverse_order_device(
                codes_j, weights_j, nvox_j, depth, stream.order_mode)

            def enc_leg():
                q = None
                for _ in range(E2E_BURST):
                    c, o, _ = _transform_device(
                        codes_j, attrs_j, weights_j, depth, "ragft", impl)
                    q = _quant_reorder_device(
                        c, steps_1, o, nvox_j, codec.quant_mode, qf_j)
                float(q[0, 0])

            def dec_leg():
                r = None
                for _ in range(E2E_BURST):
                    c = _dequant_gather_device(
                        vals_dev, inv, steps_j, jnp.float32,
                        stream.quant_mode)
                    r = _inverse_device(c, codes_j, weights_j, depth)
                float(r[0, 0])

            def host_leg():
                for _ in range(E2E_BURST):
                    s, _ = build_entropy_stream(
                        q_np, frame, E2E_STEP, depth=depth,
                        order_mode=codec.order_mode, chunk=codec.chunk,
                        quant_mode=codec.quant_mode, quant_f=codec.quant_f,
                        rec_delta=codec.rec_delta, dtype32=True,
                        entropy=codec.entropy)
                    decode_entropy_channels(s, s.n_voxels, vals_T)

            def wire_down_leg():
                for _ in range(E2E_BURST):
                    _finish_fetch(_start_fetch(q_T, st))

            def wire_up_leg():
                acc = None
                for _ in range(E2E_BURST):
                    acc = jnp.max(upload_quantized(
                        pack_quantized_upload(vals_T)))
                int(acc)

            import threading as _threading

            def wire_concurrent_leg():
                # both directions at once, per frame — the tunnel is
                # PARTIALLY DUPLEX (scripts/exp_e2e_schedule.py), so the
                # schedule's true wire resource is this measured
                # concurrent cost, not down+up summed
                t1 = _threading.Thread(target=wire_down_leg)
                t2 = _threading.Thread(target=wire_up_leg)
                t1.start(); t2.start()
                t1.join(); t2.join()

            def wire_plus_host_leg():
                # the steady-state resource CONFLICT: both wire
                # directions while the host runs the entropy coder. On a
                # 1-core host the tunnel client's own CPU share (grpc/
                # proto (de)serialization, int8 widen, pack) serializes
                # with entropy — so this coupled term, not the pure wire
                # time, is what a pipelined schedule can actually reach.
                t1 = _threading.Thread(target=wire_down_leg)
                t2 = _threading.Thread(target=wire_up_leg)
                t1.start(); t2.start()
                host_leg()
                t1.join(); t2.join()

            for leg in (enc_leg, dec_leg, host_leg, wire_down_leg,
                        wire_up_leg, wire_concurrent_leg,
                        wire_plus_host_leg):
                leg()  # warmup (programs are cached; syncs the queue)
            t_enc, t_dec = leg_best(enc_leg), leg_best(dec_leg)
            t_host = leg_best(host_leg)
            t_down, t_up = leg_best(wire_down_leg), leg_best(wire_up_leg)
            t_wire = leg_best(wire_concurrent_leg)
            t_wh = leg_best(wire_plus_host_leg)
            bound = 1.0 / max(t_enc + t_dec, t_wh)
            bound_local = 1.0 / max(t_enc + t_dec, t_host)
            rec["decomposition"] = {
                "t_ms_per_frame": {
                    "device_encode": round(t_enc * 1e3, 2),
                    "device_decode": round(t_dec * 1e3, 2),
                    "host_entropy_encdec": round(t_host * 1e3, 2),
                    "wire_down": round(t_down * 1e3, 2),
                    "wire_up": round(t_up * 1e3, 2),
                    "wire_concurrent": round(t_wire * 1e3, 2),
                    "wire_plus_host": round(t_wh * 1e3, 2),
                },
                "pipeline_bound_mpts": round(bound * n_real / 1e6, 3),
                "local_host_bound_mpts": round(
                    bound_local * n_real / 1e6, 3),
                "local_host_bound_vs_baseline": round(
                    bound_local * n_real / 1e6 / baseline_mpts, 2),
            }
        return rec

    def run_sweep_leg(depth, codes_j, attrs_j, weights_j, n_real,
                      baseline_mpts):
        """Amortized 11-step RD sweep (the reference drivers' workload):
        ONE transform + hoisted reorder, then per step an elementwise
        quant program, the threaded fetch/entropy/upload drain, and the
        device dequant+inverse — (frame, step) points per second."""
        from raht3dgs_tpu.models.pipeline import (
            _quant_T_device,
            _reorder_T_device,
        )

        frame = VoxelFrame(
            codes=codes_j, attributes=attrs_j, weights=weights_j,
            n_voxels=n_real, depth=depth, vmin=np.zeros(3),
            width=float(1 << depth),
        )
        codec = AttributeCodec(depth, dtype=jnp.float32, impl=impl)
        qf_j = jnp.asarray(codec.quant_f, dtype=jnp.float32)
        nvox_j = jnp.int32(n_real)
        narrow = _narrow_fetch_enabled()

        def sweep_once():
            coeffs, order, _ = _transform_device(
                codes_j, attrs_j, weights_j, depth, "ragft", impl)
            cT = _reorder_T_device(coeffs, order, nvox_j)
            pend = []
            for s in SWEEP_GRID:
                q_T = _quant_T_device(
                    cT, jnp.atleast_1d(jnp.asarray(s, jnp.float32)),
                    codec.quant_mode, qf_j)
                pend.append((s, q_T,
                             _fetch_stats(q_T) if narrow else None))
            sts = (np.asarray(jnp.stack([st for _, _, st in pend]))
                   if narrow else None)
            out = {}
            inv = _inverse_order_device(
                codes_j, weights_j, nvox_j, depth, codec.order_mode)

            def entropy(i, q_np):
                s = pend[i][0]
                stream, _ = build_entropy_stream(
                    q_np, frame, s, depth=depth,
                    order_mode=codec.order_mode, chunk=codec.chunk,
                    quant_mode=codec.quant_mode, quant_f=codec.quant_f,
                    rec_delta=codec.rec_delta, dtype32=True,
                    entropy=codec.entropy,
                )
                if s == E2E_STEP:
                    out["mid"] = stream
                vals_T = np.zeros((stream.n_channels, PAD_TO),
                                  dtype=np.int32)
                decode_entropy_channels(stream, stream.n_voxels, vals_T)
                return vals_T

            def upload(i, vals_T):
                coeffs_d = _dequant_gather_device(
                    upload_quantized(pack_quantized_upload(vals_T)),
                    inv, jnp.asarray(pend[i][0], jnp.float32),
                    jnp.float32, codec.quant_mode,
                )
                rec = _inverse_device(coeffs_d, codes_j, weights_j,
                                      depth)
                if i == len(pend) - 1:
                    float(rec[0, 0])

            pipelined_drain(
                len(pend),
                lambda i: _start_fetch(
                    pend[i][1], sts[i] if sts is not None else None),
                _finish_fetch, entropy, upload, E2E_WINDOW)
            return out["mid"]

        mid = sweep_once()  # warmup/compile
        # the pipelined sweep must produce the exact bytes the serial
        # codec API does at the shared operating point
        assert mid.to_bytes() == codec.encode(
            frame, E2E_STEP).stream.to_bytes(), \
            "sweep stream diverged from codec"

        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            sweep_once()
            times.append(time.perf_counter() - t0)
        best = min(times)
        pts = n_real * len(SWEEP_GRID)
        mpts = pts / best / 1e6
        rec = {
            "value": round(mpts, 4),
            "unit": "Mpts/s",
            "n_steps": len(SWEEP_GRID),
            "seconds_per_sweep": round(best, 3),
            "depth": depth,
        }
        if baseline_mpts:
            rec["vs_baseline"] = round(mpts / baseline_mpts, 2)
            rec["baseline_mpts"] = baseline_mpts
        return rec

    e2e = run_e2e_leg(DEPTH, codes_j, attrs_j, weights_j, attrs, n_real,
                      REFERENCE_CPU_E2E_MPTS)

    # J=18 leg — the reference's canonical color depth
    # (/root/reference/python/encode_ply.py:27); int64 code tier.
    # RAHT3DGS_BENCH_J18=0 skips it (e.g. when probing a flaky tunnel).
    e2e_j18 = None
    codes18 = attrs18 = w18 = None
    if os.environ.get("RAHT3DGS_BENCH_J18", "1") not in ("0", "false", ""):
        codes18, attrs18, w18 = _synthetic_frame(N, 18, D_ATTR,
                                                 pad_to=PAD_TO)
        n18 = int((w18 > 0).sum())
        e2e_j18 = run_e2e_leg(
            18, jnp.asarray(codes18),
            jnp.asarray(attrs18, dtype=jnp.float32),
            jnp.asarray(w18, dtype=jnp.float32), attrs18, n18,
            REFERENCE_CPU_E2E_J18_MPTS,
        )

    # third metric: the amortized RD sweep (RAHT3DGS_BENCH_SWEEP=0 skips)
    sweep = None
    if os.environ.get("RAHT3DGS_BENCH_SWEEP", "1") not in ("0", "false",
                                                           ""):
        sweep = run_sweep_leg(DEPTH, codes_j, attrs_j, weights_j, n_real,
                              REFERENCE_CPU_SWEEP_MPTS)
        if codes18 is not None:
            s18 = run_sweep_leg(
                18, jnp.asarray(codes18),
                jnp.asarray(attrs18, dtype=jnp.float32),
                jnp.asarray(w18, dtype=jnp.float32), n18,
                REFERENCE_CPU_SWEEP_J18_MPTS,
            )
            sweep["value_j18"] = s18["value"]
            sweep["seconds_per_sweep_j18"] = s18["seconds_per_sweep"]
            if "vs_baseline" in s18:
                sweep["vs_baseline_j18"] = s18["vs_baseline"]
                sweep["baseline_j18_mpts"] = s18["baseline_mpts"]

    mpts = n_real / best / 1e6
    record = {
        "metric": "raht_transform_roundtrip_throughput",
        "value": round(mpts, 4),
        "unit": "Mpts/s",
        "vs_baseline": round(mpts / REFERENCE_CPU_MPTS, 2),
        "platform": jax.devices()[0].platform,
        "fallback": fallback,
        "probe_attempts": probe_attempts,
        "baseline_mpts": REFERENCE_CPU_MPTS,
        "e2e_codec": e2e,
    }
    if e2e_j18 is not None:
        record["e2e_codec_j18"] = e2e_j18
    if sweep is not None:
        record["sweep_codec"] = sweep
    # Last-known-good bookkeeping: the shared tunnel can wedge for hours
    # (CLAUDE.md "TPU etiquette"), so a fallback record additionally cites
    # the most recent successful on-TPU measurement from this machine —
    # clearly labelled as historical, never substituted for the value.
    last_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_tpu_last.json")
    if not fallback and record["platform"] != "cpu":
        try:
            with open(last_path, "w") as f:
                json.dump({k: record[k] for k in
                           ("value", "unit", "vs_baseline", "platform")}
                          | {"measured_at": time.strftime(
                              "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f)
        except OSError:
            pass
    elif fallback:
        try:
            with open(last_path) as f:
                record["last_tpu"] = json.load(f)
        except (OSError, ValueError):
            pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
