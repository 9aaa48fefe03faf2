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
# Same-machine reference denominators (BASELINE.md). The current driver
# host has ONE CPU core; both legs re-measured on it 2026-08-19 (torch
# fp64; RLGR via the byte-identical native coder, which is FASTER than
# the reference's pybind path — a conservative denominator):
REFERENCE_CPU_MPTS = 0.660        # prelude+RAHT+iRAHT roundtrip
REFERENCE_CPU_E2E_MPTS = 0.642    # + quant, reorder, RLGR enc+dec, dequant
E2E_STEP = 16.0                   # mid-grid reference operating point
WARMUP = 2
ITERS = 3
BURST = 8


PROBE_ATTEMPTS = 8


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

    # ---- second metric: the full E2E codec leg — transform + quantize +
    # reorder + device->host symbol fetch + RLGR encode + RLGR decode +
    # quantized upload + dequant + inverse RAHT. Pipelined burst with a
    # LAST-ONLY fetch of the final reconstruction (executions on one
    # device stream run in order, so a scalar from the last frame's
    # output bounds completion of the whole burst): per-frame throughput
    # is then bounded by the slower of device compute and the symbol
    # transfers, not by serial tunnel round-trips. The reconstruction
    # stays on device — the serving path (models/serving.py) consumes it
    # there.
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        VoxelFrame,
        _dequant_gather_device,
        _inverse_device,
        _inverse_order_device,
        pack_quantized_upload,
        upload_quantized,
    )
    from raht3dgs_tpu.codec.rlgr import rlgr_decode_channels

    frame = VoxelFrame(
        codes=codes_j, attributes=attrs_j, weights=weights_j,
        n_voxels=n_real, depth=DEPTH, vmin=np.zeros(3), width=float(1 << DEPTH),
    )
    codec = AttributeCodec(DEPTH, dtype=jnp.float32, impl=impl)
    E2E_BURST = 4
    steps_j = jnp.asarray(E2E_STEP, dtype=jnp.float32)

    def e2e_burst():
        # encode side: codec.encode_sweep pipelines the transform+quant
        # programs and their async symbol fetches (byte-identical streams)
        encs = codec.encode_sweep(frame, [E2E_STEP] * E2E_BURST)
        # decode side: per frame, host entropy decode + quantized upload +
        # device dequant/inverse dispatch (async); nothing blocks until
        # the final scalar fetch
        rec = None
        for enc in encs:
            s = enc.stream
            vals_T = np.zeros((s.n_channels, PAD_TO), dtype=np.int32)
            rlgr_decode_channels(s.channels, s.n_voxels, out=vals_T,
                                 chunk=s.chunk)
            inv = _inverse_order_device(
                codes_j, weights_j, jnp.int32(s.n_voxels), DEPTH,
                s.order_mode,
            )
            coeffs = _dequant_gather_device(
                upload_quantized(pack_quantized_upload(vals_T)), inv,
                steps_j, jnp.float32, s.quant_mode,
            )
            rec = _inverse_device(coeffs, codes_j, weights_j, DEPTH)
        float(rec[0, 0])  # last-only fetch: bounds the whole burst
        return encs[-1], rec

    enc, rec2 = e2e_burst()  # warmup (compiles the decode-side programs)

    def measure_e2e():
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            enc, rec2 = e2e_burst()
            times.append((time.perf_counter() - t0) / E2E_BURST)
        return min(times), enc, rec2

    E2E_DEGRADED = 0.0 if os.environ.get(
        "RAHT3DGS_BENCH_PLATFORM") == "cpu" else 0.5
    best_e2e, enc, rec2 = measure_e2e()
    for _ in range(2):
        if n_real / best_e2e / 1e6 >= E2E_DEGRADED:
            break
        print("bench: degraded e2e measurement; retrying", file=sys.stderr)
        time.sleep(20)
        b2, enc, rec2 = measure_e2e()
        best_e2e = min(best_e2e, b2)
    err2 = np.abs(np.asarray(rec2)[:n_real] - attrs[:n_real]).max()
    # sanity (not the parity bound): quantization noise through the
    # inverse stays O(step); corruption would be orders larger
    assert err2 <= 2 * E2E_STEP, f"e2e reconstruction error {err2}"
    assert enc.stream.bpp() > 0
    e2e_mpts = n_real / best_e2e / 1e6

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
        "e2e_codec": {
            "value": round(e2e_mpts, 4),
            "unit": "Mpts/s",
            "vs_baseline": round(e2e_mpts / REFERENCE_CPU_E2E_MPTS, 2),
            "baseline_mpts": REFERENCE_CPU_E2E_MPTS,
            "step": E2E_STEP,
            "bpp": round(enc.stream.bpp(), 4),
        },
    }
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
