#!/usr/bin/env python3
"""Full-grid 3DGS RD parity at the reference's operating point, through
the CLI.

Companion to ``scripts/rd_parity_j18.py`` for the 56-channel 3DGS path:
**J=10 with the full step grid {1,4,8,12,16,20,24,32,64}**
(`/root/reference/python/encode_3dgs.py:30-32`) on a ~500k-voxel frame.

- writes a voxelized-3DGS PLY (62-float binary records + voxel metadata
  comments, float32 — both readers see identical bytes) to disk;
- OUR legs: ``python -m raht3dgs_tpu.cli.encode_3dgs`` subprocesses —
  the byte-parity leg (``RAHT3DGS_RAHT_IMPL=golden``) and the span fast
  path — producing the 19-column CSV and ``.r3tc`` streams;
- REFERENCE leg: the imported torch pipeline
  (``read_compressed_3dgs_ply`` + ``RAHT_param_reorder_fast`` +
  ``RAHT2_optimized`` + ``inverse_RAHT_optimized``, fp64) with the
  bit-identical RLGR coder; all-channel PSNR per
  ``encode_3dgs.py:297-299``;
- compares per step: CSV bpp (6-decimal exact), all 56 channel streams
  byte-identical, PSNR_all <= 1e-5 dB.

    python scripts/rd_parity_3dgs_full.py [--out docs/rd_parity_3dgs_full.md]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time


def reference_leg(ply_path, depth, steps, reference):
    sys.path.insert(0, reference)
    import numpy as np
    import torch

    from RAHT import RAHT2_optimized
    from RAHT_param import RAHT_param_reorder_fast
    from data_util import read_compressed_3dgs_ply
    from iRAHT import inverse_RAHT_optimized

    from raht3dgs_tpu.codec.rlgr import rlgr_encode

    V_int, C, _voxel_size, _vmin = read_compressed_3dgs_ply(ply_path)
    N = V_int.shape[0]
    C = C.to(torch.float64)
    V = V_int.to(torch.float64)
    t0 = time.time()
    Lists, Flags, weights, order = RAHT_param_reorder_fast(
        V, torch.zeros(3, dtype=torch.float64), 2**depth, depth
    )
    Coeff, _w = RAHT2_optimized(C, Lists, Flags, weights)
    inv_order = torch.argsort(order)
    print(f"reference transform done in {time.time() - t0:.1f}s "
          f"(N={N}, D={C.shape[1]})")

    rows = []
    for step in steps:
        q = torch.floor(Coeff / step + 0.5)
        reordered = q.index_select(0, order).to(torch.int64).numpy()
        chans = [rlgr_encode(reordered[:, d])[0]
                 for d in range(C.shape[1])]
        bpp = sum(len(c) for c in chans) * 8.0 / N
        # reference all-channel PSNR (encode_3dgs.py:297-299)
        C_rec = inverse_RAHT_optimized(q * step, Lists, Flags, weights)
        mse = float(torch.mean((C - C_rec) ** 2))
        psnr = -10.0 * np.log10(mse + 1e-10)
        rows.append((bpp, psnr, chans))
        print(f"  ref step {step:g}: {bpp:.6f} bpp, {psnr:.4f} dB")
    return rows, N


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--steps", type=float, nargs="+",
                    default=[1, 4, 8, 12, 16, 20, 24, 32, 64])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reference", default="/root/reference/python")
    ap.add_argument("--csv", default="results/runtime_3dgs_full.csv")
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep", default=None)
    args = ap.parse_args(argv)

    if not os.path.isdir(args.reference):
        print(f"reference tree not found at {args.reference}; skipping")
        return 0

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from raht3dgs_tpu.codec.bitstream import FrameStream
    from raht3dgs_tpu.eval.synth import synthetic_gs_frame
    from raht3dgs_tpu.io.ply import save_ply_3dgs

    workdir = args.keep or tempfile.mkdtemp(prefix="rd_parity_3dgs_")
    os.makedirs(workdir, exist_ok=True)
    ply_path = os.path.join(workdir, f"gs_j{args.depth}.ply")
    V, attrs = synthetic_gs_frame(args.n, args.depth, args.seed)
    attrs = attrs.astype(np.float32)  # the on-disk record is float32
    save_ply_3dgs(
        ply_path,
        means=V.astype(np.float64),
        quats=attrs[:, 0:4],
        scales=attrs[:, 4:7],
        opacities=attrs[:, 7],
        colors=attrs[:, 8:],
        voxel_size=1.0 / (1 << args.depth),
        vmin=np.zeros(3),
    )
    print(f"wrote {ply_path}: {len(V)} voxels, 56 channels")

    csv_path = os.path.join(repo, args.csv)
    span_csv = csv_path.replace(".csv", "_span.csv")
    legs = {}
    for leg, impl, csvp in (("golden", "golden", csv_path),
                            ("span", "span", span_csv)):
        stream_dir = os.path.join(workdir, f"streams_{leg}")
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   RAHT3DGS_RAHT_IMPL=impl)
        t0 = time.time()
        subprocess.run(
            [sys.executable, "-m", "raht3dgs_tpu.cli.encode_3dgs",
             "--input", ply_path, "--platform", "cpu",
             "--depth", str(args.depth),
             "--steps", *[f"{s:g}" for s in args.steps],
             "--csv", csvp, "--save-streams", stream_dir],
            cwd=repo, env=env, check=True,
        )
        print(f"CLI {leg} leg done in {time.time() - t0:.1f}s -> {csvp}")
        legs[leg] = stream_dir

    def read_csv(path):
        rows = []
        with open(path) as f:
            header = f.readline().strip().split(",")
            bpp_i = header.index("Rate_bpp")
            step_i = header.index("Quantization_Step")
            psnr_i = header.index("PSNR_all")
            for line in f:
                cells = line.strip().split(",")
                rows.append((float(cells[step_i]), float(cells[bpp_i]),
                             float(cells[psnr_i])))
        return rows

    ours = read_csv(csv_path)
    span_rows = read_csv(span_csv)
    assert [s for s, _, _ in ours] == [float(s) for s in args.steps]

    ref_rows, n = reference_leg(ply_path, args.depth, args.steps,
                                args.reference)

    rows = []
    worst_bpp = worst_psnr = 0.0
    span_worst_bpp = span_worst_psnr = 0.0
    streams_identical = True
    for (step, o_bpp, o_psnr), (_, s_bpp, s_psnr), (r_bpp, r_psnr,
                                                    r_chans) in zip(
        ours, span_rows, ref_rows
    ):
        fs = FrameStream.from_bytes(
            open(os.path.join(legs["golden"],
                              f"gs_step{step:g}.r3tc"), "rb").read()
        )
        same = len(fs.channels) == len(r_chans) and all(
            a == b for a, b in zip(fs.channels, r_chans)
        )
        streams_identical &= same
        d_bpp = abs(o_bpp - float(f"{r_bpp:.6f}"))
        d_psnr = abs(o_psnr - r_psnr)
        worst_bpp = max(worst_bpp, d_bpp)
        worst_psnr = max(worst_psnr, d_psnr)
        sd_bpp = abs(s_bpp - float(f"{r_bpp:.6f}"))
        sd_psnr = abs(s_psnr - r_psnr)
        span_worst_bpp = max(span_worst_bpp, sd_bpp)
        span_worst_psnr = max(span_worst_psnr, sd_psnr)
        rows.append(
            f"| {step:g} | {r_bpp:.6f} | {o_bpp:.6f} | {d_bpp:.2e} "
            f"| {r_psnr:.4f} | {o_psnr:.4f} | {d_psnr:.2e} "
            f"| {'yes' if same else 'NO'} | {sd_bpp:.2e} | {sd_psnr:.2e} |"
        )

    report = "\n".join([
        "# 3DGS RD parity at the reference's full operating point",
        "",
        f"Config: **J={args.depth}, steps "
        f"{{{', '.join(f'{s:g}' for s in args.steps)}}}, N={n} voxels, "
        "56 channels** — the reference's 3DGS configuration "
        "(`/root/reference/python/encode_3dgs.py:30-32`). Content: "
        "fractal-correlated synthetic 3DGS frame (eval/synth.py) written "
        "as a float32 compressed-3DGS PLY; both sides read the same "
        "bytes.",
        "",
        "Our legs ran through `python -m raht3dgs_tpu.cli.encode_3dgs` "
        f"subprocesses (CSV `{args.csv}`; streams on disk): parity leg "
        "(`RAHT3DGS_RAHT_IMPL=golden`) and span fast path. Reference leg "
        "= imported torch pipeline + bit-identical RLGR; all-channel "
        "PSNR per `encode_3dgs.py:297-299`. 'streams ==' byte-compares "
        "all 56 channel payloads per step.",
        "",
        "| step | ref bpp | ours bpp | Δbpp | ref PSNR | ours PSNR "
        "| ΔPSNR | streams == | span Δbpp | span ΔPSNR |",
        "|---|---|---|---|---|---|---|---|---|---|",
        *rows,
        "",
        f"**Parity leg: max |Δbpp| = {worst_bpp:.3e}, max |ΔPSNR| = "
        f"{worst_psnr:.3e} dB, all streams byte-identical: "
        f"{streams_identical}.** Span leg: max |Δbpp| = "
        f"{span_worst_bpp:.3e}, max |ΔPSNR| = {span_worst_psnr:.3e} dB.",
    ])
    print(report)
    ok = worst_bpp == 0.0 and worst_psnr < 1e-5 and streams_identical
    print("\nPARITY:", "OK" if ok else "FAILED")
    if args.out:
        with open(os.path.join(repo, args.out), "w") as f:
            f.write(report + "\n")
    if args.keep is None:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
