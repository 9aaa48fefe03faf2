#!/usr/bin/env python3
"""Summarize pipeline runtime CSVs into a markdown report.

Counterpart of the reference's ``scripts/summarize_pipeline_runtime.py``
(same CLI: --voxel-log / --raht-log / --out) consuming the CSV schemas this
framework's drivers emit (identical column names to the reference drivers):
the voxelize CSV from ``cli.voxelize_3dgs`` and the 19-column RAHT CSV from
``cli.encode_3dgs`` (or the 11-column color CSV from ``cli.encode_ply``).
"""

from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict


def read_rows(path):
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise ValueError(f"empty CSV: {path}")
    return rows


def aggregate_by_step(rows, fields):
    """Mean of the given time fields (converted to ms) per quant step."""
    acc = defaultdict(lambda: defaultdict(float))
    cnt = defaultdict(int)
    for row in rows:
        q = float(row["Quantization_Step"])
        cnt[q] += 1
        for f in fields:
            if f in row:
                acc[q][f] += float(row[f]) * 1000.0
    out = {}
    for q in sorted(acc):
        out[q] = {f: acc[q][f] / cnt[q] for f in acc[q]}
        out[q]["Total_ms"] = sum(out[q].values())
    return out


def markdown_table(agg, fields):
    lines = ["| Quant step | " + " | ".join(fields + ["Total_ms"]) + " |"]
    lines.append("|" + "---|" * (len(fields) + 2))
    for q, vals in agg.items():
        cells = [f"{vals.get(f, 0.0):.2f}" for f in fields] + [
            f"{vals['Total_ms']:.2f}"
        ]
        lines.append(f"| {q:g} | " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--voxel-log", default=None,
                    help="voxelize_3dgs runtime CSV (optional)")
    ap.add_argument("--raht-log", required=True,
                    help="encode_3dgs / encode_ply runtime CSV")
    ap.add_argument("--out", default=None, help="markdown output path")
    args = ap.parse_args(argv)

    raht_rows = read_rows(args.raht_log)
    has_totals = "Total_enc_time" in raht_rows[0]
    if has_totals:
        fields = ["RAHT_prelude_time", "Total_enc_time", "Total_dec_time"]
    else:
        fields = [
            "RAHT_prelude_time", "RAHT_transform_time", "Quant_time",
            "Entropy_enc_time", "Entropy_dec_time", "Dequant_time",
            "iRAHT_time",
        ]
    agg = aggregate_by_step(raht_rows, fields)

    report = ["# Pipeline runtime summary (ms)", ""]
    if args.voxel_log:
        vox = read_rows(args.voxel_log)[-1]
        report += [
            "## Voxelization + merge",
            "",
            f"- Checkpoint: {vox.get('Checkpoint', '?')} (J={vox.get('J', '?')})",
            f"- Gaussians: {vox.get('N_original', '?')} -> {vox.get('N_vox', '?')} "
            f"({vox.get('Compression_ratio', '?')}x)",
            f"- Total: {float(vox.get('Total_time_ms', 0)):.2f} ms",
            "",
        ]
    report += ["## RAHT pipeline (mean per quantization step)", "",
               markdown_table(agg, fields), ""]
    text = "\n".join(report)
    print(text)
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
