#!/usr/bin/env python3
"""Grouped bar chart of per-stage runtime vs quantization step.

Counterpart of the reference's ``scripts/plot_runtime.py`` over the same
CSV column names; reads any of the framework's RAHT runtime CSVs.

    python scripts/plot_runtime.py results/runtime_ply.csv -o runtime.png
"""

from __future__ import annotations

import argparse

STAGE_LABELS = {
    "RAHT_prelude_time": "RAHT Prelude",
    "RAHT_transform_time": "RAHT Transform",
    "Quant_time": "Quantization",
    "Entropy_enc_time": "Entropy Encoding",
    "Entropy_dec_time": "Entropy Decoding",
    "Dequant_time": "Dequantization",
    "iRAHT_time": "Inverse RAHT",
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csv", help="runtime CSV from encode_ply/encode_3dgs")
    ap.add_argument("-o", "--out", default="runtime.png")
    ap.add_argument(
        "--stages", nargs="+", default=list(STAGE_LABELS),
        help="columns to plot",
    )
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    import pandas as pd

    df = pd.read_csv(args.csv)
    stages = [s for s in args.stages if s in df.columns]
    mean = df.groupby("Quantization_Step")[stages].mean() * 1000.0

    x = np.arange(len(mean.index))
    width = 0.8 / max(len(stages), 1)
    fig, ax = plt.subplots(figsize=(10, 5))
    for i, s in enumerate(stages):
        ax.bar(x + i * width, mean[s], width, label=STAGE_LABELS.get(s, s))
    ax.set_xticks(x + width * (len(stages) - 1) / 2)
    ax.set_xticklabels([f"{q:g}" for q in mean.index])
    ax.set_xlabel("Quantization step")
    ax.set_ylabel("Time (ms)")
    ax.set_title("Per-stage runtime vs quantization step")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
