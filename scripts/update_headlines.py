"""Single source of truth for the measured headline numbers.

Rounds 3 and 4 both caught hand-maintained README/COVERAGE numbers drifting
from the benchmark artifact of record (``BENCH_r{N}.json``, written by the
driver at the end of every round). This script deletes the failure mode: the
headline text is *generated* from the latest BENCH json into marked blocks,

    <!-- BENCH:BEGIN <name> -->
    ... generated, do not hand-edit ...
    <!-- BENCH:END <name> -->

and ``tests/test_headlines.py`` regenerates the blocks in-memory and fails
the suite whenever the committed text disagrees with the json.

Usage:
    python scripts/update_headlines.py          # rewrite README/COVERAGE
    python scripts/update_headlines.py --check  # exit 1 if text is stale
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def latest_bench(repo: Path = REPO, rnd: int = None):
    """Return (round_number, parsed json) for the newest BENCH_r*.json,
    or for the specific round ``rnd`` when given."""
    best = None
    for p in repo.glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if not m:
            continue
        n = int(m.group(1))
        if rnd is not None and n != rnd:
            continue
        if best is None or n > best[0]:
            best = (n, p)
    if best is None:
        raise FileNotFoundError(
            "no BENCH_r*.json at repo root" if rnd is None
            else f"no BENCH_r{rnd:02d}.json at repo root")
    with open(best[1]) as f:
        raw = json.load(f)
    # Driver artifacts wrap the bench line under "parsed"; bare bench.py
    # output is the record itself.
    rec = raw.get("parsed", raw)
    return best[0], rec


def cited_round(repo: Path = REPO) -> int:
    """The round number the committed README headline block cites
    (``BENCH_rNN.json`` inside the generated block)."""
    text = (repo / "README.md").read_text()
    m = re.search(r"BENCH:BEGIN headline.*?`BENCH_r(\d+)\.json`", text,
                  re.S)
    if not m:
        raise ValueError("README headline block cites no BENCH_r*.json")
    return int(m.group(1))


def _fmt_e2e(leg: dict) -> str:
    return (f"**{leg['value']:.2f} Mpts/s ({leg['vs_baseline']:.2f}×)**")


def readme_block(rnd: int, rec: dict) -> str:
    e2e = rec["e2e_codec"]
    j18 = rec.get("e2e_codec_j18")
    d10 = e2e.get("decomposition", {})
    d18 = (j18 or {}).get("decomposition", {})
    lines = [
        f"- RAHT roundtrip (fwd+inv, 500k pts, J=10): "
        f"**{rec['value']:.1f} Mpts/s — {rec['vs_baseline']:.1f}×** the"
        f" reference pipeline measured on CPU (`BENCH_r{rnd:02d}.json` vs the"
        f" {rec['baseline_mpts']} Mpts/s one-core reference denominator,"
        f" reproducible via `scripts/measure_reference_cpu.py` on an idle"
        f" host; BASELINE.md); platform-tagged under the driver protocol.",
        f"- End-to-end codec (full per-frame transform + quant + native RLGR"
        f" encode + decode + dequant + inverse, pipelined"
        f" {e2e['burst']}-frame burst): {_fmt_e2e(e2e)} at J=10"
        + (f" / {_fmt_e2e(j18)} at J=18" if j18 else "")
        + " through the remote tunnel; the per-resource decomposition"
        " (recorded in the bench JSON itself) proves the binding resource"
        " is the tunnel wire and measures the local-host bound at "
        + (f"**{d10.get('local_host_bound_mpts', 0):.1f} Mpts/s"
           f" ({d10.get('local_host_bound_vs_baseline', 0):.1f}×) J=10"
           if d10 else "")
        + (f" / {d18.get('local_host_bound_mpts', 0):.1f} Mpts/s"
           f" ({d18.get('local_host_bound_vs_baseline', 0):.1f}×) J=18**"
           if d18 else "**")
        + " — every term driver-captured on the same programs"
        " (`docs/performance.md`).",
    ]
    if "sweep_codec" in rec:
        sw = rec["sweep_codec"]
        def _vs(key):
            return f" ({sw[key]:.1f}×)" if key in sw else ""
        lines.append(
            f"- Amortized RD sweep ({sw['n_steps']}-step grid, hoisted"
            f" reorder, the reference drivers' actual workload):"
            f" **{sw['value']:.1f} Mpts/s{_vs('vs_baseline')}**"
            f" of (frame, step) points at J=10"
            + (f" / **{sw['value_j18']:.1f} Mpts/s"
               f"{_vs('vs_baseline_j18')}** at J=18"
               if "value_j18" in sw else "")
            + (f" against the {sw['baseline_mpts']}"
               f"{'/' + str(sw['baseline_j18_mpts']) if 'baseline_j18_mpts' in sw else ''}"
               " Mpts/s same-machine sweep denominators"
               " (`scripts/measure_reference_cpu.py`)."
               if "baseline_mpts" in sw else "."))
    return "\n".join(lines)


def coverage_block(rnd: int, rec: dict) -> str:
    return (
        f"**Measured headline** (`BENCH_r{rnd:02d}.json`, generated — do"
        f" not hand-edit): transform roundtrip **{rec['value']:.1f} Mpts/s"
        f" ({rec['vs_baseline']:.1f}× the {rec['baseline_mpts']} Mpts/s"
        f" one-core CPU reference — reproducible denominator via"
        f" `scripts/measure_reference_cpu.py`, BASELINE.md)** on one v5e"
        f" core; E2E codec {_fmt_e2e(rec['e2e_codec'])} at J=10"
        + (f" / {_fmt_e2e(rec['e2e_codec_j18'])} at J=18"
           if "e2e_codec_j18" in rec else "")
        + " through the device tunnel (per-resource decomposition recorded"
        " in the json)."
    )


BLOCKS = {
    "README.md": {"headline": readme_block},
    "COVERAGE.md": {"headline": coverage_block},
}


def apply(text: str, name: str, body: str, path: str) -> str:
    begin = f"<!-- BENCH:BEGIN {name} -->"
    end = f"<!-- BENCH:END {name} -->"
    pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.S)
    if not pat.search(text):
        raise ValueError(f"{path}: missing marker pair for block {name!r}")
    return pat.sub(begin + "\n" + body + "\n" + end, text)


def render(repo: Path = REPO, rnd: int = None) -> dict:
    """Return {path: new_text} for every managed file. ``rnd`` pins the
    source json (the drift test renders from the round the committed
    text CITES, so a newer driver-deposited BENCH json does not fail the
    suite — running this script without ``rnd`` adopts the latest)."""
    rnd, rec = latest_bench(repo, rnd)
    out = {}
    for fname, blocks in BLOCKS.items():
        p = repo / fname
        text = p.read_text()
        for name, fn in blocks.items():
            text = apply(text, name, fn(rnd, rec), fname)
        out[fname] = text
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if committed text is stale (no writes)")
    args = ap.parse_args()
    stale = []
    for fname, new in render().items():
        p = REPO / fname
        if p.read_text() != new:
            stale.append(fname)
            if not args.check:
                p.write_text(new)
    if args.check and stale:
        print(f"stale headline blocks: {', '.join(stale)} "
              "(run scripts/update_headlines.py)", file=sys.stderr)
        return 1
    if stale and not args.check:
        print(f"updated: {', '.join(stale)}")
    else:
        print("headlines up to date")
    return 0


if __name__ == "__main__":
    sys.exit(main())
