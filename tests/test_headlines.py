"""The committed README/COVERAGE headline numbers must equal what
``scripts/update_headlines.py`` generates from the latest BENCH_r*.json —
the benchmark artifact of record. Rounds 3 and 4 both caught hand-edited
headline drift; this pins the single-source contract (VERDICT r4 task 6).
"""

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import update_headlines  # noqa: E402


def test_headline_blocks_match_cited_bench_json():
    # Render from the round the committed text CITES (a newer
    # driver-deposited BENCH json between commits must not fail the
    # suite; hand-edits to the generated blocks still do).
    rnd = update_headlines.cited_round(REPO)
    for fname, new_text in update_headlines.render(REPO, rnd).items():
        committed = (REPO / fname).read_text()
        assert committed == new_text, (
            f"{fname} headline block is stale vs BENCH_r{rnd:02d}.json; "
            "run python scripts/update_headlines.py")


def test_markers_present():
    for fname, blocks in update_headlines.BLOCKS.items():
        text = (REPO / fname).read_text()
        for name in blocks:
            assert f"<!-- BENCH:BEGIN {name} -->" in text
            assert f"<!-- BENCH:END {name} -->" in text
