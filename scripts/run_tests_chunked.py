#!/usr/bin/env python3
"""Process-isolated full-suite runner: one pytest process per test file.

The monolithic suite run can be voided by a single XLA:CPU compiler flake —
``backend_compile_and_load`` (LLVM JIT) SIGSEGVs intermittently on long
single-process runs (tests/conftest.py documents two reproductions ~85%
through, both passing in isolation). This runner makes the green artifact
robust to that infra flake without hiding real failures:

- each ``tests/test_*.py`` file runs in its OWN pytest process (fresh JAX
  runtime, fresh LLVM JIT), so one crash cannot void other files' results;
- a chunk that dies on a SIGNAL (negative returncode: SIGSEGV/SIGILL/...)
  is retried once — the flake is nondeterministic, a genuine crash-on-
  import reproduces. A second signal death FAILS the run;
- ordinary test failures (returncode 1) are never retried — they are real
  and fail the run immediately at the end;
- pass/skip counts are parsed from each chunk's summary line and summed,
  so the final line is the canonical full-suite count.

Usage: ``python scripts/run_tests_chunked.py [extra pytest args]``
Exit 0 = every collected test passed (skips allowed). This is the
canonical "full suite green" record (CLAUDE.md: never run the suite
against the TPU — the per-process conftest pins jax to CPU).
"""

from __future__ import annotations

import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TESTS = REPO / "tests"

# pytest summary line, e.g. "= 21 passed, 2 skipped, 1 warning in 12.3s ="
_COUNTS = re.compile(r"(\d+) (passed|failed|error|errors|skipped|xfailed|xpassed)")


def _parse_counts(output: str) -> dict:
    counts: dict = {}
    for line in reversed(output.splitlines()):
        if " in " in line and ("passed" in line or "failed" in line
                               or "error" in line or "skipped" in line):
            for n, kind in _COUNTS.findall(line):
                kind = "error" if kind == "errors" else kind
                counts[kind] = counts.get(kind, 0) + int(n)
            break
    return counts


def _run_chunk(path: Path, extra: list) -> tuple:
    """Run one file; returns (returncode, counts, tail)."""
    cmd = [sys.executable, "-m", "pytest", str(path), "-q", *extra]
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True,
    )
    out = proc.stdout + proc.stderr
    return proc.returncode, _parse_counts(out), out[-4000:]


def main() -> int:
    extra = sys.argv[1:]
    files = sorted(TESTS.glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    totals: dict = {}
    failures = []
    t0 = time.time()
    for path in files:
        name = path.name
        rc, counts, tail = _run_chunk(path, extra)
        retried = False
        if rc < 0:  # died on a signal: the documented XLA:CPU JIT flake
            print(f"  {name}: died on signal {-rc}; retrying once "
                  "(tests/conftest.py flake policy)")
            rc, counts, tail = _run_chunk(path, extra)
            retried = True
        # rc 5 = no tests collected (e.g. a fully-skipped module) — fine
        ok = rc in (0, 5)
        for k, v in counts.items():
            totals[k] = totals.get(k, 0) + v
        status = "ok" if ok else f"FAIL rc={rc}"
        line = ", ".join(f"{v} {k}" for k, v in sorted(counts.items()))
        print(f"{name:36s} {status:10s} {line}"
              + (" [passed on retry]" if retried and ok else ""))
        if not ok:
            failures.append((name, rc, tail))
    dt = time.time() - t0
    summary = ", ".join(f"{v} {k}" for k, v in sorted(totals.items()))
    print(f"\n== chunked full suite: {summary} in {dt:.0f}s "
          f"({len(files)} files, 1 process each) ==")
    if failures:
        for name, rc, tail in failures:
            print(f"\n--- {name} (rc={rc}) tail ---\n{tail}")
        return 1
    bad = totals.get("failed", 0) + totals.get("error", 0)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
