#!/usr/bin/env python
"""Chunked, process-isolated test runner — the canonical full-suite command.

Why this exists: the XLA:CPU LLVM JIT in this image very rarely SIGSEGVs
inside ``backend_compile_and_load`` on long single-process runs (see
tests/conftest.py — two round-3 full runs died ~85% through at the same
test and every file passed in isolation). One compiler flake must not
void a 440+-test run, so the suite is executed as N subprocess pytest
invocations, one chunk of files each.

Flake policy: a chunk that dies on a *signal* (negative returncode:
SIGSEGV/SIGILL/SIGBUS — the infra flake signature) is retried once,
splitting it into single files so a genuine per-test crash cannot hide
behind the retry; a second signal death on the same file, or any normal
test failure (rc 1), fails the run. rc 5 (no tests collected) is
tolerated per chunk (files that are all-skip under some configs).

Usage:
    python scripts/run_tests.py            # full suite, chunked
    python scripts/run_tests.py -k morton  # forwarded to pytest
    python scripts/run_tests.py --chunk 1  # one process per file

Exit 0 iff every test passed; prints the aggregate count.
"""

from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")

_SUMMARY = re.compile(
    r"(\d+) (passed|failed|skipped|error|errors|xfailed|xpassed|warnings?)"
)


def _collect_files() -> list[str]:
    files = sorted(
        f for f in os.listdir(TESTS)
        if f.startswith("test_") and f.endswith(".py")
    )
    return [os.path.join("tests", f) for f in files]


def _run_chunk(files: list[str], extra: list[str]) -> tuple[int, dict]:
    """Run one pytest subprocess; return (returncode, counts)."""
    cmd = [sys.executable, "-m", "pytest", "-q", "--no-header",
           "-p", "no:cacheprovider", *extra, *files]
    proc = subprocess.run(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    counts: dict[str, int] = {}
    # Last summary-looking line wins (pytest prints it at the end).
    for line in proc.stdout.splitlines():
        found = _SUMMARY.findall(line)
        if found and ("passed" in line or "failed" in line
                      or "error" in line or "skipped" in line):
            cand = {k: int(v) for v, k in found}
            if any(k in cand for k in
                   ("passed", "failed", "skipped", "error", "errors")):
                counts = cand
    if proc.returncode not in (0, 5) and not counts:
        # Crash before the summary — keep the tail for the report.
        counts["_tail"] = proc.stdout[-2000:]
    return proc.returncode, counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4,
                    help="test files per subprocess (default 4)")
    args, extra = ap.parse_known_args()

    files = _collect_files()
    chunks = [files[i:i + args.chunk]
              for i in range(0, len(files), args.chunk)]

    total = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    t0 = time.time()
    failed_files: list[str] = []
    retried: list[str] = []

    def account(counts: dict) -> None:
        total["passed"] += counts.get("passed", 0)
        total["failed"] += counts.get("failed", 0)
        total["skipped"] += counts.get("skipped", 0)
        total["errors"] += counts.get("error", 0) + counts.get("errors", 0)

    for ci, chunk in enumerate(chunks):
        rc, counts = _run_chunk(chunk, extra)
        if rc < 0:  # killed by a signal: the documented XLA:CPU JIT flake
            signame = signal.Signals(-rc).name if -rc in signal.Signals.__members__.values() else str(-rc)
            print(f"[chunk {ci + 1}/{len(chunks)}] died on {signame}; "
                  f"retrying files one at a time", flush=True)
            for f in chunk:
                rc2, c2 = _run_chunk([f], extra)
                if rc2 < 0:
                    print(f"  {f}: died AGAIN (signal {-rc2}) — failing")
                    failed_files.append(f)
                elif rc2 not in (0, 5):
                    print(f"  {f}: rc {rc2}")
                    failed_files.append(f)
                    account(c2)
                else:
                    retried.append(f)
                    account(c2)
            continue
        if rc not in (0, 5):
            failed_files.extend(chunk)
            if "_tail" in counts:
                print(counts.pop("_tail"))
        account(counts)
        done = total["passed"] + total["failed"] + total["skipped"]
        print(f"[chunk {ci + 1}/{len(chunks)}] rc={rc} "
              f"{counts or '(no tests)'} — cumulative {done}", flush=True)

    dt = time.time() - t0
    print()
    print(f"TOTAL: {total['passed']} passed, {total['skipped']} skipped, "
          f"{total['failed']} failed, {total['errors']} errors "
          f"in {dt:.0f}s ({len(chunks)} isolated processes)")
    if retried:
        print(f"flake policy: {len(retried)} file(s) re-run solo after a "
              f"signal death, all green: {', '.join(retried)}")
    if failed_files or total["failed"] or total["errors"]:
        print("FAILED:", ", ".join(failed_files) or "(see counts)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
