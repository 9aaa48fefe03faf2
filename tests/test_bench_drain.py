"""bench.py's shared 3-thread drain: ordering + exception safety.

The drain runs unattended through the driver on a shared TPU tunnel —
a stage failure must re-raise in the caller (bounded time), never park
a worker thread in a blocked queue.get()/put() and wedge the run.
"""

import sys
import time
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import pipelined_drain  # noqa: E402


def _run(n, window=2, fail_at=None, fail_stage=None, log=None):
    log = log if log is not None else []

    def start(i):
        if fail_stage == "start" and i == fail_at:
            raise RuntimeError("start boom")
        log.append(("start", i))
        return i

    def finish(p):
        if fail_stage == "finish" and p == fail_at:
            raise RuntimeError("finish boom")
        log.append(("finish", p))
        return p * 10

    def entropy(i, q):
        if fail_stage == "entropy" and i == fail_at:
            raise RuntimeError("entropy boom")
        assert q == i * 10
        log.append(("entropy", i))
        return q + 1

    def upload(i, v):
        if fail_stage == "upload" and i == fail_at:
            raise RuntimeError("upload boom")
        assert v == i * 10 + 1
        log.append(("upload", i))

    pipelined_drain(n, start, finish, entropy, upload, window)
    return log


def test_drain_processes_all_in_order():
    log = _run(6)
    for stage in ("start", "finish", "entropy", "upload"):
        seq = [i for s, i in log if s == stage]
        assert seq == list(range(6)), (stage, seq)
    # the start-ahead window really runs ahead: frame 1's fetch starts
    # before frame 0 finishes
    assert log.index(("start", 1)) < log.index(("finish", 0))


@pytest.mark.parametrize("stage", ["start", "finish", "entropy", "upload"])
def test_drain_raises_instead_of_hanging(stage):
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="boom"):
        _run(8, fail_at=3, fail_stage=stage)
    # bounded: the sentinel/drain logic must unblock every thread fast
    assert time.perf_counter() - t0 < 5.0


def test_drain_single_item_and_wide_window():
    assert len(_run(1, window=4)) == 4
    assert len(_run(3, window=8)) == 12
