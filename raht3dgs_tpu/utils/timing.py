"""Per-stage wall-clock timing with device synchronization.

TPU analog of the reference's ``torch.cuda.synchronize()`` bracketing
(``/root/reference/python/encode_3dgs.py:147-161``): each stage is timed
with ``jax.block_until_ready`` on its outputs so launch overhead and device
execution are both captured. Stage names mirror the reference CSV schemas so
the reporting scripts consume our logs unchanged (SURVEY.md §5).
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax


class StageTimer:
    """Collects named stage durations (seconds)."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}

    def time(self, name: str, fn, *args, **kwargs) -> Any:
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0
        return out

    def add(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    def get(self, name: str, default: float = 0.0) -> float:
        return self.stages.get(name, default)
