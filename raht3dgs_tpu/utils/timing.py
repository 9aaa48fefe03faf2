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


def _force_completion(out: Any) -> Any:
    """Wait for device results. On the remote-tunnel platform ("axon")
    ``block_until_ready`` returns before execution finishes (CLAUDE.md "TPU
    etiquette"), so there a one-element fetch of the first array leaf
    bounds completion instead (executions on one device stream retire in
    order)."""
    from raht3dgs_tpu.utils.backend import is_remote_tunnel_backend

    out = jax.block_until_ready(out)
    if is_remote_tunnel_backend():
        # One fetch per *device* (not just the first leaf): with sharded
        # outputs each device has its own stream, and only a fetch from a
        # shard resident on that device bounds its completion.
        seen = set()
        fallback_fetched = False
        ndev = jax.device_count()
        for leaf in jax.tree_util.tree_leaves(out):
            if not (hasattr(leaf, "size") and leaf.size):
                continue
            for sh in getattr(leaf, "addressable_shards", None) or []:
                if sh.device in seen or not sh.data.size:
                    continue
                sh.data.reshape(-1)[0].item()  # one-element fetch = barrier
                seen.add(sh.device)
            if not seen and not fallback_fetched:
                leaf.reshape(-1)[0].item()
                fallback_fetched = True
            if len(seen) >= ndev:
                break
    return out


class StageTimer:
    """Collects named stage durations (seconds)."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}

    def time(self, name: str, fn, *args, **kwargs) -> Any:
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = _force_completion(out)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0
        return out

    def add(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    def get(self, name: str, default: float = 0.0) -> float:
        return self.stages.get(name, default)
