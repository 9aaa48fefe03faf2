"""Shared CLI plumbing: platform/dtype selection and CSV logging.

The reference drivers are scripts configured by editing module-level
constants (``/root/reference/python/encode_ply.py:26-32``); here every
driver takes argparse flags with those values as defaults (SURVEY.md §5
"config/flag system" gap).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def add_runtime_args(p: argparse.ArgumentParser) -> None:
    from raht3dgs_tpu.config import RuntimeConfig

    rc = RuntimeConfig()
    p.add_argument(
        "--platform",
        default=rc.platform,
        help="JAX platform override (e.g. cpu, tpu); default: environment",
    )
    p.add_argument(
        "--dtype",
        choices=("float32", "float64"),
        default=rc.dtype,
        help="transform precision (float64 matches the reference; float32 "
        "is the fast path on TPU)",
    )
    p.add_argument(
        "--bucket",
        type=int,
        default=rc.bucket,
        help="shape-bucket granularity for jit caching",
    )
    p.add_argument("--csv", default=None, help="CSV log path (default: results/...)")
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the run into DIR "
        "(view with TensorBoard / xprof)",
    )


def add_geometry_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--code-geometry", action="store_true",
        help="attach a lossless geometry section (octree occupancy + "
        "adaptive binary range coder) to every SAVED stream, making the "
        "bitstream self-contained: cli.decode then needs no --positions. "
        "Geometry rate is reported separately from the attribute bpp "
        "(the CSV schema and the reference's rate metric are unchanged)",
    )


def add_quant_args(p: argparse.ArgumentParser) -> None:
    """Quantizer selection flags (shared by the encode drivers)."""
    p.add_argument(
        "--quant-mode", choices=("mid", "deadzone"), default="mid",
        help="scalar quantizer: 'mid' = the reference's round-half-up "
        "(bitwise parity default); 'deadzone' = sign-symmetric dead-zone "
        "with biased reconstruction (opt-in RD improver, recorded in the "
        "stream; see docs/rd_deadzone.md)",
    )
    p.add_argument(
        "--quant-f", type=float, default=0.3,
        help="dead-zone encoder rounding offset in (0, 0.5] "
        "(0.5 = mid-tread bins; smaller widens the zero bin)",
    )
    p.add_argument(
        "--rec-delta", type=float, default=0.12,
        help="dead-zone reconstruction offset (0 = bin lower edge; "
        "0.5 - f = bin midpoint; slightly less approximates the "
        "Laplacian centroid)",
    )
    p.add_argument(
        "--entropy", choices=("rlgr", "rac", "auto"), default="rlgr",
        help="attribute entropy coder: 'rlgr' = the reference coder "
        "(byte-parity default); 'rac' = adaptive binary range coding "
        "(-7..-13%% rate at IDENTICAL reconstructions, docs/"
        "rd_attr_entropy.md); 'auto' = per-channel min of both (never "
        "worse than rlgr). Recorded per channel in the stream — decode "
        "auto-detects",
    )
    p.add_argument(
        "--predict", action="store_true",
        help="inter-depth predicted RAHT (ops/praht.py): code each depth "
        "group's coefficients as residuals against an upsampled "
        "prediction from the coarser depth's reconstruction, with a "
        "per-depth on/off decision signalled in the stream (opt-in RD "
        "improver; decode auto-detects; see docs/rd_predict.md)",
    )


def quant_kwargs(args) -> dict:
    """AttributeCodec/BatchAttributeCodec kwargs from add_quant_args flags."""
    return {
        "quant_mode": args.quant_mode,
        "quant_f": args.quant_f,
        "rec_delta": args.rec_delta,
        "entropy": getattr(args, "entropy", "rlgr"),
        "predict": getattr(args, "predict", False),
    }


def configure_runtime(args) -> None:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.environ.get("RAHT3DGS_COMPILE_CACHE", "/root/.jax_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def jnp_dtype(name: str):
    import jax.numpy as jnp

    return {"float32": jnp.float32, "float64": jnp.float64}[name]


def maybe_profile(args):
    """Context manager: jax.profiler.trace(args.profile) or a no-op."""
    import contextlib

    if getattr(args, "profile", None):
        import jax

        return jax.profiler.trace(args.profile)
    return contextlib.nullcontext()


class CsvLogger:
    def __init__(self, path, header: str):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "w")
        self._f.write(header + "\n")
        self._f.flush()

    def row(self, line: str) -> None:
        self._f.write(line + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
