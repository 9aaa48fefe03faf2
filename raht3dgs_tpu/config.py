"""Typed configuration for the codec pipelines.

The reference has no config system — every driver is tuned by editing
module-level constants (``/root/reference/python/encode_ply.py:26-32``;
SURVEY.md §5). Here the same knobs are dataclasses shared by the library
API and the CLI drivers, with the reference values as defaults.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple


@dataclass
class RuntimeConfig:
    """Execution environment knobs."""

    platform: Optional[str] = None          # None = environment default
    dtype: str = "float64"                  # "float64" parity / "float32" fast
    bucket: int = 1 << 13                   # shape-bucket granularity
    compile_cache_dir: Optional[str] = "/root/.jax_cache"


@dataclass
class ColorCodecConfig:
    """encode_ply / encode_dataset workload (reference encode_ply.py:26-32)."""

    depth: int = 18
    steps: Tuple[float, ...] = (1, 2, 4, 6, 8, 12, 16, 20, 24, 32, 64)
    decode: bool = True                     # full decode vs coeff-domain PSNR
    order_mode: str = "ragft"               # "ragft" | "weight_desc" | "morton"


@dataclass
class GsCodecConfig:
    """encode_3dgs workload (reference encode_3dgs.py:30-32)."""

    depth: int = 10
    steps: Tuple[float, ...] = (1, 4, 8, 12, 16, 20, 24, 32, 64)
    per_attribute: bool = False
    level_budget: int = 1024
    group_step_scales: Optional[Dict[str, float]] = None


@dataclass
class VoxelizeConfig:
    """3DGS N->Nvox preprocessing (reference test_voxelize_3dgs.py)."""

    depth: int = 10
    weight_by_opacity: bool = True
    output_dir: Optional[str] = "output_compressed"


@dataclass
class RenderEvalConfig:
    """Rendering comparison (reference quality_eval.try_render_comparison)."""

    backend: str = "auto"                   # auto | gsplat | preview | none
    n_views: int = 5
    image_size: int = 512
    seed: int = 0
    output_dir: Optional[str] = None
