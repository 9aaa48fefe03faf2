from raht3dgs_tpu.eval.metrics import (
    compute_attribute_metrics,
    gs_group_psnr,
    image_psnr,
)
from raht3dgs_tpu.eval.cameras import generate_random_cameras

__all__ = [
    "compute_attribute_metrics",
    "gs_group_psnr",
    "image_psnr",
    "generate_random_cameras",
]
