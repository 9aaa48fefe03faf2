from raht3dgs_tpu.ops.morton import morton_encode, morton_decode
from raht3dgs_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
from raht3dgs_tpu.ops.voxelize import voxelize

__all__ = [
    "morton_encode",
    "morton_decode",
    "rgb_to_yuv",
    "yuv_to_rgb",
    "voxelize",
]
