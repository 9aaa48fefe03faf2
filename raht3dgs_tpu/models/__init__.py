from raht3dgs_tpu.models.pipeline import (
    AttributeCodec,
    EncodedFrame,
    prepare_voxel_frame,
    progressive_prefix_bytes,
)

__all__ = [
    "AttributeCodec",
    "EncodedFrame",
    "prepare_voxel_frame",
    "progressive_prefix_bytes",
]
