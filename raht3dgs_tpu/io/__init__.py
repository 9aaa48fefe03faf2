from raht3dgs_tpu.io.ply import (
    PlyData,
    read_compressed_3dgs_ply,
    read_ply,
    read_ply_8i,
    read_ply_mvub,
    save_ply_3dgs,
    save_ply_ascii,
)
from raht3dgs_tpu.io.datasets import (
    DATASET_CONFIG,
    get_pointcloud,
    get_pointcloud_n_frames,
)

__all__ = [
    "PlyData",
    "read_ply",
    "read_ply_8i",
    "read_ply_mvub",
    "read_compressed_3dgs_ply",
    "save_ply_3dgs",
    "save_ply_ascii",
    "DATASET_CONFIG",
    "get_pointcloud",
    "get_pointcloud_n_frames",
]
