from raht3dgs_tpu.parallel.sharding import (
    batched_roundtrip_step,
    batched_transform_step,
    batched_transform_step_tp,
    make_mesh,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "batched_transform_step",
    "batched_transform_step_tp",
    "batched_roundtrip_step",
]
