from raht3dgs_tpu.utils.padding import pad_rows, round_up_bucket
from raht3dgs_tpu.utils.timing import StageTimer

__all__ = ["pad_rows", "round_up_bucket", "StageTimer"]
