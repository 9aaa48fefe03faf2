from raht3dgs_tpu.codec.rlgr import (
    MemBuf,
    native_available,
    rlgr_decode,
    rlgr_encode,
)
from raht3dgs_tpu.codec.geometry import (
    decode_geometry,
    encode_geometry,
    geometry_from_positions,
    positions_from_geometry,
)

__all__ = [
    "MemBuf", "native_available", "rlgr_decode", "rlgr_encode",
    "encode_geometry", "decode_geometry", "geometry_from_positions",
    "positions_from_geometry",
]
