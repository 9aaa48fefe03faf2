from raht3dgs_tpu.codec.rlgr import (
    MemBuf,
    native_available,
    rlgr_decode,
    rlgr_encode,
)
from raht3dgs_tpu.codec.geometry import (
    decode_geometry,
    decode_geometry_lod,
    encode_geometry,
    geometry_from_positions,
    positions_from_geometry,
    positions_from_geometry_lod,
)

__all__ = [
    "MemBuf", "native_available", "rlgr_decode", "rlgr_encode",
    "encode_geometry", "decode_geometry", "decode_geometry_lod",
    "geometry_from_positions", "positions_from_geometry",
    "positions_from_geometry_lod",
]
