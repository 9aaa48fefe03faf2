from raht3dgs_tpu.codec.rlgr import (
    MemBuf,
    native_available,
    rlgr_decode,
    rlgr_encode,
)

__all__ = ["MemBuf", "native_available", "rlgr_decode", "rlgr_encode"]
