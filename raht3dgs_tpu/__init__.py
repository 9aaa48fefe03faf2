"""raht3dgs_tpu — TPU-native (JAX/XLA/Pallas) RAHT attribute codec for point
clouds and 3D Gaussian Splatting scenes.

A brand-new framework with the capabilities of the reference RAHT-3DGS-codec
(see /root/reference and SURVEY.md), re-designed TPU-first:

- Morton coding / voxelization as vectorized bit-interleave + on-device sort +
  segmented reductions (reference: python/voxelize_pc.py).
- The Region-Adaptive Hierarchical Transform (RAHT) and its inverse as *dense
  masked butterfly levels* over a fixed-size state — no ragged per-level index
  lists, so the whole transform jits to a single XLA program with static shapes
  (reference: python/RAHT_param.py, python/RAHT.py, python/iRAHT.py).
- Zero-weight padding entries are algebraically invisible to the transform
  (butterfly degenerates to identity), enabling shape bucketing for jit-cache
  friendliness.
- Adaptive Run-Length Golomb-Rice entropy coding bit-compatible with the
  Malvar DCC'06 automaton (reference: python/PyRLGR/src/libs/rlgr/membuf.cpp),
  implemented as a native C++ module (ctypes) with a numpy fallback.

Morton codes use int32 (J <= 10), int64 (J <= 20), or uint64 (J = 21, the
reference's MATLAB ceiling — the padding sentinel occupies bit 63); the
wide tiers require JAX x64 mode, enabled on package import.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from raht3dgs_tpu.ops.morton import morton_encode, morton_decode  # noqa: E402
from raht3dgs_tpu.ops.color import rgb_to_yuv, yuv_to_rgb  # noqa: E402
from raht3dgs_tpu.ops.voxelize import voxelize  # noqa: E402
from raht3dgs_tpu.ops.raht import (  # noqa: E402
    raht_forward,
    raht_inverse,
    raht_structure,
)
from raht3dgs_tpu.ops.raht_span import (  # noqa: E402
    raht_forward_span,
    raht_inverse_span,
    raht_structure_span,
)

__all__ = [
    "morton_encode",
    "morton_decode",
    "rgb_to_yuv",
    "yuv_to_rgb",
    "voxelize",
    "raht_forward",
    "raht_inverse",
    "raht_structure",
    "raht_forward_span",
    "raht_inverse_span",
    "raht_structure_span",
    "__version__",
]
