"""On-device bitrate estimation for quantized coefficients.

The reference can only know a rate by actually running the serial RLGR
coder on the host. For rate-targeted encoding (pick the step that hits a
bpp budget) that's a host round-trip per probe. This module estimates the
RLGR bitstream size entirely on device with a block-adaptive Golomb-Rice
surrogate:

- zigzag-map the symbols;
- per block of 256, pick the best GR parameter k (vectorized over all k);
- charge ``(u >> k) + 1 + k`` bits per symbol under that k, with an
  all-zero block floored at ~1 bit per run-mode escape.

This over-estimates slightly (no run-mode modeling inside mixed blocks) but
tracks the true size monotonically across quantization steps — exactly what
a bisection search needs. Accuracy is asserted in tests (typically within
~15% on RAHT coefficient statistics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLOCK = 256
MAX_K = 18


@partial(jax.jit, static_argnames=("block",))
def estimate_rlgr_bits(q: jnp.ndarray, valid=None, block: int = BLOCK) -> jnp.ndarray:
    """Estimated bits to RLGR-encode each channel of ``q`` (N, D) int32.

    ``valid``: optional (N,) mask (padding exclusion). Returns (D,) float
    bit counts.
    """
    N, D = q.shape
    u = jnp.where(q >= 0, 2 * q.astype(jnp.int64), -2 * q.astype(jnp.int64) - 1)
    if valid is not None:
        u = jnp.where(valid[:, None], u, 0)
        vcount = valid.astype(jnp.float64)
    else:
        vcount = jnp.ones((N,), dtype=jnp.float64)

    pad = (-N) % block
    u = jnp.pad(u, ((0, pad), (0, 0)))
    vc = jnp.pad(vcount, (0, pad))
    nb = u.shape[0] // block
    ub = u.reshape(nb, block, D)
    vb = vc.reshape(nb, block, 1)

    ks = jnp.arange(MAX_K, dtype=jnp.int64)
    nval = jnp.sum(vb, axis=1)                              # (nb, 1)

    # --- no-run mode: every symbol gets a GR codeword under the best k ---
    shifted = ub[None] >> ks[:, None, None, None]           # (K, nb, B, D)
    payload = jnp.sum(shifted * vb[None], axis=2)           # (K, nb, D)
    per_k = payload + nval[None] * (1 + ks)[:, None, None]
    cost_gr = jnp.min(per_k, axis=0)                        # (nb, D)

    # --- run mode: zeros cost ~1 bit per 2^kp-run; each nonzero costs the
    # 0-marker + kp-bit partial-run length + GR(u-1) ---
    nz = (ub > 0) & (vb > 0)
    nnz = jnp.sum(nz, axis=1).astype(jnp.float64)           # (nb, D)
    zeros = jnp.maximum(nval - nnz, 0.0)
    um1 = jnp.where(nz, ub - 1, 0)
    shifted1 = um1[None] >> ks[:, None, None, None]
    val_k = jnp.sum(shifted1, axis=2) + nnz[None] * (1 + ks)[:, None, None]
    val_bits = jnp.min(val_k, axis=0)
    run_len = zeros / jnp.maximum(nnz, 1.0)
    run_bits = nnz * (1.0 + jnp.log2(run_len + 2.0)) + zeros / jnp.maximum(
        run_len, 1.0
    )
    cost_run = jnp.where(nnz > 0, val_bits + run_bits, 8.0)

    best = jnp.minimum(cost_gr, cost_run)
    return jnp.sum(best, axis=0)


def estimate_bpp(q: jnp.ndarray, n_voxels: int, valid=None) -> jnp.ndarray:
    """Estimated total rate in bits per voxel over all channels."""
    return jnp.sum(estimate_rlgr_bits(q, valid=valid)) / n_voxels
