"""Pallas TPU kernel: double-single compensated prefix sums in one pass.

``lax.associative_scan`` materializes O(log N) intermediate arrays in HBM;
for the codec's (N, K) prefix packs that is the dominant memory traffic
(measured ~8 ms of a 19 ms voxelize at 500k on v5e). TPU Pallas grids
execute sequentially on the core, so a chunked scan kernel keeps a running
carry in on-chip scratch and touches HBM exactly once per element:

- grid over row-chunks; each step loads a (CHUNK, K) block into VMEM;
- an in-register Hillis–Steele doubling scan (log2 CHUNK steps) computes
  the local inclusive prefix in double-single (two-float32) arithmetic;
- the carry (one (1, K) hi/lo pair in VMEM scratch, persistent across the
  sequential grid) is folded in, outputs written, carry updated from the
  chunk total.

Numerics are the same error-free two-sum compensation as
``ops/raht_span._ds_cumsum`` (~48 mantissa bits). On CPU the kernel runs in
interpreter mode so the test suite exercises it everywhere.

Verdict after v5e measurement (end of round 1): BOTH variants are f64-exact
on hardware but LOSE to ``lax.associative_scan`` at codec shapes — the
(N, K) layout wastes 124/128 lanes (4.4 ms at (500k, 4)), and the
transposed variant's sequential 256-step carry grid is iteration-bound
(~27 ms kernel compute vs <5 ms for the associative scan). Kept as
correctness-verified references behind ``RAHT3DGS_PALLAS=1/2``; the
default path stays the associative scan. A future win would need to fuse
the scan into the surrounding prefix-pack gathers in one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048


def _two_sum(a, b):
    s = a + b
    bv = s - a
    err = (a - (s - bv)) + (b - bv)
    return s, err


def _ds_add(hi1, lo1, hi2, lo2):
    s, e = _two_sum(hi1, hi2)
    e = e + (lo1 + lo2)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def _scan_kernel(x_ref, hi_ref, lo_ref, carry_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    hi = x_ref[:]                      # (CHUNK, K)
    lo = jnp.zeros_like(hi)
    n = hi.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 0)

    # Hillis-Steele inclusive scan, double-single lanes.
    shift = 1
    while shift < n:
        # NB: the shift must be i32 — under jax_enable_x64 a bare Python int
        # weakly types to i64, which Mosaic's dynamic_rotate rejects.
        hi_s = pltpu.roll(hi, jnp.int32(shift), axis=0)
        lo_s = pltpu.roll(lo, jnp.int32(shift), axis=0)
        mask = row >= shift
        hi_s = jnp.where(mask, hi_s, 0.0)
        lo_s = jnp.where(mask, lo_s, 0.0)
        hi, lo = _ds_add(hi, lo, hi_s, lo_s)
        shift *= 2

    # fold in the running carry (row 0 = hi, row 1 = lo)
    k = hi.shape[1]
    chi = carry_ref[0:1, :k]
    clo = carry_ref[1:2, :k]
    out_hi, out_lo = _ds_add(hi, lo, chi, clo)
    hi_ref[:] = out_hi
    lo_ref[:] = out_lo
    # new carry = last row of the combined prefix
    carry_ref[0:1, :k] = out_hi[-1:, :]
    carry_ref[1:2, :k] = out_lo[-1:, :]


def _scan_kernel_t(x_ref, hi_ref, lo_ref, carry_ref):
    """Transposed layout: rows = K channels, scan runs along the LANE axis.

    With (K, CHUNK_T) blocks all 128 lanes stay busy (the (CHUNK, K) layout
    wastes 128-K of them) — this is the intended production variant; the
    row-major kernel is kept for comparison.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    hi = x_ref[:]                      # (K, CHUNK_T)
    lo = jnp.zeros_like(hi)
    n = hi.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)

    shift = 1
    while shift < n:
        hi_s = pltpu.roll(hi, jnp.int32(shift), axis=1)
        lo_s = pltpu.roll(lo, jnp.int32(shift), axis=1)
        mask = col >= shift
        hi_s = jnp.where(mask, hi_s, 0.0)
        lo_s = jnp.where(mask, lo_s, 0.0)
        hi, lo = _ds_add(hi, lo, hi_s, lo_s)
        shift *= 2

    k = hi.shape[0]
    chi = carry_ref[:k, 0:1]
    clo = carry_ref[:k, 1:2]
    out_hi, out_lo = _ds_add(hi, lo, chi, clo)
    hi_ref[:] = out_hi
    lo_ref[:] = out_lo
    carry_ref[:k, 0:1] = out_hi[:, -1:]
    carry_ref[:k, 1:2] = out_lo[:, -1:]


CHUNK_T = 2048


@functools.partial(jax.jit, static_argnames=("interpret",))
def ds_cumsum_pallas_t(x: jnp.ndarray, interpret: bool = False):
    """Transposed-layout variant of :func:`ds_cumsum_pallas`.

    ``x (N, K)`` float32 -> (hi, lo) float32, scanning along N which is laid
    out on the lane axis internally (full lane utilization).
    """
    N, K = x.shape
    pad = (-N) % CHUNK_T
    xt = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0))).T  # (K, Np)
    grid = (xt.shape[1] // CHUNK_T,)

    def _imap(i):
        return (jnp.zeros((), jnp.int32), i)

    hi, lo = pl.pallas_call(
        _scan_kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, CHUNK_T), _imap, memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((K, CHUNK_T), _imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CHUNK_T), _imap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xt.shape, jnp.float32),
            jax.ShapeDtypeStruct(xt.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((max(K, 8), 128), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xt)
    return hi.T[:N], lo.T[:N]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ds_cumsum_pallas(x: jnp.ndarray, interpret: bool = False):
    """Compensated inclusive prefix sums along axis 0 of ``x (N, K)`` f32.

    Returns (hi, lo) float32. N is padded internally to a CHUNK multiple.
    """
    N, K = x.shape
    pad = (-N) % CHUNK
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
    grid = (xp.shape[0] // CHUNK,)

    def _imap(i):
        # under jax_enable_x64 a literal 0 would trace as i64, which Mosaic
        # rejects in block index maps — keep everything i32
        return (i, jnp.zeros((), jnp.int32))

    hi, lo = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK, K), _imap, memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, K), _imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, K), _imap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, max(K, 128)), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp)
    return hi[:N], lo[:N]
