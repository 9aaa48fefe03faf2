"""Morton (Z-order) coding as fully vectorized int64 bit manipulation.

The reference computes Morton codes with a Python loop over J octree levels
(``/root/reference/python/voxelize_pc.py:25-59`` and
``/root/reference/python/RAHT_param.py:30-36``). On TPU we instead spread the
21 bits of each coordinate with the classic magic-constant shift/mask ladder —
a constant number of elementwise int64 ops that XLA fuses into one pass.

Bit layout matches the reference exactly: for level ``i`` (0-based) the 3-bit
digit is ``z + 2*y + 4*x`` placed at bit ``3*i`` — i.e. z occupies bit ``3i``,
y bit ``3i+1``, x bit ``3i+2`` (``voxelize_pc.py:52-57``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Maximum bits per coordinate an int64 Morton code can hold (3*21 = 63).
MAX_DEPTH = 21

_SPREAD_MASKS = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)

# 32-bit ladder for depths <= 10 (3*10 = 30 bits): int64 is emulated on TPU,
# so the common J=10 (3DGS) path stays in native int32.
_SPREAD_MASKS32 = (
    (16, 0x30000FF),
    (8, 0x300F00F),
    (4, 0x30C30C3),
    (2, 0x9249249),
)
MAX_DEPTH32 = 10


def _spread_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 21 bits of ``x`` so bit i lands at position 3*i."""
    x = x.astype(jnp.int64) & jnp.int64((1 << MAX_DEPTH) - 1)
    for shift, mask in _SPREAD_MASKS:
        x = (x | (x << shift)) & jnp.int64(mask)
    return x


def _spread_bits32(x: jnp.ndarray) -> jnp.ndarray:
    """int32 variant: spread the low 10 bits so bit i lands at 3*i."""
    x = x.astype(jnp.int32) & jnp.int32((1 << MAX_DEPTH32) - 1)
    for shift, mask in _SPREAD_MASKS32:
        x = (x | (x << shift)) & jnp.int32(mask)
    return x


_COMPACT_MASKS = (
    (2, 0x10C30C30C30C30C3),
    (4, 0x100F00F00F00F00F),
    (8, 0x1F0000FF0000FF),
    (16, 0x1F00000000FFFF),
    (32, 0x1FFFFF),
)


_COMPACT_MASKS32 = (
    (2, 0x30C30C3),
    (4, 0x300F00F),
    (8, 0x30000FF),
    (16, 0x3FF),
)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_spread_bits`: gather every 3rd bit down to the low 21."""
    x = x.astype(jnp.int64) & jnp.int64(0x1249249249249249)
    for shift, mask in _COMPACT_MASKS:
        x = (x | (x >> shift)) & jnp.int64(mask)
    return x


def _compact_bits32(x: jnp.ndarray) -> jnp.ndarray:
    """int32 inverse of :func:`_spread_bits32`."""
    x = x.astype(jnp.int32) & jnp.int32(0x9249249)
    for shift, mask in _COMPACT_MASKS32:
        x = (x | (x >> shift)) & jnp.int32(mask)
    return x


@partial(jax.jit, static_argnames=("depth",))
def morton_encode(V: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Interleave integer coordinates ``V[:, 0:3] = (x, y, z)`` into Morton codes.

    Args:
        V: ``(N, 3)`` integer coordinates, each in ``[0, 2**depth)``.
        depth: octree depth J (bits per axis), ``1 <= depth <= 21``.

    Returns:
        ``(N,)`` Morton codes using the low ``3*depth`` bits — int32 for
        ``depth <= 10`` (native TPU arithmetic), int64 above.
    """
    if not 1 <= depth <= MAX_DEPTH:
        raise ValueError(f"depth must be in [1, {MAX_DEPTH}], got {depth}")
    if depth <= MAX_DEPTH32:
        V = V.astype(jnp.int32)
        lim = jnp.int32((1 << depth) - 1)
        x = V[:, 0] & lim
        y = V[:, 1] & lim
        z = V[:, 2] & lim
        return (
            _spread_bits32(z)
            | (_spread_bits32(y) << 1)
            | (_spread_bits32(x) << 2)
        )
    V = V.astype(jnp.int64)
    lim = jnp.int64((1 << depth) - 1)
    x = V[:, 0] & lim
    y = V[:, 1] & lim
    z = V[:, 2] & lim
    return _spread_bits(z) | (_spread_bits(y) << 1) | (_spread_bits(x) << 2)


def internal_payload_bits(depth: int, n: int) -> int:
    """Bits of code payload for a transform over ``n`` padded slots at depth J.

    Real Morton codes occupy ``3*depth`` bits. Padding slots are assigned the
    unique codes ``(1 << payload_bits) + k`` (k = slot index), which sort after
    every real code and share no maskable prefix with real codes until the
    real octree has fully merged — making padding algebraically invisible to
    the RAHT (see ops/raht.py). ``payload_bits`` must therefore cover both the
    real code range and the slot-index range.
    """
    pad_index_bits = max(1, (max(n, 1) - 1).bit_length())
    bits = max(3 * depth, pad_index_bits)
    if bits + 1 > 64:
        raise ValueError(
            f"3*depth + pad bit = {bits + 1} exceeds uint64 range (depth={depth})"
        )
    return bits


def code_dtype(depth: int, n: int):
    """Narrowest dtype holding real + padding codes for this configuration.

    depth <= 10 stays int32 (native TPU arithmetic); up to depth 20 int64;
    depth 21 — the reference's uint64 Morton ceiling
    (``matlab/encode_ply.m:27``) — needs the sign bit for the padding
    sentinel, hence uint64."""
    bits = internal_payload_bits(depth, n) + 1
    if bits <= 31:
        return jnp.int32
    if bits <= 63:
        return jnp.int64
    return jnp.uint64


def pad_code(depth: int, n: int, slot: jnp.ndarray) -> jnp.ndarray:
    """Sentinel code for padding slot(s) ``slot`` in an ``n``-slot transform."""
    dt = code_dtype(depth, n)
    base = jnp.asarray(1 << internal_payload_bits(depth, n), dtype=dt)
    return base + slot.astype(dt)


@partial(jax.jit, static_argnames=("depth",))
def morton_decode(codes: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Inverse of :func:`morton_encode`: codes -> ``(N, 3)`` ``(x, y, z)``."""
    if not 1 <= depth <= MAX_DEPTH:
        raise ValueError(f"depth must be in [1, {MAX_DEPTH}], got {depth}")
    if depth <= MAX_DEPTH32 and codes.dtype == jnp.int32:
        lim = jnp.int32((1 << depth) - 1)
        z = _compact_bits32(codes) & lim
        y = _compact_bits32(codes >> 1) & lim
        x = _compact_bits32(codes >> 2) & lim
        return jnp.stack([x, y, z], axis=1)
    codes = codes.astype(jnp.int64)
    lim = jnp.int64((1 << depth) - 1)
    z = _compact_bits(codes) & lim
    y = _compact_bits(codes >> 1) & lim
    x = _compact_bits(codes >> 2) & lim
    return jnp.stack([x, y, z], axis=1)
