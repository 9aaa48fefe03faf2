"""Tile-partitioned frames: spatial random access (ROI decode).

Beyond-reference capability (the reference codes every frame as one
monolithic coefficient stream — decoding ANY attribute requires the full
entropy decode). Here a frame may be partitioned into BRICKS — the
octree cells at a chosen ``brick_depth`` D — and each occupied brick
encodes as its own fully standard ``FrameStream`` (R3TC). A receiver
then decodes only the bricks intersecting a region of interest: O(roi)
work instead of O(frame), the streaming/teleport pattern volumetric
video serving needs.

Why this reuses the codec unchanged: tile voxels share their top 3D
Morton bits, so in the global-coordinate RAHT every level above the
brick root has a single occupied node per level — the butterflies there
are identities and the transform coefficients equal a local transform's.
Each tile is therefore just a (small) standard frame at the SAME octree
depth, same vmin/width metadata, and the existing AttributeCodec /
geometry coder / entropy profiles / quantizers all apply per tile with
no new math. Tiles are independent: encode and decode parallelize, and
corruption is contained brick-locally.

Container (``.r3tt``)::

    'R3TT' | u8 version | u8 depth | u8 brick_depth | u8 flags(0) |
    u32 n_tiles | u64 keys[n_tiles] | u64 offsets[n_tiles + 1] |
    tile blobs (each a complete R3TC FrameStream)

``keys`` are the occupied bricks' Morton codes at ``brick_depth``,
ascending — concatenating tiles in key order reproduces the frame's
global Morton order exactly (the brick key IS the code's top bits).

Rate overhead vs monolithic: per-tile container headers (~70 B), entropy
adaptation restarts, and one DC band per brick; measured in
docs/rd_tiling.md (scripts/rd_tiling.py).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from raht3dgs_tpu.codec.bitstream import FrameStream

TILE_MAGIC = b"R3TT"
TILE_VERSION = 1


def brick_keys_np(codes: np.ndarray, depth: int, brick_depth: int) -> np.ndarray:
    """Brick Morton key (top ``3*brick_depth`` bits) of each voxel code."""
    shift = 3 * (depth - brick_depth)
    return (codes.astype(np.uint64) >> np.uint64(shift)).astype(np.int64)


def brick_box(key: int, depth: int, brick_depth: int) -> Tuple[np.ndarray, np.ndarray]:
    """Voxel-coordinate bounding box [lo, hi) of a brick key."""
    import jax.numpy as jnp

    from raht3dgs_tpu.ops.morton import morton_decode

    b = np.asarray(
        morton_decode(jnp.asarray([key], dtype=jnp.int64), brick_depth)
    )[0]
    side = 1 << (depth - brick_depth)
    lo = b.astype(np.int64) * side
    return lo, lo + side


def encode_tiled_frame(
    V: np.ndarray,
    attrs: np.ndarray,
    depth: int,
    brick_depth: int,
    codec,
    steps,
    *,
    bucket: int = 1 << 10,
    code_geometry: bool = False,
    vmin: Optional[np.ndarray] = None,
    width: Optional[float] = None,
) -> Tuple[bytes, List[Tuple[int, int, int]]]:
    """Encode unique integer voxel positions + attributes as an ``.r3tt``
    tiled frame. Returns ``(blob, [(key, n_voxels, n_bytes), ...])``.

    ``codec`` is a standard :class:`AttributeCodec` at ``depth`` — every
    tile reuses its jitted programs (tiles bucket to shared shapes).
    ``vmin``/``width`` are the GLOBAL frame metadata (shared by every
    tile so any subset reconstructs in frame coordinates)."""
    from raht3dgs_tpu.codec.geometry import geometry_from_positions
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    if not 0 < brick_depth < depth:
        raise ValueError(
            f"brick_depth must be in (0, depth): got {brick_depth} at "
            f"depth {depth}"
        )
    V = np.asarray(V)
    attrs = np.asarray(attrs)
    codes = morton_codes_np(V.astype(np.int64), depth)
    order = np.argsort(codes, kind="stable")
    if len(np.unique(codes)) != len(codes):
        raise ValueError("tiled encode needs unique voxel positions")
    keys = brick_keys_np(codes[order], depth, brick_depth)
    # tiles = runs of equal brick key over the Morton-sorted frame
    starts = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
    ends = np.concatenate([starts[1:], [len(keys)]])
    blobs, stats = [], []
    for s, e in zip(starts, ends):
        idx = order[s:e]
        frame = prepare_voxel_frame(
            V[idx].astype(np.int64), attrs[idx], depth, bucket=bucket,
            dtype=codec.dtype, vmin=vmin, width=width,
        )
        enc = codec.encode(frame, steps)
        if code_geometry:
            enc.stream.geometry = geometry_from_positions(V[idx], depth)
        blob = enc.stream.to_bytes()
        blobs.append(blob)
        stats.append((int(keys[s]), int(e - s), len(blob)))
    head_len = 12 + 8 * len(blobs) + 8 * (len(blobs) + 1)
    offsets = [head_len]
    for b in blobs:
        offsets.append(offsets[-1] + len(b))
    out = bytearray()
    out += struct.pack("<4sBBBBI", TILE_MAGIC, TILE_VERSION, depth,
                       brick_depth, 0, len(blobs))
    out += struct.pack(f"<{len(blobs)}q", *[k for k, _, _ in stats])
    out += struct.pack(f"<{len(blobs) + 1}Q", *offsets)
    for b in blobs:
        out += b
    return bytes(out), stats


class TiledReader:
    """Random-access reader over an ``.r3tt`` tiled frame."""

    def __init__(self, data: bytes):
        if len(data) < 12:
            raise ValueError("truncated tiled frame: header needs 12 bytes")
        magic, version, depth, brick_depth, _, n = struct.unpack(
            "<4sBBBBI", data[:12]
        )
        if magic != TILE_MAGIC:
            raise ValueError(f"bad tiled-frame magic {magic!r}")
        if version != TILE_VERSION:
            raise ValueError(f"unsupported tiled-frame version {version}")
        if not 0 < brick_depth < depth:
            raise ValueError(
                f"corrupt tiled frame: brick_depth {brick_depth} at depth "
                f"{depth}"
            )
        need = 12 + 8 * n + 8 * (n + 1)
        if len(data) < need:
            raise ValueError("truncated tiled frame: index cut off")
        self.depth = depth
        self.brick_depth = brick_depth
        self.keys = np.frombuffer(data[12:12 + 8 * n], dtype=np.int64)
        off0 = 12 + 8 * n
        self._offsets = struct.unpack(
            f"<{n + 1}Q", data[off0:off0 + 8 * (n + 1)]
        )
        if any(self._offsets[i + 1] < self._offsets[i] for i in range(n)):
            raise ValueError("corrupt tiled frame: offsets not nondecreasing")
        if self._offsets[-1] > len(data):
            raise ValueError(
                f"truncated tiled frame: tiles need {self._offsets[-1]} "
                f"bytes, have {len(data)}"
            )
        if n and np.any(self.keys[1:] <= self.keys[:-1]):
            raise ValueError("corrupt tiled frame: keys not ascending")
        self._data = data

    def __len__(self) -> int:
        return len(self.keys)

    @property
    def n_voxels(self) -> int:
        return sum(self.tile(i).n_voxels for i in range(len(self)))

    def tile_bytes(self, i: int) -> bytes:
        if not 0 <= i < len(self):
            raise IndexError(f"tile {i} out of range [0, {len(self)})")
        return self._data[self._offsets[i]:self._offsets[i + 1]]

    def tile(self, i: int) -> FrameStream:
        return FrameStream.from_bytes(self.tile_bytes(i))

    def select_roi(self, lo, hi) -> List[int]:
        """Tile indices whose brick boxes intersect the voxel-coordinate
        box [lo, hi) (half-open, per axis)."""
        lo = np.asarray(lo, dtype=np.int64)
        hi = np.asarray(hi, dtype=np.int64)
        if lo.shape != (3,) or hi.shape != (3,):
            raise ValueError("roi lo/hi must be 3-vectors")
        if np.any(hi <= lo):
            raise ValueError(f"empty ROI: lo {lo.tolist()} hi {hi.tolist()}")
        out = []
        for i, k in enumerate(self.keys):
            blo, bhi = brick_box(int(k), self.depth, self.brick_depth)
            if np.all(blo < hi) and np.all(bhi > lo):
                out.append(i)
        return out


def decode_tiled_frame(
    data,
    *,
    roi: Optional[Tuple] = None,
    positions: Optional[np.ndarray] = None,
    codec=None,
    dtype=None,
    bucket: int = 1 << 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode an ``.r3tt`` frame (or only the tiles intersecting ``roi =
    (lo, hi)``). Returns ``(positions, attributes)`` in global Morton
    order; with ``roi`` the result is clipped to exactly the box.

    Tiles written with ``code_geometry=True`` are self-contained;
    otherwise ``positions`` (the frame's unique integer voxels) supplies
    the geometry and is partitioned by brick here."""
    import jax.numpy as jnp

    from raht3dgs_tpu.codec.geometry import positions_from_geometry
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    reader = data if isinstance(data, TiledReader) else TiledReader(data)
    sel = (reader.select_roi(*roi) if roi is not None
           else list(range(len(reader))))
    if not sel:
        raise ValueError("ROI intersects no occupied brick")
    pos_parts, attr_parts = [], []
    by_brick = None
    if positions is not None:
        positions = np.asarray(positions)
        codes = morton_codes_np(positions.astype(np.int64), reader.depth)
        order = np.argsort(codes, kind="stable")
        keys = brick_keys_np(codes[order], reader.depth, reader.brick_depth)
        by_brick = {}
        starts = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(keys)]])
        for s, e in zip(starts, ends):
            by_brick[int(keys[s])] = positions[order[s:e]]
    for i in sel:
        stream = reader.tile(i)
        if dtype is None:
            dtype = jnp.float32 if stream.dtype32 else jnp.float64
        if codec is None:
            codec = AttributeCodec(reader.depth, dtype=dtype,
                                   order_mode=stream.order_mode)
        if stream.geometry is not None:
            Vt = positions_from_geometry(stream.geometry, reader.depth,
                                         stream.n_voxels)
        elif by_brick is not None:
            Vt = by_brick.get(int(reader.keys[i]))
            if Vt is None or len(Vt) != stream.n_voxels:
                raise ValueError(
                    f"positions do not cover brick {int(reader.keys[i])} "
                    f"({0 if Vt is None else len(Vt)} voxels vs "
                    f"{stream.n_voxels} in the stream)"
                )
        else:
            raise ValueError(
                "tiles carry no geometry sections — pass positions= (or "
                "re-encode with code_geometry=True)"
            )
        frame = prepare_voxel_frame(
            np.asarray(Vt).astype(np.int64),
            np.zeros((len(Vt), stream.n_channels)),
            reader.depth, bucket=bucket, dtype=dtype,
        )
        rec, _ = codec.decode(stream, frame.codes, frame.weights)
        # prepare sorts by Morton; report positions in that order
        codes_t = morton_codes_np(np.asarray(Vt).astype(np.int64),
                                  reader.depth)
        pos_parts.append(np.asarray(Vt)[np.argsort(codes_t, kind="stable")])
        attr_parts.append(rec)
    V = np.concatenate(pos_parts, axis=0)
    A = np.concatenate(attr_parts, axis=0)
    if roi is not None:
        lo = np.asarray(roi[0], dtype=np.int64)
        hi = np.asarray(roi[1], dtype=np.int64)
        keep = np.all((V >= lo) & (V < hi), axis=1)
        V, A = V[keep], A[keep]
    return V, A
