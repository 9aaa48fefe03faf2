#!/usr/bin/env python3
"""Judge geometry context models on scan-like occupancy statistics.

The profile-0 coder (native/geom.cpp) conditions each occupancy bit on
(level bank, binary-tree node). Richer spatial contexts measured as an
ADAPTIVE dead end on the noisy synthetic shells (see the geom.cpp header),
but those shells have noise-dominated deep levels; real scans (8iVFBv2
bodies) are locally planar at voxel scale. This experiment re-judges the
candidate models on `eval/synth.synthetic_body_scan` (articulated humanoid,
scan-like statistics) alongside the legacy shell/blob workloads, by
simulating the exact coder automaton per candidate (native/ctxsim.cpp:
integer probability recurrence + ideal -log2 p accumulation; range-coder
overhead < 0.01% at these sizes).

Candidate features per occupancy bit (child c of node n at level l):
  tree   in-byte binary-tree node (already-coded sibling bits) — always on
  bank8  min(l, 7)                      [the shipped profile-0 banking]
  bankX  exact l                        [deep levels stop sharing a bank]
  ext3   occupancy of the 3 face-adjacent SAME-LEVEL neighbor cells of n
         on child c's outward sides (level-l granularity; the decoder
         knows the full level-l cell map before any level-l byte is read)
  n6c    popcount of n's 6 face-neighbor occupancy (0..6)

    python scripts/exp_geom_contexts.py [--depths 9 10] [--quick]
"""

from __future__ import annotations

import argparse
import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

from raht3dgs_tpu.codec._native import NativeLib  # noqa: E402
from raht3dgs_tpu.codec import geometry  # noqa: E402
from raht3dgs_tpu.ops.octree import octree_levels  # noqa: E402
from raht3dgs_tpu.ops.prelude import morton_codes_np  # noqa: E402

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "raht3dgs_tpu", "native",
)


def _configure(lib: ctypes.CDLL) -> None:
    lib.ctxsim_bits.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t, ctypes.c_int32, ctypes.c_int,
    ]
    lib.ctxsim_bits.restype = ctypes.c_double


_sim = NativeLib(
    os.path.join(_NATIVE_DIR, "ctxsim.cpp"),
    os.path.join(_NATIVE_DIR, "libctxsim.so"),
    _configure,
)


def sim_bits(ctx: np.ndarray, bits: np.ndarray, n_ctx: int,
             adapt_shift: int = 5) -> float:
    lib = _sim.load()
    if lib is None:
        raise RuntimeError("ctxsim native kernel unavailable (need g++)")
    ctx = np.ascontiguousarray(ctx, dtype=np.int32)
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    out = lib.ctxsim_bits(
        ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctx.size, n_ctx, adapt_shift,
    )
    if out < 0:
        raise ValueError("ctxsim_bits rejected its inputs")
    return out


def _compact3(x: np.ndarray) -> np.ndarray:
    """Extract every 3rd bit (LSB first) of uint64 Morton words."""
    m = np.uint64
    x = x & m(0x1249249249249249)
    x = (x | (x >> m(2))) & m(0x10C30C30C30C30C3)
    x = (x | (x >> m(4))) & m(0x100F00F00F00F00F)
    x = (x | (x >> m(8))) & m(0x001F0000FF0000FF)
    x = (x | (x >> m(16))) & m(0x001F00000000FFFF)
    x = (x | (x >> m(32))) & m(0x00000000001FFFFF)
    return x


def _decode_coords(codes: np.ndarray, level: int) -> np.ndarray:
    """(n, 3) int64 cell coords of level-`level` node codes (3*level bits),
    digit = z + 2y + 4x (ops/prelude.morton_codes_np convention)."""
    u = codes.astype(np.uint64)
    return np.stack(
        [
            _compact3(u >> np.uint64(2)),  # x
            _compact3(u >> np.uint64(1)),  # y
            _compact3(u),                  # z
        ],
        axis=1,
    ).astype(np.int64)


def level_features(codes_l: np.ndarray, occ_l: np.ndarray, level: int):
    """Per-decision arrays for one level, in exact coder stream order.

    Returns dict with: bits, tree (1..255), level, ext3 (0..7 pattern of
    the child's outward same-level neighbors), n6c (0..6). The forced last
    bit (ctx==1 at i==7) is excluded, as in the real coder.
    """
    n = codes_l.size
    b = occ_l.astype(np.uint16)
    i_idx = np.arange(8, dtype=np.uint16)
    bits = ((b[:, None] >> i_idx[None, :]) & 1).astype(np.uint8)
    tree = ((np.uint16(1) << i_idx)[None, :]
            | (b[:, None] & ((np.uint16(1) << i_idx) - 1))).astype(np.int32)
    keep = ~((i_idx[None, :] == 7) & (tree == 1))

    # node-level 6-neighbor occupancy at this level's granularity
    if level == 0:
        n6 = np.zeros((n, 6), dtype=np.int8)
    else:
        coords = _decode_coords(codes_l, level)
        lim = (1 << level) - 1
        n6 = np.zeros((n, 6), dtype=np.int8)
        col = 0
        for axis in range(3):
            for d in (-1, 1):
                nb = coords.copy()
                nb[:, axis] += d
                valid = (nb[:, axis] >= 0) & (nb[:, axis] <= lim)
                ncode = morton_codes_np(np.clip(nb, 0, lim), level)
                pos = np.searchsorted(codes_l, ncode.astype(codes_l.dtype))
                pos = np.minimum(pos, n - 1)
                hit = (codes_l[pos] == ncode.astype(codes_l.dtype)) & valid
                n6[:, col] = hit
                col += 1
    # child octant c: bit2=x, bit1=y, bit0=z (digit = z + 2y + 4x);
    # outward neighbor on axis a is the - side if the octant bit is 0
    cx = (i_idx >> 2) & 1
    cy = (i_idx >> 1) & 1
    cz = i_idx & 1
    ext_x = np.where(cx[None, :] == 0, n6[:, 0:1], n6[:, 1:2])
    ext_y = np.where(cy[None, :] == 0, n6[:, 2:3], n6[:, 3:4])
    ext_z = np.where(cz[None, :] == 0, n6[:, 4:5], n6[:, 5:6])
    ext3 = (ext_x.astype(np.int32) << 2) | (ext_y.astype(np.int32) << 1) | \
        ext_z.astype(np.int32)
    n6c = n6.sum(axis=1, dtype=np.int32)

    k = keep.ravel()
    return {
        "bits": bits.ravel()[k],
        "tree": tree.ravel()[k],
        "level": np.full(k.sum(), level, dtype=np.int32),
        "ext3": np.broadcast_to(ext3, (n, 8)).ravel()[k],
        "n6c": np.broadcast_to(n6c[:, None], (n, 8)).ravel()[k],
    }


def decisions(codes: np.ndarray, depth: int):
    lv, occ = octree_levels(codes, depth)
    feats = [level_features(lv[l], occ[l], l) for l in range(depth)]
    return {k: np.concatenate([f[k] for f in feats]) for k in feats[0]}


MODELS = {
    # name -> (feature expr, n_ctx builder)
    "bank8.tree": lambda d, J: (
        np.minimum(d["level"], 7) * 256 + d["tree"], 8 * 256),
    "bank8.ext3.tree": lambda d, J: (
        (np.minimum(d["level"], 7) * 8 + d["ext3"]) * 256 + d["tree"],
        8 * 8 * 256),
    "bank8.n6c.tree": lambda d, J: (
        (np.minimum(d["level"], 7) * 7 + d["n6c"]) * 256 + d["tree"],
        8 * 7 * 256),
    "bankX.tree": lambda d, J: (d["level"] * 256 + d["tree"], J * 256),
    "bankX.ext3.tree": lambda d, J: (
        (d["level"] * 8 + d["ext3"]) * 256 + d["tree"], J * 8 * 256),
    "bankX.n6c.tree": lambda d, J: (
        (d["level"] * 7 + d["n6c"]) * 256 + d["tree"], J * 7 * 256),
    "bankX.ext3.n6c.tree": lambda d, J: (
        ((d["level"] * 8 + d["ext3"]) * 7 + d["n6c"]) * 256 + d["tree"],
        J * 8 * 7 * 256),
}


def workloads(depths, quick=False):
    from raht3dgs_tpu.eval.synth import synthetic_body_scan
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_geometry import blob, shell

    for J in depths:
        body = synthetic_body_scan(
            depth=J, seed=0, n_frames=1,
            samples_per_voxel=2.0 if quick else 5.0)[0][0]
        yield (f"body J={J}", geometry.codes_from_positions(body, J), J)
        yield (f"shell J={J}", shell(7, 600000, J), J)
    if not quick:
        yield ("blob J=8", blob(7, 600000, 8), 8)


def temporal_decisions(codes: np.ndarray, prev: np.ndarray, depth: int):
    """Per-decision arrays for a P-frame: intra features + the profile-1
    temporal flag (0 unmatched, 2/3 = matched previous node's bit)."""
    lv_cur, occ_cur = octree_levels(codes, depth)
    lv_prev, occ_prev = octree_levels(prev, depth)
    feats = []
    for l in range(depth):
        f = level_features(lv_cur[l], occ_cur[l], l)
        matched, pb = geometry._match_level(lv_cur[l], lv_prev[l],
                                            occ_prev[l])
        n = lv_cur[l].size
        i_idx = np.arange(8, dtype=np.uint16)
        b = occ_cur[l].astype(np.uint16)
        tree = ((np.uint16(1) << i_idx)[None, :]
                | (b[:, None] & ((np.uint16(1) << i_idx) - 1)))
        keep = (~((i_idx[None, :] == 7) & (tree == 1))).ravel()
        pbit = ((pb.astype(np.uint16)[:, None] >> i_idx[None, :]) & 1)
        tflag = np.where(matched.astype(bool)[:, None], 2 + pbit, 0)
        f["tflag"] = tflag.astype(np.int32).ravel()[keep]
        feats.append(f)
    return {k: np.concatenate([f[k] for f in feats]) for k in feats[0]}


T_MODELS = {
    "bank8.tflag.tree": lambda d, J: (
        (np.minimum(d["level"], 7) * 4 + d["tflag"]) * 256 + d["tree"],
        8 * 4 * 256),
    "bank8.tflag.ext3.tree": lambda d, J: (
        ((np.minimum(d["level"], 7) * 4 + d["tflag"]) * 8 + d["ext3"]) * 256
        + d["tree"], 8 * 4 * 8 * 256),
    "bank8.ext3.tree(intra-on-P)": lambda d, J: (
        (np.minimum(d["level"], 7) * 8 + d["ext3"]) * 256 + d["tree"],
        8 * 8 * 256),
}


def temporal_table(depths, quick=False):
    from raht3dgs_tpu.eval.synth import synthetic_body_scan

    names = list(T_MODELS)
    print()
    print("P-frame geometry (body walk sequence, frame t vs t-1):")
    print("| workload | voxels | coded b/v (profile 1) | "
          + " | ".join(names) + " |")
    print("|---" * (len(names) + 3) + "|")
    for J in depths:
        frames = synthetic_body_scan(
            depth=J, seed=0, n_frames=2,
            samples_per_voxel=2.0 if quick else 5.0)
        prev = geometry.codes_from_positions(frames[0][0], J)
        cur = geometry.codes_from_positions(frames[1][0], J)
        d = temporal_decisions(cur, prev, J)
        nvox = cur.size
        sec = geometry.encode_geometry(cur, J, prev_codes=prev)
        actual = len(sec) * 8 / nvox
        cells = []
        for name in names:
            ctx, n_ctx = T_MODELS[name](d, J)
            bv = sim_bits(ctx, d["bits"], n_ctx) / nvox
            cells.append(f"{bv:.3f}")
        print(f"| body P J={J} | {nvox} | {actual:.3f} | "
              + " | ".join(cells) + " |")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--depths", type=int, nargs="+", default=[9, 10])
    ap.add_argument("--quick", action="store_true",
                    help="fewer samples (CI-sized)")
    ap.add_argument("--no-temporal", action="store_true")
    args = ap.parse_args(argv)

    names = list(MODELS)
    print("| workload | voxels | coded b/v (profile 0) | "
          + " | ".join(names) + " |")
    print("|---" * (len(names) + 3) + "|")
    for wname, codes, J in workloads(args.depths, args.quick):
        d = decisions(codes, J)
        nvox = codes.size
        actual = len(geometry.encode_geometry(codes, J)) * 8 / nvox
        cells = []
        for name in names:
            ctx, n_ctx = MODELS[name](d, J)
            bv = sim_bits(ctx, d["bits"], n_ctx) / nvox
            cells.append(f"{bv:.3f}")
        print(f"| {wname} | {nvox} | {actual:.3f} | "
              + " | ".join(cells) + " |")
    if not args.no_temporal:
        temporal_table(args.depths, args.quick)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
