"""Measure the lossless geometry coder: rate + throughput across workloads.

Host-side experiment (the geometry coder never touches the device). Prints
a markdown table of bits/voxel for the entropy-coded section vs the uncoded
occupancy bytes vs raw 3J-bit codes, plus native encode/decode throughput.

    python scripts/exp_geometry.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from raht3dgs_tpu.codec import geometry
from raht3dgs_tpu.ops.morton import morton_encode
from raht3dgs_tpu.ops.octree import octree_serialize


def shell(seed, n, depth, rel_noise=0.0015):
    """Surface shell: the structure class of scanned clouds (8iVFBv2)."""
    rng = np.random.default_rng(seed)
    half = 1 << (depth - 1)
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = 0.78 * half + rng.normal(0, max(rel_noise * 2 * half, 0.5), n)
    pts = np.stack(
        [
            half + r * np.sin(theta) * np.cos(phi),
            half + r * np.sin(theta) * np.sin(phi),
            half + r * np.cos(theta),
        ],
        -1,
    )
    V = np.unique(np.clip(pts, 0, 2 * half - 1).astype(np.int64), axis=0)
    return np.unique(np.asarray(morton_encode(jnp.asarray(V), depth)))


def blob(seed, n, depth):
    """Dense volumetric blob: the 3DGS-voxelization structure class."""
    rng = np.random.default_rng(seed)
    half = 1 << (depth - 1)
    pts = rng.normal(half, half * 0.25, (n, 3))
    V = np.unique(np.clip(pts, 0, 2 * half - 1).astype(np.int64), axis=0)
    return np.unique(np.asarray(morton_encode(jnp.asarray(V), depth)))


def uniform(seed, n, depth):
    """Uniform random voxels: the incompressible worst case."""
    rng = np.random.default_rng(seed)
    hi = min(1 << (3 * depth), 1 << 62)
    return np.unique(rng.integers(0, hi, 2 * n, dtype=np.int64))[:n]


def _temporal_rows(name, depth, frames_vc):
    """One temporal-profile comparison row: legacy (1/2) vs ext3 (4/5)."""
    from raht3dgs_tpu.models.pipeline import prepare_voxel_frame
    from raht3dgs_tpu.ops.prelude import morton_codes_np
    from raht3dgs_tpu.ops.temporal import estimate_global_motion

    pf = [prepare_voxel_frame(V, C, depth) for V, C in frames_vc]
    codes_seq = [
        np.unique(morton_codes_np(np.floor(V).astype(np.int64), depth))
        for V, C in frames_vc
    ]
    tot = {k: 0 for k in ("i0", "i3", "t1", "t2", "t4", "t5")}
    nvox = sum(c.size for c in codes_seq[1:])
    for i in range(1, len(codes_seq)):
        prev, cur = codes_seq[i - 1], codes_seq[i]
        tot["i0"] += len(geometry.encode_geometry(cur, depth, ext3=False))
        tot["i3"] += len(geometry.encode_geometry(cur, depth, ext3=True))
        tot["t1"] += len(geometry.encode_geometry(cur, depth,
                                                  prev_codes=prev,
                                                  ext3=False))
        tot["t4"] += len(geometry.encode_geometry(cur, depth,
                                                  prev_codes=prev,
                                                  ext3=True))
        mv = np.asarray(estimate_global_motion(
            pf[i].codes, pf[i].weights, pf[i - 1].codes,
            pf[i - 1].weights, depth,
        ))
        tot["t2"] += len(geometry.encode_geometry(
            cur, depth, prev_codes=prev, motion=mv, ext3=False))
        sec = geometry.encode_geometry(cur, depth, prev_codes=prev,
                                       motion=mv, ext3=True)
        back = geometry.decode_geometry(sec, depth, cur.size,
                                        dtype=cur.dtype, prev_codes=prev)
        assert np.array_equal(back, cur)
        tot["t5"] += len(sec)
    cells = " | ".join(f"{tot[k] * 8 / nvox:.3f}"
                       for k in ("i0", "i3", "t1", "t4", "t2", "t5"))
    print(f"| {name} | {cells} |")


def temporal_table():
    """Temporal profiles on the deforming-shell AND body-walk sequences:
    legacy (0/1/2) vs ext3 (3/4/5) — the docs/geometry.md numbers."""
    from raht3dgs_tpu.eval.synth import (synthetic_body_scan,
                                         synthetic_color_sequence)

    print("| sequence | intra p0 | intra p3 | temporal p1 | p4 | "
          "+motion p2 | p5 |")
    print("|---|---|---|---|---|---|---|")
    for depth in (8, 9):
        frames = synthetic_color_sequence(depth=depth, seed=0, n_frames=6)
        _temporal_rows(f"shell J={depth}", depth, frames)
    for depth in (8, 10):
        frames = synthetic_body_scan(depth=depth, seed=0, n_frames=4)
        _temporal_rows(f"body J={depth}", depth, frames)


def body(depth):
    from raht3dgs_tpu.eval.synth import synthetic_body_scan

    V = synthetic_body_scan(depth=depth, seed=0, n_frames=1)[0][0]
    return geometry.codes_from_positions(V, depth)


def main():
    print(f"native backend: {geometry.native_available()}")
    cases = [
        ("body J=10", body(10)),
        ("body J=11", body(11)),
        ("shell J=10", shell(7, 600000, 10)),
        ("shell J=12", shell(7, 600000, 12)),
        ("blob J=10", blob(7, 600000, 10)),
        ("blob J=8", blob(7, 600000, 8)),
        ("uniform J=10", uniform(7, 200000, 10)),
    ]
    print("| workload | voxels | b/v p0 | b/v p3 (ext3) | occupancy b/v | "
          "raw b/v | p3 enc Mpts/s | p3 dec Mpts/s |")
    print("|---|---|---|---|---|---|---|---|")
    for name, codes in cases:
        depth = int(name.split("J=")[1])
        occ = octree_serialize(codes, depth)
        sec0 = geometry.encode_geometry(codes, depth, ext3=False)
        t0 = time.perf_counter()
        sec = geometry.encode_geometry(codes, depth, ext3=True)
        t1 = time.perf_counter()
        back = geometry.decode_geometry(sec, depth, codes.size,
                                        dtype=codes.dtype)
        t2 = time.perf_counter()
        assert np.array_equal(back, codes)
        n = codes.size
        print(
            f"| {name} | {n} | {len(sec0) * 8 / n:.2f} | "
            f"{len(sec) * 8 / n:.2f} | "
            f"{occ.size * 8 / n:.2f} | {3 * depth} | "
            f"{n / (t1 - t0) / 1e6:.1f} | {n / (t2 - t1) / 1e6:.1f} |"
        )
    print()
    temporal_table()


if __name__ == "__main__":
    main()
