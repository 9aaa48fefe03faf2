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


def main():
    print(f"native backend: {geometry.native_available()}")
    rows = []
    cases = [
        ("shell J=10", shell(7, 600000, 10)),
        ("shell J=12", shell(7, 600000, 12)),
        ("blob J=10", blob(7, 600000, 10)),
        ("blob J=8", blob(7, 600000, 8)),
        ("uniform J=10", uniform(7, 200000, 10)),
    ]
    print("| workload | voxels | coded b/v | occupancy b/v | raw b/v | "
          "enc Mpts/s | dec Mpts/s |")
    print("|---|---|---|---|---|---|---|")
    for name, codes in cases:
        depth = int(name.split("J=")[1])
        occ = octree_serialize(codes, depth)
        t0 = time.perf_counter()
        sec = geometry.encode_geometry(codes, depth)
        t1 = time.perf_counter()
        back = geometry.decode_geometry(sec, depth, codes.size,
                                        dtype=codes.dtype)
        t2 = time.perf_counter()
        assert np.array_equal(back, codes)
        n = codes.size
        rows.append(name)
        print(
            f"| {name} | {n} | {len(sec) * 8 / n:.2f} | "
            f"{occ.size * 8 / n:.2f} | {3 * depth} | "
            f"{n / (t1 - t0) / 1e6:.1f} | {n / (t2 - t1) / 1e6:.1f} |"
        )


if __name__ == "__main__":
    main()
