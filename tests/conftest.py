"""Test configuration: run everything on an 8-device virtual CPU mesh.

Must set platform flags before jax initializes its backends (pytest imports
conftest before any test module, so this is the earliest reliable hook).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU-tunnel PJRT plugin and pins
# JAX_PLATFORMS before conftest runs; jax.config wins over both.
jax.config.update("jax_platforms", "cpu")
# the CPU-only cache partition: /root/.jax_cache holds the TPU programs
# (precious — tunnel compiles are slow) but also accumulated XLA:CPU AOT
# entries compiled on OTHER machines, which load with feature-mismatch
# warnings and can run 4x slow or SIGILL (bench.py partitions the same
# way; see its docstring for the round-1 incident)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_cloud(rng, n, depth, d_attr=3, dup_frac=0.0):
    """Random float point cloud in [0, 2^depth)^3 with d_attr attributes."""
    pts = rng.uniform(0, 2**depth, size=(n, 3))
    if dup_frac > 0:
        ndup = int(n * dup_frac)
        idx = rng.integers(0, n, size=ndup)
        pts[:ndup] = pts[idx] + rng.uniform(0, 0.4, size=(ndup, 3))
    attrs = rng.uniform(0, 255, size=(n, d_attr))
    return np.concatenate([pts, attrs], axis=1)


def unique_voxel_cloud(rng, n, depth, d_attr=3):
    """Integer voxel grid positions with unique Morton codes, Morton-sorted."""
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    pts = rng.integers(0, 2**depth, size=(2 * n, 3))
    codes = morton_codes_np(pts, depth)
    _, first = np.unique(codes, return_index=True)
    first = first[:n]
    pts = pts[first]
    codes = codes[first]
    order = np.argsort(codes)
    attrs = rng.uniform(0, 255, size=(len(order), d_attr))
    return pts[order].astype(np.float64), codes[order], attrs
