"""gs voxelize+merge (the #24 workload's device step) on the TPU.

Burst timing with last-only fetch; N gaussians with 48 SH color channels
(the full 56-attribute layout minus the derived ones the merge produces).
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from raht3dgs_tpu.models.gs_voxelize import _voxelize_merge_device

DEPTH = 10


def main():
    rng = np.random.default_rng(0)
    for n in (131072, 524288, 1048576):
        means = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
        quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        scales = jnp.asarray(rng.uniform(0.001, 0.01, (n, 3)).astype(np.float32))
        opac = jnp.asarray(rng.uniform(0.2, 1.0, (n,)).astype(np.float32))
        colors = jnp.asarray(rng.normal(0, 0.3, (n, 48)).astype(np.float32))

        step = jax.jit(_voxelize_merge_device, static_argnames=("depth",))
        outs = step(means, quats, scales, opac, colors, DEPTH)
        nvox = int(outs[6])
        float(outs[1][0, 0])
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            rs = [step(means, quats, scales, opac, colors, DEPTH)
                  for _ in range(4)]
            float(rs[-1][1][0, 0])
            times.append((time.perf_counter() - t0) / 4)
        best = min(times)
        print(json.dumps({
            "n": n, "nvox": nvox, "ms": round(best * 1e3, 1),
            "mgauss_per_s": round(n / best / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
