"""Rasterizer timing on the default platform (TPU) — per-view wall time.

Scales N gradually with a fetch at each size (tunnel etiquette); burst
timing with last-only fetch as in bench.py.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import os

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from raht3dgs_tpu.eval.rasterize import (
    _colors_to_sh,
    _rasterize_tiled,
    auto_tile_budget,
)

# max_tiles_per_gauss: an int, or "auto" to probe per scene/view
MTPG = os.environ.get("RAHT3DGS_RASTER_MTPG", "16")

SIZE = 512


SCALE_LO = float(os.environ.get("RAHT3DGS_RASTER_SCALE_LO", 0.002))
SCALE_HI = float(os.environ.get("RAHT3DGS_RASTER_SCALE_HI", 0.02))


def scene(rng, n, sh_k=16):
    means = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(SCALE_LO, SCALE_HI, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 1.0, size=(n,)).astype(np.float32)
    colors = rng.normal(0, 0.3, size=(n, sh_k * 3)).astype(np.float32)
    return means, quats, scales, opac, colors


def main():
    rng = np.random.default_rng(0)
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[2, 3] = 3.0
    K = np.array(
        [[1.2 * SIZE, 0, SIZE / 2], [0, 1.2 * SIZE, SIZE / 2], [0, 0, 1]],
        np.float32,
    )
    vm = jnp.asarray(viewmat)
    Km = jnp.asarray(K)
    bg = jnp.ones((3,), jnp.float32)

    for n in (16384, 131072, 524288):
        means, quats, scales, opac, colors = scene(rng, n)
        sh, deg = _colors_to_sh(jnp.asarray(colors))
        args = (
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), sh, vm, Km, bg,
        )
        if MTPG == "auto":
            mtpg = auto_tile_budget(means, quats, scales, opac, viewmat, K,
                                    width=SIZE, height=SIZE, tile=16)
        else:
            mtpg = int(MTPG)
        compact = None
        # same gate as rasterize_gaussians: compaction widths are sized by
        # the post-CULL probe, so timing it with the cull disabled would
        # measure a program that drops contributing entries
        if (os.environ.get("RAHT3DGS_RASTER_COMPACT", "1") not in ("", "0")
                and os.environ.get("RAHT3DGS_RASTER_CULL", "1")
                not in ("", "0")):
            from raht3dgs_tpu.eval.rasterize import _max_valid_cover

            need = int(_max_valid_cover(
                jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
                jnp.asarray(opac), vm, Km,
                width=SIZE, height=SIZE, tile=16, m=mtpg,
            ))
            c = 4
            while c < need:
                c *= 2
            if c < mtpg:
                compact = c
        kw = dict(width=SIZE, height=SIZE, sh_degree=deg, tile=16,
                  max_tiles_per_gauss=mtpg, max_per_tile=1024, chunk=128,
                  compact_tiles=compact)
        img, meta = _rasterize_tiled(*args, **kw)
        float(img[0, 0, 0])  # warm + fetch
        img, meta = _rasterize_tiled(*args, **kw)
        float(img[0, 0, 0])
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [_rasterize_tiled(*args, **kw) for _ in range(4)]
            float(outs[-1][0][0, 0, 0])
            times.append((time.perf_counter() - t0) / 4)
        print(json.dumps({
            "n": n, "max_tiles_per_gauss": mtpg, "compact_tiles": compact,
            "ms_per_view": round(min(times) * 1e3, 2),
            "dup_clipped": int(meta.dup_clipped),
            "tile_clipped": int(meta.tile_clipped),
        }), flush=True)


if __name__ == "__main__":
    main()
