"""Multi-chip rendering: evaluation views sharded over the device mesh.

The reference's render comparison rasterizes 50 views sequentially on one
GPU (``/root/reference/python/quality_eval.py:373-526``). Views are
independent, so on TPU they shard perfectly over a mesh axis: gaussians
are replicated (they are the same scene for every view), cameras shard,
and each device runs the identical single-view tiled program — zero
collectives on the hot path, linear speedup in the device count.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from functools import lru_cache

from raht3dgs_tpu.eval.rasterize import (
    RasterMeta,
    _colors_to_sh,
    _rasterize_tiled,
)


@lru_cache(maxsize=32)
def _sharded_render_program(mesh, axis, width, height, sh_degree, tile,
                            max_tiles_per_gauss, max_per_tile, chunk):
    """Build (once per static config) the jitted shard_map render program.

    A fresh closure per call would miss the jit cache and re-trace/compile
    every invocation — exactly what the multi-view speedup exists to avoid.
    """
    spec_rep = P()
    spec_v = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_rep,) * 6 + (spec_v, spec_v),
        out_specs=(spec_v, spec_v, spec_v),
        # the blend scan's zero-initialized carries are unvarying while the
        # per-device camera inputs vary over dp; vma checking would demand
        # explicit pcasts inside the (shared) single-view program
        check_vma=False,
    )
    def run(means_, quats_, scales_, opac_, sh_, bg_, vms_, Kms_):
        # scan over the local views: one copy of the rasterizer program
        # regardless of views-per-device (an unrolled loop would emit
        # ceil(V/ndev) copies of the sort+scan HLO)
        def one(_, cam):
            vm, Km = cam
            img, meta = _rasterize_tiled(
                means_, quats_, scales_, opac_, sh_, vm, Km, bg_,
                width=width, height=height, sh_degree=sh_degree, tile=tile,
                max_tiles_per_gauss=max_tiles_per_gauss,
                max_per_tile=max_per_tile, chunk=chunk,
            )
            return 0, (img, meta.dup_clipped, meta.tile_clipped)

        _, (imgs, dups, tiles) = jax.lax.scan(one, 0, (vms_, Kms_))
        return imgs, dups, tiles

    return jax.jit(run)


def render_views_sharded(
    means,
    quats,
    scales,
    opacities,
    colors,
    viewmats,
    Ks,
    width: int,
    height: int,
    sh_degree: Optional[int] = None,
    background: Optional[np.ndarray] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "dp",
    tile: int = 16,
    max_tiles_per_gauss: int = 32,
    max_per_tile: int = 1024,
    chunk: int = 128,
) -> Tuple[np.ndarray, RasterMeta]:
    """Render all views of one scene, views sharded over ``mesh[axis]``.

    Same per-view semantics as ``eval.rasterize.rasterize_gaussians``
    (images are bitwise products of the same program). ``viewmats`` (V,4,4)
    and ``Ks`` (V,3,3) shard; gaussian parameters replicate. V is padded up
    to a multiple of the axis size (padding views are rendered and
    discarded). Returns (images (V, H, W, 3), RasterMeta with per-view
    overflow counts, shape (V,) each).
    """
    if mesh is None:
        from raht3dgs_tpu.parallel.sharding import make_mesh

        mesh = make_mesh()
    ndev = mesh.shape[axis]
    sh, inferred = _colors_to_sh(jnp.asarray(colors))
    if sh_degree is None:
        sh_degree = inferred
    if background is None:
        background = np.ones((3,), np.float32)

    V = len(viewmats)
    V_pad = ((V + ndev - 1) // ndev) * ndev
    vms = np.asarray(viewmats, dtype=np.float32)
    Kms = np.asarray(Ks, dtype=np.float32)
    if V_pad != V:
        vms = np.concatenate([vms, np.repeat(vms[-1:], V_pad - V, axis=0)])
        Kms = np.concatenate([Kms, np.repeat(Kms[-1:], V_pad - V, axis=0)])

    run = _sharded_render_program(
        mesh, axis, width, height, sh_degree, tile, max_tiles_per_gauss,
        max_per_tile, chunk,
    )
    with mesh:
        imgs, dups, tiles = run(
            jnp.asarray(means, jnp.float32),
            jnp.asarray(quats, jnp.float32),
            jnp.asarray(scales, jnp.float32),
            jnp.asarray(opacities, jnp.float32).reshape(-1),
            sh.astype(jnp.float32),
            jnp.asarray(background, jnp.float32),
            jnp.asarray(vms),
            jnp.asarray(Kms),
        )
    return (
        np.asarray(imgs)[:V],
        RasterMeta(np.asarray(dups)[:V], np.asarray(tiles)[:V]),
    )
