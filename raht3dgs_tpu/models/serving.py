"""One-dispatch 3DGS serving: compressed stream -> scene -> rendered views.

The serving consumer of a 3DGS codec is a renderer (the reference's DEBUG
tail renders its reconstructions, ``/root/reference/python/encode_3dgs.py:
319-400``, one gsplat call per view). The TPU-native serving shape is ONE
compiled program per frame: dequantize + inverse RAHT + EWA rasterization
of ALL requested views (``lax.scan`` over cameras), so

- decoded attributes never leave the chip,
- each frame costs one host->device upload of the quantized channel
  matrix (int16 when representable — half the bytes of int32) and one
  dispatch, amortized over every view rendered from that frame,
- only the rendered images are fetched.

``serve_views_sharded`` runs the same program under ``shard_map`` with
views sharded over a mesh axis (scene decode is replicated per device —
the same work a single chip pays — and the view scan shrinks to V/ndev
per device; zero collectives).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from raht3dgs_tpu.eval.rasterize import _rasterize_tiled
from raht3dgs_tpu.models.pipeline import (
    _dequant_gather_device,
    _inverse_order_device,
)
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.raht_span import raht_inverse_span

__all__ = [
    "decode_scene_device",
    "decode_scene_device_predicted",
    "serve_frame",
    "serve_frame_predicted",
    "serve_views_sharded",
    "quantized_upload_array",
    "pack_quantized_upload",
    "upload_quantized",
    "build_inverse_order",
]

build_inverse_order = _inverse_order_device


# canonical definitions live beside the decode pipeline they serve
from raht3dgs_tpu.models.pipeline import (  # noqa: F401
    pack_quantized_upload,
    quantized_upload_array,
    upload_quantized,
)


def _scene_from_attrs(attrs, codes, weights, voxel_size, vmin, depth):
    means = (
        morton_decode(codes, depth).astype(jnp.float32) + 0.5
    ) * voxel_size + vmin[None, :]
    quats = attrs[:, 0:4]
    scales = jnp.maximum(attrs[:, 4:7], 1e-5)
    opac = jnp.clip(attrs[:, 7], 0.0, 1.0) * (weights > 0)
    colors = attrs[:, 8:].reshape(attrs.shape[0], -1, 3)
    return means, quats, scales, opac, colors


@partial(jax.jit, static_argnames=("depth", "quant_mode"))
def decode_scene_device(vals_T, inv, steps, codes, weights, voxel_size,
                        vmin, *, depth: int, quant_mode: str = "mid",
                        rec_delta=0.0):
    """Quantized channel matrix -> reconstructed 3DGS scene, on device.

    Channel layout is the 56-channel 3DGS packing (quats 0:4, scales 4:7,
    opacity 7, SH colors 8:) of the reference's
    ``read_compressed_3dgs_ply`` (``python/data_util.py:357-368``).
    ``quant_mode``/``rec_delta``: the stream's quantizer (FrameStream
    fields) — "deadzone" reconstructs at ``sign(q)*(|q|+delta)*step``.
    """
    coeffs = _dequant_gather_device(
        vals_T.astype(jnp.int32), inv, steps, jnp.float32, quant_mode,
        jnp.asarray(rec_delta, dtype=jnp.float32),
    )
    attrs = raht_inverse_span(coeffs, codes, weights, depth)
    return _scene_from_attrs(attrs, codes, weights, voxel_size, vmin, depth)


@partial(jax.jit, static_argnames=("depth", "quant_mode"))
def decode_scene_device_predicted(vals_T, inv, plan, predict_mask, steps,
                                  codes, weights, voxel_size, vmin, *,
                                  depth: int, quant_mode: str = "mid",
                                  rec_delta=0.12):
    """Predicted-RAHT stream -> 3DGS scene, on device.

    Runs the NON-NORMATIVE device closed loop
    (``ops/praht_device.praht_device_decode``) — reconstruction within
    float ulps of the frozen host decode, which is harmless here: the
    attributes feed the renderer and never enter a closed loop. ``plan``
    is the frame's :class:`ops.praht_device.PrahtDevicePlan`."""
    from raht3dgs_tpu.ops.praht_device import praht_device_decode

    sym = vals_T.astype(jnp.int32).T[inv]
    attrs = praht_device_decode(
        plan, codes, weights, sym, predict_mask, depth, steps,
        quant_mode=quant_mode, rec_delta=rec_delta, fdtype=jnp.float32,
    )
    return _scene_from_attrs(attrs, codes, weights, voxel_size, vmin, depth)


def _render_views(scene, viewmats, Ks, bg, *, width, height, sh_degree,
                  tile, max_tiles_per_gauss, max_per_tile, chunk):
    """Scan the single-view rasterizer over (V, 4, 4) cameras: one copy of
    the sort+blend HLO regardless of V."""
    means, quats, scales, opac, colors = scene

    def one(_, cam):
        vm, Km = cam
        img, meta = _rasterize_tiled(
            means, quats, scales, opac, colors, vm, Km, bg,
            width=width, height=height, sh_degree=sh_degree, tile=tile,
            max_tiles_per_gauss=max_tiles_per_gauss,
            max_per_tile=max_per_tile, chunk=chunk,
        )
        return 0, (img, meta.dup_clipped, meta.tile_clipped)

    _, (imgs, dups, tiles) = jax.lax.scan(one, 0, (viewmats, Ks))
    return imgs, dups, tiles


@partial(jax.jit, static_argnames=(
    "depth", "width", "height", "sh_degree", "tile", "max_tiles_per_gauss",
    "max_per_tile", "chunk", "image_dtype", "quant_mode"))
def serve_frame(vals_T, inv, steps, codes, weights, voxel_size, vmin,
                viewmats, Ks, bg, *, depth: int, width: int, height: int,
                sh_degree: int = 3, tile: int = 16,
                max_tiles_per_gauss: int = 16, max_per_tile: int = 8192,
                chunk: int = 128, image_dtype=jnp.float32,
                quant_mode: str = "mid", rec_delta=0.0):
    """The fused serving program: decode once, render all V views.

    Returns (images (V, H, W, 3), dup_clipped (V,), tile_clipped (V,)).

    ``image_dtype=jnp.uint8`` quantizes the images on device with the
    display/PNG convention (``clip(img, 0, 1) * 255`` — eval/render.py)
    so a serving fetch moves 1/4 of the bytes; keep the float32 default
    for evaluation (PSNR is defined on the float render).
    """
    scene = decode_scene_device(
        vals_T, inv, steps, codes, weights, voxel_size, vmin, depth=depth,
        quant_mode=quant_mode, rec_delta=rec_delta,
    )
    imgs, dups, tiles = _render_views(
        scene, viewmats, Ks, bg, width=width, height=height,
        sh_degree=sh_degree, tile=tile,
        max_tiles_per_gauss=max_tiles_per_gauss, max_per_tile=max_per_tile,
        chunk=chunk,
    )
    if image_dtype != jnp.float32:
        imgs = (jnp.clip(imgs, 0.0, 1.0) * 255.0).astype(image_dtype)
    return imgs, dups, tiles


@partial(jax.jit, static_argnames=(
    "depth", "width", "height", "sh_degree", "tile", "max_tiles_per_gauss",
    "max_per_tile", "chunk", "image_dtype", "quant_mode"))
def serve_frame_predicted(vals_T, inv, plan, predict_mask, steps, codes,
                          weights, voxel_size, vmin, viewmats, Ks, bg, *,
                          depth: int, width: int, height: int,
                          sh_degree: int = 3, tile: int = 16,
                          max_tiles_per_gauss: int = 16,
                          max_per_tile: int = 8192, chunk: int = 128,
                          image_dtype=jnp.float32, quant_mode: str = "mid",
                          rec_delta=0.12):
    """:func:`serve_frame` for predicted-RAHT streams (flags2 bit 1):
    the closed-loop decode runs on device (non-normative, serving-only —
    see :func:`decode_scene_device_predicted`), fused with the view scan
    in one program."""
    scene = decode_scene_device_predicted(
        vals_T, inv, plan, predict_mask, steps, codes, weights,
        voxel_size, vmin, depth=depth, quant_mode=quant_mode,
        rec_delta=rec_delta,
    )
    imgs, dups, tiles = _render_views(
        scene, viewmats, Ks, bg, width=width, height=height,
        sh_degree=sh_degree, tile=tile,
        max_tiles_per_gauss=max_tiles_per_gauss, max_per_tile=max_per_tile,
        chunk=chunk,
    )
    if image_dtype != jnp.float32:
        imgs = (jnp.clip(imgs, 0.0, 1.0) * 255.0).astype(image_dtype)
    return imgs, dups, tiles


@lru_cache(maxsize=16)
def _sharded_serve_program(mesh, axis, depth, width, height, sh_degree,
                           tile, max_tiles_per_gauss, max_per_tile, chunk,
                           image_dtype=jnp.float32, quant_mode="mid",
                           rec_delta=0.0):
    spec_rep = P()
    spec_v = P(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_rep,) * 7 + (spec_v, spec_v, spec_rep),
        out_specs=(spec_v, spec_v, spec_v),
        # per-device cameras vary over the axis while the replicated scene
        # does not; the shared single-view program would need explicit
        # pcasts under vma checking (same stance as parallel/render.py)
        check_vma=False,
    )
    def run(vals_T, inv, steps, codes, weights, voxel_size, vmin, vms, Kms,
            bg):
        scene = decode_scene_device(
            vals_T, inv, steps, codes, weights, voxel_size, vmin,
            depth=depth, quant_mode=quant_mode, rec_delta=rec_delta,
        )
        imgs, dups, tiles = _render_views(
            scene, vms, Kms, bg, width=width, height=height,
            sh_degree=sh_degree, tile=tile,
            max_tiles_per_gauss=max_tiles_per_gauss,
            max_per_tile=max_per_tile, chunk=chunk,
        )
        if image_dtype != jnp.float32:
            imgs = (jnp.clip(imgs, 0.0, 1.0) * 255.0).astype(image_dtype)
        return imgs, dups, tiles

    return jax.jit(run)


def serve_views_sharded(vals_T, inv, steps, codes, weights, voxel_size,
                        vmin, viewmats, Ks, bg=None, *, mesh, depth: int,
                        width: int, height: int, sh_degree: int = 3,
                        axis: str = "dp", tile: int = 16,
                        max_tiles_per_gauss: int = 16,
                        max_per_tile: int = 8192, chunk: int = 128,
                        image_dtype=jnp.float32, quant_mode: str = "mid",
                        rec_delta: float = 0.0):
    """Fused serving with views sharded over ``mesh[axis]``.

    V is padded to a multiple of the axis size (padding views rendered and
    discarded). Images match :func:`serve_frame` to ~1 ulp (it is a
    different XLA program, so fusion may differ in the last bit —
    ``tests/test_serving.py`` pins atol=1e-5), not bitwise."""
    ndev = mesh.shape[axis]
    V = len(viewmats)
    V_pad = ((V + ndev - 1) // ndev) * ndev
    vms = np.asarray(viewmats, dtype=np.float32)
    Kms = np.asarray(Ks, dtype=np.float32)
    if V_pad != V:
        vms = np.concatenate([vms, np.repeat(vms[-1:], V_pad - V, axis=0)])
        Kms = np.concatenate([Kms, np.repeat(Kms[-1:], V_pad - V, axis=0)])
    if bg is None:
        bg = jnp.ones((3,), jnp.float32)

    run = _sharded_serve_program(
        mesh, axis, depth, width, height, sh_degree, tile,
        max_tiles_per_gauss, max_per_tile, chunk, image_dtype,
        quant_mode, float(rec_delta),
    )
    with mesh:
        imgs, dups, tiles = run(
            jnp.asarray(vals_T), jnp.asarray(inv), jnp.asarray(steps),
            jnp.asarray(codes), jnp.asarray(weights),
            jnp.asarray(voxel_size, jnp.float32),
            jnp.asarray(vmin, jnp.float32), jnp.asarray(vms),
            jnp.asarray(Kms), jnp.asarray(bg, jnp.float32),
        )
    return imgs[:V], dups[:V], tiles[:V]
