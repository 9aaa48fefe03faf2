"""Rendering comparison for 3DGS quality evaluation.

Three backends:

1. ``gsplat`` full rasterization when available (CUDA-only — same optional
   dependency and graceful degradation contract as the reference,
   ``/root/reference/python/quality_eval.py:283-353,519-521``).
2. ``jax`` — the framework's own TPU-native volumetric 3DGS rasterizer
   (``eval/rasterize.py``): EWA projection, SH colors to degree 3, tiled
   front-to-back alpha compositing with gsplat-parity constants. The
   default on machines without CUDA, so render PSNR — the quality metric
   the reference can only compute on a CUDA GPU — runs everywhere.
3. A z-buffered JAX **point-splat preview renderer** (fast, approximate;
   kept for quick-look comparisons and as the last-resort fallback).
"""

from __future__ import annotations

import time
import warnings
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import ops as jops

from raht3dgs_tpu.eval.cameras import generate_random_cameras
from raht3dgs_tpu.eval.metrics import image_psnr

SH_C0 = 0.28209479177387814  # Y_00 normalization (standard 3DGS color mapping)


@partial(jax.jit, static_argnames=("width", "height"))
def _point_render_device(means, colors_dc, opacities, viewmat, K, width, height):
    """Z-buffered point splat: nearest Gaussian wins each pixel."""
    n = means.shape[0]
    ones = jnp.ones((n, 1), dtype=means.dtype)
    cam = jnp.concatenate([means, ones], axis=1) @ viewmat.T  # (N,4)
    z = cam[:, 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    uvw = cam[:, :3] @ K.T
    # floor (not int cast): truncation would pull points in (-1, 0) onto
    # the first row/column
    u = jnp.floor(uvw[:, 0] / zs).astype(jnp.int32)
    v = jnp.floor(uvw[:, 1] / zs).astype(jnp.int32)
    inside = valid & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    inside &= opacities > 0.01
    pix = jnp.where(inside, v * width + u, width * height)  # overflow bin

    big = jnp.asarray(jnp.inf, dtype=means.dtype)
    zkey = jnp.where(inside, z, big)
    zmin = jops.segment_min(zkey, pix, num_segments=width * height + 1)
    winner = inside & (zkey <= zmin[pix])

    rgb = jnp.clip(0.5 + SH_C0 * colors_dc, 0.0, 1.0)
    img = jnp.ones((width * height + 1, 3), dtype=means.dtype)  # white bg
    img = img.at[jnp.where(winner, pix, width * height)].set(
        jnp.where(winner[:, None], rgb, 1.0)
    )
    return img[: width * height].reshape(height, width, 3)


def point_render(params: Dict[str, np.ndarray], viewmats, Ks, width, height):
    """Render all views with the preview renderer. colors: (N, C) SH with DC
    in the first 3 channels."""
    means = jnp.asarray(params["means"], dtype=jnp.float32)
    dc = jnp.asarray(np.asarray(params["colors"])[:, :3], dtype=jnp.float32)
    opac = jnp.asarray(params["opacities"], dtype=jnp.float32).reshape(-1)
    out = []
    for i in range(len(viewmats)):
        img = _point_render_device(
            means, dc, opac,
            jnp.asarray(viewmats[i], dtype=jnp.float32),
            jnp.asarray(Ks[i], dtype=jnp.float32),
            width, height,
        )
        out.append(np.asarray(img))
    return np.stack(out)


def volumetric_render(
    params: Dict[str, np.ndarray], viewmats, Ks, width, height,
    max_retries: int = 2,
):
    """Render all views with the TPU-native volumetric rasterizer.

    Returns images (V, H, W, 3). Views whose capacity limits overflow
    (footprint or per-tile entries dropped) are automatically re-rendered
    with 4x the overflowing capacity, up to ``max_retries`` times (each
    retry compiles one new program per distinct capacity, cached after
    that); a warning is raised only if overflow persists."""
    from raht3dgs_tpu.eval.rasterize import rasterize_gaussians

    out = []
    dup_clipped = 0
    tile_clipped = 0
    for i in range(len(viewmats)):
        caps = dict(max_tiles_per_gauss=32, max_per_tile=1024)
        for attempt in range(max_retries + 1):
            img, meta = rasterize_gaussians(
                params["means"],
                params["quats"],
                params["scales"],
                np.asarray(params["opacities"]).reshape(-1),
                params["colors"],
                viewmats[i],
                Ks[i],
                width,
                height,
                **caps,
            )
            dup, tile = int(meta.dup_clipped), int(meta.tile_clipped)
            if (not dup and not tile) or attempt == max_retries:
                break
            if dup:
                caps["max_tiles_per_gauss"] *= 4
            if tile:
                caps["max_per_tile"] *= 4
        dup_clipped += dup
        tile_clipped += tile
        out.append(np.asarray(img))
    if dup_clipped or tile_clipped:
        warnings.warn(
            f"rasterizer capacity overflow after retries: {dup_clipped} "
            f"footprint entries, {tile_clipped} tile entries dropped — raise "
            "max_tiles_per_gauss/max_per_tile for exact images"
        )
    return np.stack(out)


def _try_gsplat_render(params, viewmats, Ks, width, height):
    import gsplat  # noqa: F401  (optional CUDA dependency)
    import torch

    dev = "cuda"
    means = torch.as_tensor(params["means"], dtype=torch.float32, device=dev)
    quats = torch.as_tensor(params["quats"], dtype=torch.float32, device=dev)
    scales = torch.as_tensor(params["scales"], dtype=torch.float32, device=dev)
    opac = torch.as_tensor(params["opacities"], dtype=torch.float32, device=dev).reshape(-1)
    colors = torch.as_tensor(params["colors"], dtype=torch.float32, device=dev)
    K_sh = colors.shape[1] // 3
    sh_degree = int(np.sqrt(K_sh) - 1) if colors.shape[1] % 3 == 0 else None
    colors_r = colors.reshape(-1, K_sh, 3)
    imgs = []
    for i in range(len(viewmats)):
        renders, _, _ = gsplat.rasterization(
            means=means,
            quats=quats / quats.norm(dim=-1, keepdim=True),
            scales=scales,
            opacities=opac,
            colors=colors_r,
            viewmats=torch.as_tensor(viewmats[i : i + 1], dtype=torch.float32, device=dev),
            Ks=torch.as_tensor(Ks[i : i + 1], dtype=torch.float32, device=dev),
            width=width,
            height=height,
            sh_degree=sh_degree,
            packed=False,
            backgrounds=torch.ones((1, 3), device=dev),
        )
        imgs.append(renders[0].detach().cpu().numpy())
    return np.stack(imgs)


def render_comparison(
    original: Dict[str, np.ndarray],
    reconstructed: Dict[str, np.ndarray],
    n_views: int = 5,
    image_size: int = 512,
    seed: int = 0,
    output_dir: Optional[str] = None,
    backend: str = "auto",
) -> Dict[str, object]:
    """Render both scenes from shared random views and report PSNR stats
    (reference ``try_render_comparison``, ``quality_eval.py:373-526``).

    backend: 'auto' (gsplat if importable, else the TPU-native volumetric
    rasterizer), 'gsplat', 'jax', 'preview', or 'none'.
    """
    if backend == "none":
        return {}
    if backend not in ("auto", "gsplat", "jax", "preview"):
        raise ValueError(
            f"unknown render backend {backend!r} "
            "(choose auto/gsplat/jax/preview/none)"
        )
    means = np.asarray(original["means"])
    center = means.mean(axis=0)
    radius = float((means.max(axis=0) - means.min(axis=0)).max()) * 1.5
    viewmats, Ks, W, H = generate_random_cameras(
        center, radius, n_views, image_size, image_size, seed=seed
    )

    use = backend
    if backend in ("auto", "gsplat"):
        try:
            t0 = time.perf_counter()
            imgs_o = _try_gsplat_render(original, viewmats, Ks, W, H)
            t_orig = time.perf_counter() - t0
            t0 = time.perf_counter()
            imgs_r = _try_gsplat_render(reconstructed, viewmats, Ks, W, H)
            t_rec = time.perf_counter() - t0
            use = "gsplat"
        except Exception as e:
            if backend == "gsplat":
                warnings.warn(f"gsplat rendering unavailable: {e}")
                return {}
            use = "jax"
    if use == "jax":
        t0 = time.perf_counter()
        imgs_o = volumetric_render(original, viewmats, Ks, W, H)
        t_orig = time.perf_counter() - t0
        t0 = time.perf_counter()
        imgs_r = volumetric_render(reconstructed, viewmats, Ks, W, H)
        t_rec = time.perf_counter() - t0
    if use == "preview":
        t0 = time.perf_counter()
        imgs_o = point_render(original, viewmats, Ks, W, H)
        t_orig = time.perf_counter() - t0
        t0 = time.perf_counter()
        imgs_r = point_render(reconstructed, viewmats, Ks, W, H)
        t_rec = time.perf_counter() - t0

    psnrs = [image_psnr(imgs_o[i], imgs_r[i]) for i in range(n_views)]
    if output_dir is not None:
        _save_views(output_dir, imgs_o, imgs_r)
    finite = [p for p in psnrs if np.isfinite(p)]
    return {
        "backend": use,
        "psnr_per_view": psnrs,
        "psnr_avg": float(np.mean(finite)) if finite else float("inf"),
        "psnr_std": float(np.std(finite)) if finite else 0.0,
        "psnr_min": float(np.min(psnrs)),
        "psnr_max": float(np.max(psnrs)),
        "original_render_time_ms": t_orig * 1000,
        "merged_render_time_ms": t_rec * 1000,
    }


def _save_views(output_dir, imgs_o, imgs_r):
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        warnings.warn("PIL unavailable; skipping image dumps")
        return
    from pathlib import Path

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(len(imgs_o)):
        a = (np.clip(imgs_o[i], 0, 1) * 255).astype(np.uint8)
        b = (np.clip(imgs_r[i], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(a).save(out / f"view_{i:03d}_original.png")
        Image.fromarray(b).save(out / f"view_{i:03d}_merged.png")
        Image.fromarray(np.concatenate([a, b], axis=1)).save(
            out / f"view_{i:03d}_comparison.png"
        )
