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
    "serve_sequence",
    "serve_tiled_frame",
    "serve_views_sharded",
    "visible_bricks",
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


def _padded_frame_np(Vt, depth: int, P: int):
    """Sorted real Morton codes + ``pad_code`` sentinels and 0/1 weights
    for ``P`` slots, in PURE numpy.

    Matches ``prepare_voxel_frame``'s layout (models/pipeline.py:134-152,
    pad slots ``arange(n, P)``) without dispatching device programs —
    through a remote tunnel those cost several round trips per call
    (~200 ms each, measured; this is a few ms). Sentinels are built IN
    the code dtype: adding a Python ``1 << 63`` to an int64 arange would
    promote/overflow (CLAUDE.md uint64-sentinel invariant)."""
    from raht3dgs_tpu.ops.morton import code_dtype, internal_payload_bits
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    cdt = np.dtype(code_dtype(depth, P))
    codes_t = np.sort(morton_codes_np(np.asarray(Vt, np.int64), depth))
    n_t = len(codes_t)
    pads = np.arange(n_t, P, dtype=np.int64).astype(cdt)
    pads += cdt.type(1 << internal_payload_bits(depth, P))
    codes_p = np.concatenate([codes_t.astype(cdt), pads])
    w_p = np.zeros(P, dtype=np.float32)
    w_p[:n_t] = 1.0
    return codes_p, w_p


# ---------------------------------------------------------------------------
# Tiled serving: frustum-culled brick decode (.r3tt -> only-visible scene)

@partial(jax.jit, static_argnames=(
    "width", "height", "sh_degree", "tile", "max_tiles_per_gauss",
    "max_per_tile", "chunk", "image_dtype"))
def _render_scene_views(scene, viewmats, Ks, bg, *, width, height,
                        sh_degree=3, tile=16, max_tiles_per_gauss=16,
                        max_per_tile=8192, chunk=128,
                        image_dtype=jnp.float32):
    """One dispatch: render V views of an already-on-device scene."""
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
def _sharded_scene_render_program(mesh, axis, width, height, sh_degree,
                                  tile, max_tiles_per_gauss, max_per_tile,
                                  chunk, image_dtype):
    """Render an already-decoded scene with views sharded over
    ``mesh[axis]`` — scene replicated per device, zero collectives (the
    ``serve_views_sharded`` stance, but starting from scene arrays so the
    tiled multi-brick decode's output can feed it directly)."""
    rep, sv = P(), P(axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=(rep, sv, sv, rep),
             out_specs=(sv, sv, sv), check_vma=False)
    def run(scene, vms, Kms, bg):
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


def visible_bricks(reader, viewmats, Ks, width, height, *,
                   voxel_size=None, vmin=None, near=1e-6,
                   margin=0.0):
    """Conservative frustum cull over a tiled frame's bricks.

    Returns the ascending tile indices whose world-space bounding box
    (brick voxel extent scaled by the frame's ``voxel_size``/``vmin``
    metadata, widened by ``margin`` world units on every side) projects
    into at least one view's image rectangle. ``margin`` exists because
    a brick's GAUSSIANS spill past its voxel box — pass ~3x the largest
    expected splat scale for renders that exactly match an uncculled
    decode; the default 0 culls on voxel extents alone (a preview-grade
    bound). A box straddling the camera plane is kept (no cheap exact
    2D bound exists there), so the cull is always conservative."""

    meta = reader.meta
    if voxel_size is None:
        voxel_size = float(meta.width) / (1 << reader.depth)
    if vmin is None:
        vmin = np.asarray(meta.vmin, dtype=np.float64)
    vms = np.asarray(viewmats, dtype=np.float64)
    Kms = np.asarray(Ks, dtype=np.float64)
    # all brick boxes in one numpy pass — brick_box() dispatches a device
    # morton_decode per key, which through a remote tunnel costs an RTT
    # PER BRICK (53 bricks ~ 1.3 s, measured)
    keys = np.asarray(reader.keys, dtype=np.int64)
    bd = reader.brick_depth
    bxyz = np.zeros((len(keys), 3), dtype=np.int64)
    for b in range(bd):
        bxyz[:, 2] |= ((keys >> (3 * b)) & 1) << b
        bxyz[:, 1] |= ((keys >> (3 * b + 1)) & 1) << b
        bxyz[:, 0] |= ((keys >> (3 * b + 2)) & 1) << b
    side = 1 << (reader.depth - bd)
    los = bxyz * side
    sel = []
    for j in range(len(keys)):
        lo, hi = los[j], los[j] + side
        c0 = lo * voxel_size + vmin - margin
        c1 = hi * voxel_size + vmin + margin
        corners = np.array([
            [c0[0], c0[1], c0[2]], [c1[0], c0[1], c0[2]],
            [c0[0], c1[1], c0[2]], [c1[0], c1[1], c0[2]],
            [c0[0], c0[1], c1[2]], [c1[0], c0[1], c1[2]],
            [c0[0], c1[1], c1[2]], [c1[0], c1[1], c1[2]],
        ])
        vis = False
        for w2c, K in zip(vms, Kms):
            pc = corners @ w2c[:3, :3].T + w2c[:3, 3]
            z = pc[:, 2]
            if np.all(z <= near):
                continue  # entirely behind the camera
            if np.any(z <= near):
                vis = True  # straddles the camera plane: keep
                break
            u = K[0, 0] * pc[:, 0] / z + K[0, 2]
            v = K[1, 1] * pc[:, 1] / z + K[1, 2]
            if (u.max() >= 0 and u.min() < width
                    and v.max() >= 0 and v.min() < height):
                vis = True
                break
        if vis:
            sel.append(j)
    return sel


@partial(jax.jit, static_argnames=("depth", "parts", "predicted",
                                   "order_mode", "quant_mode"))
def _decode_bricks_device(vals_flat, codes_flat, weights_flat, nvox_K,
                          steps, voxel_size, vmin, pmask_K=None, *,
                          depth: int, parts: tuple,
                          predicted: tuple = None,
                          order_mode: str = "ragft",
                          quant_mode: str = "mid", rec_delta=0.0):
    """Ragged-concatenated brick symbols -> one concatenated scene, in
    ONE program: per-brick inverse stream order, dequant, inverse RAHT
    and scene build, so a K-brick serve costs one upload + one dispatch
    instead of K round trips (through a remote tunnel the K transfers
    dominate the wall — scripts/exp_serving_tiled.py). ``parts`` is the
    static tuple of per-brick padded lengths; ``vals_flat`` is
    (D, sum(parts)), codes/weights are flat (sum(parts),) — each brick
    padded only to its own bucket multiple, so the WIRE carries ~real
    bytes (a shared max-brick pad inflated the upload 2.8x, measured).
    Padding slots have weight 0 -> opacity 0, so concatenation order
    stays global Morton order over the REAL voxels.

    The brick axis is UNROLLED, not vmapped: each brick's subgraph keeps
    the single-frame shapes XLA lowers well (batched gather/scan dims
    measured ~3x/point on the inverse — docs/roadmap.md). The program
    recompiles only when ``parts`` changes; bucket rounding keeps that
    signature stable across nearby camera selections.

    ``predicted`` (static, per brick) switches a brick's subgraph to the
    NON-NORMATIVE device predicted-RAHT loop (``ops/praht_device.py``) on
    its residual symbols, with ``pmask_K[k]`` the brick's signalled
    per-depth mask — the same serving carve-out ``serve_frame_predicted``
    uses (attributes feed the renderer only; f32-ulp drift from the
    frozen host loop is harmless and nothing here re-enters a closed
    loop)."""

    def one(vals_T, codes, weights, nv, pred_static, pmask):
        inv = _inverse_order_device(codes, weights, nv, depth, order_mode)
        if pred_static:
            from raht3dgs_tpu.ops.praht_device import (
                praht_device_decode,
                praht_device_plan,
            )
            from raht3dgs_tpu.ops.raht_span import raht_structure_span

            structure = raht_structure_span(codes, weights, depth)
            plan = praht_device_plan(codes, weights, depth,
                                     structure.drop_level,
                                     structure.subtree_w)
            attrs = praht_device_decode(
                plan, codes, weights, vals_T.astype(jnp.int32).T[inv],
                pmask, depth, steps, quant_mode=quant_mode,
                rec_delta=rec_delta, fdtype=jnp.float32,
            )
        else:
            coeffs = _dequant_gather_device(
                vals_T.astype(jnp.int32), inv, steps, jnp.float32,
                quant_mode, jnp.asarray(rec_delta, dtype=jnp.float32),
            )
            attrs = raht_inverse_span(coeffs, codes, weights, depth)
        return _scene_from_attrs(attrs, codes, weights, voxel_size, vmin,
                                 depth)

    if predicted is None:
        predicted = (False,) * len(parts)
    outs, off = [], 0
    for k, Pk in enumerate(parts):
        sl = slice(off, off + Pk)
        outs.append(one(vals_flat[:, sl], codes_flat[sl],
                        weights_flat[sl], nvox_K[k], predicted[k],
                        None if pmask_K is None else pmask_K[k]))
        off += Pk
    return tuple(
        jnp.concatenate([p[f] for p in outs], axis=0) for f in range(5))


def serve_tiled_frame(data, viewmats, Ks, bg=None, *, width, height,
                      positions=None, bricks=None, bucket=1 << 10,
                      margin=0.0, mesh=None, axis="dp", sh_degree=3,
                      tile=16, max_tiles_per_gauss=16, max_per_tile=8192,
                      chunk=128, image_dtype=jnp.float32):
    """Serve views straight from an ``.r3tt`` tiled 3DGS frame, decoding
    ONLY the bricks the cameras can see.

    The tiled container is what makes this O(visible) instead of
    O(frame): :func:`visible_bricks` culls brick boxes against the view
    frustums (``margin`` widens them — see its docstring), each
    surviving brick's standard FrameStream is entropy-decoded on host
    and inverse-transformed on device (per-brick programs bucket to
    shared shapes, so compiles amortize across bricks and frames), the
    per-brick scenes concatenate on device in key order — global Morton
    order, the same depth-sort tie order a monolithic decode yields —
    and ONE render dispatch scans all views. Pass ``bricks`` to override
    the cull (e.g. an ROI selection from ``TiledReader.select_roi``).
    Predicted-RAHT bricks (``encode_ply --tiles --predict``) decode
    through the non-normative device praht loop per brick, each with its
    own signalled mask — display decode only, pinned against the
    normative host loop in ``tests/test_serving.py``.

    ``mesh``/``axis`` shard the view render over ``mesh[axis]`` (brick
    decode + concatenated scene replicated per device, zero collectives
    — the ``serve_sequence(mesh=)`` stance); V pads to a multiple of the
    axis size, padding views rendered and dropped.

    Returns ``(images (V, H, W, 3), dup_clipped (V,), tile_clipped (V,),
    selected_brick_indices)``.
    """
    from raht3dgs_tpu.codec.geometry import positions_from_geometry
    from raht3dgs_tpu.models.pipeline import decode_entropy_channels
    from raht3dgs_tpu.models.tiling import TiledReader, brick_keys_np
    from raht3dgs_tpu.ops.morton import code_dtype
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    reader = data if isinstance(data, TiledReader) else TiledReader(data)
    depth = reader.depth
    meta = reader.meta
    voxel_size = float(meta.width) / (1 << depth)
    vmin = np.asarray(meta.vmin, dtype=np.float64)
    if bg is None:
        bg = jnp.ones((3,), jnp.float32)
    sel = (list(bricks) if bricks is not None else visible_bricks(
        reader, viewmats, Ks, width, height, voxel_size=voxel_size,
        vmin=vmin, margin=margin))
    if not sel:
        raise ValueError("no brick is visible from the requested views")

    by_brick = None
    if positions is None and reader.geometry is not None:
        positions = positions_from_geometry(
            reader.geometry, depth, reader.n_voxels)
    if positions is not None:
        positions = np.asarray(positions)
        codes = morton_codes_np(positions.astype(np.int64), depth)
        order = np.argsort(codes, kind="stable")
        keys = brick_keys_np(codes[order], depth, reader.brick_depth)
        starts = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]]))
        ends = np.concatenate([starts[1:], [len(keys)]])
        by_brick = {
            int(keys[s]): positions[order[s:e]]
            for s, e in zip(starts, ends)
        }

    # host pass: resolve each surviving brick's stream + positions
    host = []
    for i in sorted(sel):
        stream = reader.tile(i)
        if stream.geometry is not None:
            Vt = positions_from_geometry(stream.geometry, depth,
                                         stream.n_voxels)
        elif by_brick is not None:
            Vt = by_brick[int(reader.keys[i])]
        else:
            raise ValueError(
                "tiles carry no geometry; pass the frame's positions")
        if len(Vt) != stream.n_voxels:
            raise ValueError(
                f"brick {i}: {len(Vt)} positions != {stream.n_voxels} "
                "coded voxels")
        host.append((stream, np.asarray(Vt, dtype=np.int64)))

    stream0 = host[0][0]
    D = stream0.n_channels
    for st, _ in host[1:]:
        if (st.order_mode, st.quant_mode, st.rec_delta, st.n_channels,
                tuple(np.atleast_1d(st.steps))) != (
                stream0.order_mode, stream0.quant_mode, stream0.rec_delta,
                stream0.n_channels, tuple(np.atleast_1d(stream0.steps))):
            raise ValueError(
                "bricks disagree on codec parameters; serve_tiled_frame "
                "stacks them into one program and needs uniform "
                "order/quant/steps (v2 containers guarantee this)")
    # ragged per-brick padding: each brick rounds up to its own bucket
    # multiple, so the one stacked upload carries ~real bytes
    # (_padded_frame_np: pure-numpy prelude, no per-brick device RTTs)
    parts = tuple(
        -((-max(len(v), 1)) // bucket) * bucket for _, v in host)
    codes_K, weights_K, nvox_K, vals_K = [], [], [], []
    for (stream, Vt), Pk in zip(host, parts):
        codes_p, w_p = _padded_frame_np(Vt, depth, Pk)
        vals_T = np.zeros((D, Pk), dtype=np.int32)
        decode_entropy_channels(stream, stream.n_voxels, vals_T)
        codes_K.append(codes_p.astype(np.int64))
        weights_K.append(w_p)
        nvox_K.append(stream.n_voxels)
        vals_K.append(vals_T)

    steps = jnp.asarray(
        np.atleast_1d(np.asarray(stream0.steps, dtype=np.float32)))
    cdt_all = np.dtype(code_dtype(depth, max(parts)))
    # predicted bricks (``--tiles --predict``) run the non-normative
    # device praht loop per brick; masks are per-brick signalled values
    predicted = tuple(bool(st.predict) for st, _ in host)
    pmask_K = jnp.asarray(
        np.asarray([st.predict_mask or 0 for st, _ in host],
                   dtype=np.uint32))
    scene = _decode_bricks_device(
        upload_quantized(pack_quantized_upload(
            np.concatenate(vals_K, axis=1))),
        jnp.asarray(np.concatenate(codes_K).astype(cdt_all)),
        jnp.asarray(np.concatenate(weights_K)),
        jnp.asarray(np.asarray(nvox_K, dtype=np.int32)), steps,
        jnp.float32(voxel_size), jnp.asarray(vmin, jnp.float32), pmask_K,
        depth=depth, parts=parts, predicted=predicted,
        order_mode=stream0.order_mode,
        quant_mode=stream0.quant_mode, rec_delta=stream0.rec_delta,
    )
    if mesh is None:
        imgs, dups, tiles = _render_scene_views(
            scene, jnp.asarray(viewmats, jnp.float32),
            jnp.asarray(Ks, jnp.float32), jnp.asarray(bg, jnp.float32),
            width=width, height=height, sh_degree=sh_degree, tile=tile,
            max_tiles_per_gauss=max_tiles_per_gauss,
            max_per_tile=max_per_tile, chunk=chunk,
            image_dtype=image_dtype,
        )
        return imgs, dups, tiles, sorted(sel)
    ndev = mesh.shape[axis]
    vms = np.asarray(viewmats, dtype=np.float32)
    Kms = np.asarray(Ks, dtype=np.float32)
    V = len(vms)
    V_pad = ((V + ndev - 1) // ndev) * ndev
    if V_pad != V:
        vms = np.concatenate([vms, np.repeat(vms[-1:], V_pad - V, axis=0)])
        Kms = np.concatenate([Kms, np.repeat(Kms[-1:], V_pad - V, axis=0)])
    run = _sharded_scene_render_program(
        mesh, axis, width, height, sh_degree, tile, max_tiles_per_gauss,
        max_per_tile, chunk, image_dtype)
    with mesh:
        imgs, dups, tiles = run(scene, jnp.asarray(vms),
                                jnp.asarray(Kms),
                                jnp.asarray(bg, jnp.float32))
    return imgs[:V], dups[:V], tiles[:V], sorted(sel)


# ---------------------------------------------------------------------------
# Sequence serving: streaming playback of .r3ts with device-resident state

def _seq_step_body(vals_T, codes, weights, nvox, steps, mv, prev_codes,
                   prev_attrs, prev_weights, predict_mask, voxel_size,
                   vmin, viewmats, Ks, bg, *, depth: int, probes: int,
                   order_mode: str, quant_mode: str, rec_delta=0.0,
                   width: int, height: int, sh_degree: int = 3,
                   tile: int = 16, max_tiles_per_gauss: int = 16,
                   max_per_tile: int = 8192, chunk: int = 128,
                   image_dtype=jnp.float32):
    """One playback frame: residual decode (+ motion-compensated
    prediction from the device-resident previous reconstruction for
    inter frames), scene build, and the V-view render — ONE dispatch.

    ``mv``/``prev_*``/``predict_mask`` are ``None`` when absent (the
    pytree structure selects the program variant). A non-None
    ``predict_mask`` runs the non-normative device predicted-RAHT loop
    on the (residual) symbols, with the structure pass and plan build
    traced INTO this program — no extra dispatch. Returns
    ``(imgs, dups, tiles, attrs)``; ``attrs`` is the padded
    reconstruction to feed back as ``prev_attrs`` (zeros in pad slots,
    mirroring ``SequenceCodec._padded_recon``)."""
    from raht3dgs_tpu.ops.temporal import predict_from_previous

    inv = _inverse_order_device(codes, weights, nvox, depth, order_mode)
    if predict_mask is not None:
        from raht3dgs_tpu.ops.praht_device import (
            praht_device_decode,
            praht_device_plan,
        )
        from raht3dgs_tpu.ops.raht_span import raht_structure_span

        structure = raht_structure_span(codes, weights, depth)
        plan = praht_device_plan(codes, weights, depth,
                                 structure.drop_level,
                                 structure.subtree_w)
        attrs = praht_device_decode(
            plan, codes, weights, vals_T.astype(jnp.int32).T[inv],
            predict_mask, depth, steps, quant_mode=quant_mode,
            rec_delta=rec_delta, fdtype=jnp.float32,
        )
    else:
        coeffs = _dequant_gather_device(
            vals_T.astype(jnp.int32), inv, steps, jnp.float32, quant_mode,
            jnp.asarray(rec_delta, dtype=jnp.float32),
        )
        attrs = raht_inverse_span(coeffs, codes, weights, depth)
    if mv is not None:
        pred, _ = predict_from_previous(
            codes, prev_codes, prev_attrs, prev_weights, depth, probes,
            mv,
        )
        attrs = attrs + pred
    attrs = attrs * (weights > 0)[:, None]
    scene = _scene_from_attrs(attrs, codes, weights, voxel_size, vmin,
                              depth)
    imgs, dups, tiles = _render_views(
        scene, viewmats, Ks, bg, width=width, height=height,
        sh_degree=sh_degree, tile=tile,
        max_tiles_per_gauss=max_tiles_per_gauss, max_per_tile=max_per_tile,
        chunk=chunk,
    )
    if image_dtype != jnp.float32:
        imgs = (jnp.clip(imgs, 0.0, 1.0) * 255.0).astype(image_dtype)
    return imgs, dups, tiles, attrs


_serve_seq_step = partial(jax.jit, static_argnames=(
    "depth", "probes", "order_mode", "quant_mode", "width", "height",
    "sh_degree", "tile", "max_tiles_per_gauss", "max_per_tile", "chunk",
    "image_dtype"))(_seq_step_body)


@lru_cache(maxsize=16)
def _sharded_seq_program(mesh, axis, depth, probes, order_mode,
                         quant_mode, width, height, sh_degree, tile,
                         max_tiles_per_gauss, max_per_tile, chunk,
                         image_dtype, variant):
    """Playback step with the view scan sharded over ``mesh[axis]``.

    The decode (and the carried reconstruction) is replicated per device
    — the same work one chip pays — while each device renders V/ndev
    views; zero collectives, same stance as ``serve_views_sharded``.
    ``variant`` keys the cache on the (inter, predicted) pytree shape of
    the replicated operand tuple."""
    rep, sv = P(), P(axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(rep, sv, sv, rep),
             out_specs=(sv, sv, sv, rep),
             check_vma=False)
    def run(ops, vms, Kms, bg):
        (vals_T, codes, weights, nvox, steps, mv, pc, pa, pw, pm,
         voxel_size, vmin, rec_delta) = ops
        return _seq_step_body(
            vals_T, codes, weights, nvox, steps, mv, pc, pa, pw, pm,
            voxel_size, vmin, vms, Kms, bg, depth=depth, probes=probes,
            order_mode=order_mode, quant_mode=quant_mode,
            rec_delta=rec_delta, width=width, height=height,
            sh_degree=sh_degree, tile=tile,
            max_tiles_per_gauss=max_tiles_per_gauss,
            max_per_tile=max_per_tile, chunk=chunk,
            image_dtype=image_dtype,
        )

    return jax.jit(run)


def serve_sequence(streams, viewmats, Ks, bg=None, *, width, height,
                   positions=None, bucket=1 << 11, progressive=0,
                   mesh=None, axis="dp", sh_degree=3, tile=16,
                   max_tiles_per_gauss=16, max_per_tile=8192, chunk=128,
                   image_dtype=jnp.float32):
    """Streaming playback of a temporal sequence: yields per-frame
    rendered views with the reconstruction DEVICE-RESIDENT across frames.

    Per frame the host entropy-decodes the residual symbols (+ the
    signalled motion section) and the device runs ONE program — inverse
    transform, motion-compensated prediction from the previous frame's
    on-chip attributes, scene build, V-view render. Only images ever
    leave the chip; inter frames never re-upload a reconstruction. This
    is the NON-NORMATIVE device decode the serving carve-out allows
    (CLAUDE.md): reconstruction drifts from the frozen host loop by f32
    ulps per frame, reset at every I-frame — attributes feed the
    renderer only, and nothing here feeds an encoder closed loop.

    Args:
        streams: ``SequenceReader``, path to an ``.r3ts`` file, or an
            iterable of :class:`FrameStream` (first must be intra).
        positions: per-frame voxel positions — a sequence indexed by
            frame, or a callable ``i -> (N_i, 3)``; ``None`` decodes
            them from each stream's geometry section.
        bucket: pad granularity; frames bucket to multiples so the
            compiled step is reused across frames of similar size.
        progressive: decode only the first K entropy symbols per channel
            (0 = all) — a coarse-to-fine PREVIEW serve from a stream
            prefix (the skipped symbols reconstruct as exact-zero detail
            coefficients; see ``AttributeCodec.decode_progressive``).
            Intra-only sequences: a truncated residual would corrupt the
            inter prediction chain.
        mesh/axis: shard each frame's view scan over ``mesh[axis]``
            (decode + carried reconstruction replicated per device, zero
            collectives — ``serve_views_sharded``'s stance). V pads to a
            multiple of the axis size; padding views are rendered and
            dropped.

    Yields ``(images, dup_clipped, tile_clipped)`` per frame — JAX
    arrays, so the dispatch is async: a consumer that fetches frame k's
    images while the generator host-decodes frame k+1 gets entropy/
    device overlap for free.

    Predicted-RAHT (flags2) streams run the non-normative device praht
    loop on their (residual) symbols — the full ``--predict --inter``
    composition plays back on-chip. v2 derived-motion inter streams are
    rejected: their prediction is DERIVED by a frozen host pipeline
    (models/temporal.py:_predict) that this device path must not
    re-implement; decode those normatively via
    ``SequenceCodec.decode_sequence``.
    """
    from raht3dgs_tpu.codec.bitstream import FrameStream, SequenceReader
    from raht3dgs_tpu.codec.geometry import positions_from_geometry
    from raht3dgs_tpu.models.pipeline import decode_entropy_channels
    from raht3dgs_tpu.models.temporal import _unpack_motion

    import os

    if isinstance(streams, (str, os.PathLike)):
        streams = SequenceReader(streams)
    if bg is None:
        bg = jnp.ones((3,), jnp.float32)
    vms = np.asarray(viewmats, dtype=np.float32)
    Kms = np.asarray(Ks, dtype=np.float32)
    V = len(vms)
    if mesh is not None:
        ndev = mesh.shape[axis]
        V_pad = ((V + ndev - 1) // ndev) * ndev
        if V_pad != V:
            vms = np.concatenate(
                [vms, np.repeat(vms[-1:], V_pad - V, axis=0)])
            Kms = np.concatenate(
                [Kms, np.repeat(Kms[-1:], V_pad - V, axis=0)])
    vms = jnp.asarray(vms)
    Kms = jnp.asarray(Kms)
    bg = jnp.asarray(bg, jnp.float32)

    prev = None  # (codes_dev, attrs_dev, weights_dev)
    for i, stream in enumerate(streams):
        if not isinstance(stream, FrameStream):
            stream = FrameStream.from_bytes(stream)
        if stream.inter and prev is None:
            raise ValueError(f"frame {i} is inter but no frame precedes")
        if stream.inter and stream.motion is None:
            raise NotImplementedError(
                "serve_sequence: v2 derived-motion stream — decode "
                "normatively with SequenceCodec.decode_sequence")

        if positions is None:
            if stream.geometry is None:
                raise ValueError(
                    f"frame {i} carries no geometry section; pass "
                    "positions")
            Vt = positions_from_geometry(stream.geometry, stream.depth,
                                         stream.n_voxels)
        else:
            Vt = positions(i) if callable(positions) else positions[i]
        Vt = np.asarray(Vt, dtype=np.int64)
        if len(Vt) != stream.n_voxels:
            raise ValueError(
                f"frame {i}: {len(Vt)} positions != {stream.n_voxels} "
                "coded voxels")
        depth = stream.depth
        P = -((-max(len(Vt), 1)) // bucket) * bucket
        codes_p, w_p = _padded_frame_np(Vt, depth, P)
        vals_T = np.zeros((stream.n_channels, P), dtype=np.int32)
        k = stream.n_voxels
        if progressive:
            if stream.inter:
                raise ValueError(
                    "progressive serving needs an all-intra sequence — "
                    "a truncated residual corrupts the prediction chain")
            k = int(min(max(progressive, 1), stream.n_voxels))
        decode_entropy_channels(stream, k, vals_T)
        mv = (None if not stream.inter else jnp.asarray(_unpack_motion(
            stream.motion, codes_p, stream.n_voxels, P, depth)))

        steps = jnp.asarray(
            np.atleast_1d(np.asarray(stream.steps, dtype=np.float32)))
        voxel_size = float(stream.width) / (1 << depth)
        codes_dev = jnp.asarray(codes_p)
        weights_dev = jnp.asarray(w_p)
        pc, pa, pw = prev if stream.inter else (None, None, None)
        pm = (jnp.uint32(stream.predict_mask) if stream.predict
              else None)
        vals_dev = upload_quantized(pack_quantized_upload(vals_T))
        vmin_dev = jnp.asarray(np.asarray(stream.vmin), jnp.float32)
        if mesh is None:
            imgs, dups, tiles, attrs = _serve_seq_step(
                vals_dev, codes_dev, weights_dev,
                jnp.int32(stream.n_voxels), steps, mv, pc, pa, pw, pm,
                jnp.float32(voxel_size), vmin_dev, vms, Kms, bg,
                depth=depth, probes=stream.probes,
                order_mode=stream.order_mode,
                quant_mode=stream.quant_mode,
                rec_delta=stream.rec_delta, width=width, height=height,
                sh_degree=sh_degree, tile=tile,
                max_tiles_per_gauss=max_tiles_per_gauss,
                max_per_tile=max_per_tile, chunk=chunk,
                image_dtype=image_dtype,
            )
        else:
            run = _sharded_seq_program(
                mesh, axis, depth, stream.probes, stream.order_mode,
                stream.quant_mode, width, height, sh_degree, tile,
                max_tiles_per_gauss, max_per_tile, chunk, image_dtype,
                (stream.inter, stream.predict),
            )
            ops = (vals_dev, codes_dev, weights_dev,
                   jnp.int32(stream.n_voxels), steps, mv, pc, pa, pw,
                   pm, jnp.float32(voxel_size), vmin_dev,
                   jnp.float32(stream.rec_delta))
            with mesh:
                imgs, dups, tiles, attrs = run(ops, vms, Kms, bg)
            imgs, dups, tiles = imgs[:V], dups[:V], tiles[:V]
        prev = (codes_dev, attrs, weights_dev)
        yield imgs, dups, tiles
