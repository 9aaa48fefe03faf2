"""Fused serving program: decode+render in one dispatch.

Pins: fused == split (decode then per-view rasterize) to 1-ulp (different
XLA programs fuse fma differently); int16 upload narrowing changes
nothing; the view-sharded variant equals the single-device program."""

import numpy as np
import jax
import jax.numpy as jnp

from raht3dgs_tpu.codec.rlgr import rlgr_decode_channels
from raht3dgs_tpu.eval.cameras import generate_random_cameras
from raht3dgs_tpu.eval.rasterize import _rasterize_tiled
from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from raht3dgs_tpu.models.serving import (
    build_inverse_order,
    decode_scene_device,
    quantized_upload_array,
    serve_frame,
    serve_views_sharded,
)
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.prelude import morton_codes_np

DEPTH = 5
SIZE = 64
RASTER = dict(sh_degree=3, tile=16, max_tiles_per_gauss=16,
              max_per_tile=1024, chunk=64)


def _make_served_frame(rng, n=400, step=0.002):
    pts = rng.integers(0, 2**DEPTH, size=(4 * n, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:n]
    pos = np.asarray(morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    n = len(codes)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.02, 0.08, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    ).astype(np.float32)
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)

    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    frame = prepare_voxel_frame(pos, attrs, DEPTH, bucket=max(n, 1),
                                dtype=jnp.float32)
    enc = codec.encode(frame, step)
    stream = enc.stream
    vals_T = np.zeros((stream.n_channels, frame.codes.shape[0]),
                      dtype=np.int32)
    rlgr_decode_channels(stream.channels, stream.n_voxels, out=vals_T,
                         chunk=stream.chunk)
    inv = build_inverse_order(frame.codes, frame.weights,
                              jnp.int32(stream.n_voxels), DEPTH,
                              stream.order_mode)
    voxel_size = jnp.float32(2.0 / 2**DEPTH)
    vmin = jnp.asarray([-1.0, -1.0, -1.0], jnp.float32)
    return frame, vals_T, inv, jnp.float32(step), voxel_size, vmin


def _cameras(v):
    viewmats, Ks, _, _ = generate_random_cameras(
        np.zeros(3), 2.5, n_views=v, image_width=SIZE, image_height=SIZE,
        seed=3,
    )
    return (jnp.asarray(viewmats, jnp.float32), jnp.asarray(Ks, jnp.float32))


def test_fused_equals_split(rng):
    frame, vals_T, inv, steps, vs, vmin = _make_served_frame(rng)
    vms, Kms = _cameras(3)
    bg = jnp.ones((3,), jnp.float32)

    imgs, dups, tiles = serve_frame(
        jnp.asarray(vals_T), inv, steps, frame.codes, frame.weights, vs,
        vmin, vms, Kms, bg, depth=DEPTH, width=SIZE, height=SIZE, **RASTER,
    )
    assert imgs.shape == (3, SIZE, SIZE, 3)
    assert int(dups.sum()) == 0 and int(tiles.sum()) == 0

    scene = decode_scene_device(
        jnp.asarray(vals_T), inv, steps, frame.codes, frame.weights, vs,
        vmin, depth=DEPTH,
    )
    for i in range(3):
        img, meta = _rasterize_tiled(
            *scene, vms[i], Kms[i], bg, width=SIZE, height=SIZE, **RASTER,
        )
        np.testing.assert_allclose(
            np.asarray(imgs[i]), np.asarray(img), atol=1e-5, rtol=0
        )

    std = float(np.asarray(imgs).std())
    assert std > 1e-4, "blank renders"


def test_int16_upload_bitwise(rng):
    frame, vals_T, inv, steps, vs, vmin = _make_served_frame(rng)
    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    narrow = quantized_upload_array(vals_T)
    assert narrow.dtype == np.int16  # step 0.002 on unit-scale attrs fits

    a = serve_frame(jnp.asarray(vals_T), inv, steps, frame.codes,
                    frame.weights, vs, vmin, vms, Kms, bg,
                    depth=DEPTH, width=SIZE, height=SIZE, **RASTER)
    b = serve_frame(jnp.asarray(narrow), inv, steps, frame.codes,
                    frame.weights, vs, vmin, vms, Kms, bg,
                    depth=DEPTH, width=SIZE, height=SIZE, **RASTER)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_int16_narrowing_declines_wide_values():
    wide = np.full((2, 4), 40_000, dtype=np.int32)
    assert quantized_upload_array(wide).dtype == np.int32


def test_patched_upload_bitwise(rng):
    """int16+sparse-patch upload widens to EXACTLY the original int32
    matrix, for both the (D, N) single-frame and (B, D, N) batch layouts."""
    from raht3dgs_tpu.models.pipeline import (
        pack_quantized_upload,
        upload_quantized,
    )

    for shape in [(7, 300), (2, 7, 300)]:
        vals = rng.integers(-2000, 2000, size=shape).astype(np.int32)
        flat = vals.reshape(-1)
        pos = rng.choice(flat.size, size=5, replace=False)
        flat[pos] = np.asarray(
            [40_000, -40_000, 1 << 20, -(1 << 20), 32_768], np.int32
        )
        up = pack_quantized_upload(vals)
        assert up.vals.dtype == np.int16
        assert up.patch_idx.size == 8  # 5 overflows, bucketed to 8
        widened = np.asarray(upload_quantized(up))
        assert widened.dtype == np.int32
        np.testing.assert_array_equal(widened, vals)

    # no int8 overflow at all: plain int8, empty patch (consumers widen)
    up = pack_quantized_upload(np.arange(-50, 50, dtype=np.int32).reshape(4, 25))
    assert up.vals.dtype == np.int8 and up.patch_idx.size == 0
    assert np.asarray(upload_quantized(up)).dtype == np.int8

    # int8 base with sparse int8 overflows: int8 + exact patch
    vals = rng.integers(-100, 100, size=(7, 300)).astype(np.int32)
    flat = vals.reshape(-1)
    flat[[5, 900, 2001]] = [40_000, -130, 127 + 1]
    up = pack_quantized_upload(vals)
    assert up.vals.dtype == np.int8 and up.patch_idx.size == 8
    np.testing.assert_array_equal(np.asarray(upload_quantized(up)), vals)


def test_patched_upload_policy(monkeypatch):
    from raht3dgs_tpu.models.pipeline import pack_quantized_upload

    # dense overflow (> size//8 entries): patch loses, ship int32
    wide = np.full((8, 32), 40_000, dtype=np.int32)
    up = pack_quantized_upload(wide)
    assert up.vals.dtype == np.int32 and up.patch_idx.size == 0

    # one outlier over a zero base: the SPARSE tier wins outright
    # (64-bucketed indices+values beat any dense tier)
    sparse = np.zeros((8, 64), dtype=np.int32)
    sparse[0, 0] = 40_000
    up = pack_quantized_upload(sparse)
    assert up.shape == (8, 64) and up.patch_idx.size == 64
    # dense-tier policy itself, with the sparse tier disabled:
    monkeypatch.setenv("RAHT3DGS_UPLOAD_SPARSE", "0")
    monkeypatch.setenv("RAHT3DGS_UPLOAD_PATCH", "0")
    up = pack_quantized_upload(sparse)
    assert up.vals.dtype == np.int32 and up.patch_idx.size == 0
    monkeypatch.delenv("RAHT3DGS_UPLOAD_PATCH")
    # with patching back on, one outlier over a zero base takes the
    # narrowest dense tier: int8 + patch
    assert pack_quantized_upload(sparse).vals.dtype == np.int8
    monkeypatch.delenv("RAHT3DGS_UPLOAD_SPARSE")

    # dense int8 overflow but int16-clean: plain int16 wire
    mid = np.full((8, 64), 1000, dtype=np.int32)
    up = pack_quantized_upload(mid)
    assert up.vals.dtype == np.int16 and up.patch_idx.size == 0


def test_patched_upload_through_serve_frame(rng):
    """A frame whose quantized matrix has one int16 overflow renders
    bitwise identically from the patched int16 upload and from int32."""
    from raht3dgs_tpu.models.pipeline import (
        pack_quantized_upload,
        upload_quantized,
    )

    frame, vals_T, inv, steps, vs, vmin = _make_served_frame(rng)
    vals_T = vals_T.copy()
    vals_T[3, 7] = 50_000  # force the all-or-nothing path to int32
    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    kw = dict(depth=DEPTH, width=SIZE, height=SIZE, **RASTER)

    up = pack_quantized_upload(vals_T)
    assert up.vals.dtype == np.int16 and up.patch_idx.size > 0
    a = serve_frame(jnp.asarray(vals_T), inv, steps, frame.codes,
                    frame.weights, vs, vmin, vms, Kms, bg, **kw)
    b = serve_frame(upload_quantized(up), inv, steps, frame.codes,
                    frame.weights, vs, vmin, vms, Kms, bg, **kw)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_sharded_serving_matches_single(rng):
    from raht3dgs_tpu.parallel.sharding import make_mesh

    frame, vals_T, inv, steps, vs, vmin = _make_served_frame(rng)
    v = 5  # not a multiple of the axis size: exercises view padding
    vms, Kms = _cameras(v)
    bg = jnp.ones((3,), jnp.float32)

    ref, dups, tiles = serve_frame(
        jnp.asarray(vals_T), inv, steps, frame.codes, frame.weights, vs,
        vmin, vms, Kms, bg, depth=DEPTH, width=SIZE, height=SIZE, **RASTER,
    )
    mesh = make_mesh(8)
    imgs, dups_s, tiles_s = serve_views_sharded(
        vals_T, inv, steps, frame.codes, frame.weights, vs, vmin,
        np.asarray(vms), np.asarray(Kms), mesh=mesh, depth=DEPTH,
        width=SIZE, height=SIZE, **RASTER,
    )
    assert imgs.shape == (v, SIZE, SIZE, 3)
    np.testing.assert_allclose(
        np.asarray(imgs), np.asarray(ref), atol=1e-5, rtol=0
    )
    np.testing.assert_array_equal(np.asarray(dups_s), np.asarray(dups))


def test_uint8_image_fetch_matches_host_convention(rng):
    """On-device uint8 quantization must match the display/PNG convention
    (eval/render.py: ``(clip(img,0,1)*255).astype(uint8)``) to within one
    code (XLA's float->int convert may round where numpy truncates), for
    both the single-device and view-sharded programs."""
    from raht3dgs_tpu.parallel.sharding import make_mesh

    frame, vals_T, inv, steps, vs, vmin = _make_served_frame(rng)
    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    kw = dict(depth=DEPTH, width=SIZE, height=SIZE, **RASTER)

    ref, _, _ = serve_frame(
        jnp.asarray(vals_T), inv, steps, frame.codes, frame.weights, vs,
        vmin, vms, Kms, bg, **kw,
    )
    host_u8 = (np.clip(np.asarray(ref), 0, 1) * 255).astype(np.uint8)

    u8, dups, tiles = serve_frame(
        jnp.asarray(vals_T), inv, steps, frame.codes, frame.weights, vs,
        vmin, vms, Kms, bg, image_dtype=jnp.uint8, **kw,
    )
    assert u8.dtype == jnp.uint8
    assert (
        np.abs(u8.astype(np.int32) - host_u8.astype(np.int32)).max() <= 1
    )

    mesh = make_mesh(8)
    u8s, _, _ = serve_views_sharded(
        vals_T, inv, steps, frame.codes, frame.weights, vs, vmin,
        np.asarray(vms), np.asarray(Kms), mesh=mesh,
        image_dtype=jnp.uint8, **kw,
    )
    assert np.asarray(u8s).dtype == np.uint8
    assert (
        np.abs(np.asarray(u8s).astype(np.int32) - host_u8.astype(np.int32))
        .max() <= 1
    )


def test_serve_frame_predicted(rng):
    """Predicted-RAHT streams serve on device: the non-normative device
    closed-loop decode reconstructs within ulps of the frozen host loop,
    and the fused predicted serving program renders it."""
    from raht3dgs_tpu.models.pipeline import _transform_device, _scale_sqrt_w
    from raht3dgs_tpu.models.serving import (
        decode_scene_device_predicted,
        serve_frame_predicted,
    )
    from raht3dgs_tpu.ops.praht_device import praht_device_plan

    frame, _, inv, _, vs, vmin = _make_served_frame(rng)
    codec = AttributeCodec(DEPTH, dtype=jnp.float32, predict=True,
                           predict_impl="host")
    step = 0.002
    enc = codec.encode(frame, step)
    stream = enc.stream
    assert stream.predict
    vals_T = np.zeros((stream.n_channels, frame.codes.shape[0]),
                      dtype=np.int32)
    rlgr_decode_channels(stream.channels, stream.n_voxels, out=vals_T,
                         chunk=stream.chunk)
    # device plan from the transform structure
    scaled = _scale_sqrt_w(frame.attributes, frame.weights)
    _, _, structure = _transform_device(
        frame.codes, scaled, frame.weights, DEPTH, "ragft", codec.impl)
    plan = praht_device_plan(frame.codes, frame.weights, DEPTH,
                             structure.drop_level, structure.subtree_w)
    steps_j = jnp.atleast_1d(jnp.asarray(step, jnp.float32))

    # scene attrs match the frozen host decode within float tolerance
    rec_host, _ = codec.decode(stream, frame.codes, frame.weights)
    from raht3dgs_tpu.ops.praht_device import praht_device_decode
    sym = jnp.asarray(vals_T).astype(jnp.int32).T[inv]
    rec_dev = np.asarray(praht_device_decode(
        plan, frame.codes, frame.weights, sym,
        jnp.uint32(stream.predict_mask), DEPTH, steps_j,
        quant_mode=stream.quant_mode, rec_delta=stream.rec_delta,
    ))[: frame.n_voxels]
    np.testing.assert_allclose(rec_dev, rec_host, atol=1e-4, rtol=1e-4)

    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    imgs, dups, tiles = serve_frame_predicted(
        jnp.asarray(vals_T), inv, plan, jnp.uint32(stream.predict_mask),
        steps_j, frame.codes, frame.weights, vs, vmin, vms, Kms, bg,
        depth=DEPTH, width=SIZE, height=SIZE,
        quant_mode=stream.quant_mode, rec_delta=stream.rec_delta, **RASTER,
    )
    assert imgs.shape == (2, SIZE, SIZE, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    assert float(np.asarray(imgs).std()) > 1e-4, "blank renders"
    # and the predicted scene equals rendering the host reconstruction
    scene = decode_scene_device_predicted(
        jnp.asarray(vals_T), inv, plan, jnp.uint32(stream.predict_mask),
        steps_j, frame.codes, frame.weights, vs, vmin, depth=DEPTH,
        quant_mode=stream.quant_mode, rec_delta=stream.rec_delta,
    )
    img0, _ = _rasterize_tiled(
        *scene, vms[0], Kms[0], bg, width=SIZE, height=SIZE, **RASTER,
    )
    np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(img0),
                               atol=1e-5, rtol=0)


def _two_octant_gs_frame(rng, per_octant=120):
    """56-channel content in two opposite octants of the depth-5 grid —
    brick_depth 1 puts them in two different bricks."""
    side = 2 ** DEPTH
    h = side // 2
    pts = np.concatenate([
        rng.integers(0, h, size=(4 * per_octant, 3)),
        rng.integers(h, side, size=(4 * per_octant, 3)),
    ])
    codes = np.unique(morton_codes_np(pts, DEPTH))
    pos = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    n = len(codes)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.02, 0.06, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    )
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)
    return pos, attrs


def test_serve_tiled_matches_host_composed_render(rng):
    from raht3dgs_tpu.models.serving import (
        _render_scene_views,
        serve_tiled_frame,
    )
    from raht3dgs_tpu.models.tiling import decode_tiled_frame, encode_tiled_frame

    V, attrs = _two_octant_gs_frame(rng)
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    blob, stats = encode_tiled_frame(
        V, attrs, DEPTH, 1, codec, 0.002, code_geometry=True,
        vmin=np.array([-1.0, -1.0, -1.0]), width=2.0,
    )
    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)

    imgs, dups, tiles, sel = serve_tiled_frame(
        blob, vms, Kms, bg, width=SIZE, height=SIZE, bucket=64,
        margin=4.0, **RASTER,
    )
    assert sel == list(range(len(stats)))  # huge margin keeps every brick

    # golden: host tiled decode -> scene -> the same render program
    Vd, Ad = decode_tiled_frame(blob, dtype=jnp.float32)
    voxel_size = 2.0 / 2 ** DEPTH
    means = (Vd.astype(np.float64) + 0.5) * voxel_size + \
        np.array([-1.0, -1.0, -1.0])
    scene = (
        jnp.asarray(means, jnp.float32),
        jnp.asarray(Ad[:, 0:4], jnp.float32),
        jnp.asarray(np.maximum(Ad[:, 4:7], 1e-5), jnp.float32),
        jnp.asarray(np.clip(Ad[:, 7], 0.0, 1.0), jnp.float32),
        jnp.asarray(Ad[:, 8:].reshape(len(Vd), -1, 3), jnp.float32),
    )
    ref, _, _ = _render_scene_views(
        scene, vms, Kms, bg, width=SIZE, height=SIZE, **RASTER)
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(ref),
                               atol=1e-5)
    assert int(np.asarray(dups).sum()) == 0


def test_serve_tiled_predicted_matches_host_decode(rng):
    """Predicted-RAHT tiled bricks (--tiles --predict) serve through the
    per-brick device praht loop; images must match rendering the
    NORMATIVE host tiled decode (non-normative display decode — f32-ulp
    agreement, not bitwise). Composes the two round-4 capstones."""
    from raht3dgs_tpu.models.serving import (
        _render_scene_views,
        serve_tiled_frame,
    )
    from raht3dgs_tpu.models.tiling import (
        TiledReader,
        decode_tiled_frame,
        encode_tiled_frame,
    )

    V, attrs = _two_octant_gs_frame(rng)
    codec = AttributeCodec(DEPTH, dtype=jnp.float32, predict=True,
                           predict_impl="host")
    blob, stats = encode_tiled_frame(
        V, attrs, DEPTH, 1, codec, 0.002, code_geometry=True,
        vmin=np.array([-1.0, -1.0, -1.0]), width=2.0,
    )
    reader = TiledReader(blob)
    assert all(reader.tile(i).predict for i in range(len(reader)))
    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)

    imgs, dups, tiles, sel = serve_tiled_frame(
        blob, vms, Kms, bg, width=SIZE, height=SIZE, bucket=64,
        margin=4.0, **RASTER,
    )
    assert sel == list(range(len(stats)))

    # golden: normative host tiled decode -> scene -> same render program
    Vd, Ad = decode_tiled_frame(blob, dtype=jnp.float32)
    voxel_size = 2.0 / 2 ** DEPTH
    means = (Vd.astype(np.float64) + 0.5) * voxel_size + \
        np.array([-1.0, -1.0, -1.0])
    scene = (
        jnp.asarray(means, jnp.float32),
        jnp.asarray(Ad[:, 0:4], jnp.float32),
        jnp.asarray(np.maximum(Ad[:, 4:7], 1e-5), jnp.float32),
        jnp.asarray(np.clip(Ad[:, 7], 0.0, 1.0), jnp.float32),
        jnp.asarray(Ad[:, 8:].reshape(len(Vd), -1, 3), jnp.float32),
    )
    ref, _, _ = _render_scene_views(
        scene, vms, Kms, bg, width=SIZE, height=SIZE, **RASTER)
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(ref),
                               atol=1e-4)
    assert int(np.asarray(dups).sum()) == 0

    # ROI subset: predicted bricks honor an explicit brick override too
    sub = sel[:1]
    imgs_roi, _, _, sel_roi = serve_tiled_frame(
        blob, vms, Kms, bg, width=SIZE, height=SIZE, bucket=64,
        bricks=sub, **RASTER)
    assert sel_roi == sub
    assert imgs_roi.shape == imgs.shape


def test_visible_bricks_culls_behind_camera(rng):
    from raht3dgs_tpu.eval.cameras import look_at_w2c
    from raht3dgs_tpu.models.serving import serve_tiled_frame, visible_bricks
    from raht3dgs_tpu.models.tiling import (
        TiledReader,
        brick_keys_np,
        encode_tiled_frame,
    )

    V, attrs = _two_octant_gs_frame(rng)
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    blob, stats = encode_tiled_frame(
        V, attrs, DEPTH, 1, codec, 0.002, code_geometry=True,
        vmin=np.array([-1.0, -1.0, -1.0]), width=2.0,
    )
    reader = TiledReader(blob)
    # camera just off-center, looking INTO the low octant: every corner of
    # the high octant's brick box ([0,1]^3 world) is behind the image plane
    w2c = look_at_w2c(np.array([-0.1, -0.1, -0.1]),
                      np.array([-0.6, -0.6, -0.6]))
    f = 1.2 * SIZE
    K = np.array([[f, 0, SIZE / 2], [0, f, SIZE / 2], [0, 0, 1.0]])
    vms = jnp.asarray(w2c[None], jnp.float32)
    Kms = jnp.asarray(K[None], jnp.float32)

    sel = visible_bricks(reader, np.asarray(vms), np.asarray(Kms),
                         SIZE, SIZE, margin=0.02)
    keys_low = brick_keys_np(
        morton_codes_np(V[(V < 2 ** (DEPTH - 1)).all(1)], DEPTH),
        DEPTH, 1)
    assert len(sel) < len(stats)
    assert {int(reader.keys[i]) for i in sel} >= set(
        np.unique(keys_low).tolist())

    # culling cannot change the image: the dropped brick is behind the
    # camera, so its splats never rasterize
    bg = jnp.ones((3,), jnp.float32)
    culled, _, _, _ = serve_tiled_frame(
        blob, vms, Kms, bg, width=SIZE, height=SIZE, bucket=64,
        margin=0.02, **RASTER)
    full, _, _, _ = serve_tiled_frame(
        blob, vms, Kms, bg, width=SIZE, height=SIZE, bucket=64,
        bricks=range(len(reader)), **RASTER)
    np.testing.assert_allclose(np.asarray(culled), np.asarray(full),
                               atol=1e-6)


def test_serve_sequence_matches_normative_decode(rng, tmp_path):
    """Device-resident sequence playback (serve_sequence) must render the
    same images as pushing the NORMATIVE SequenceCodec reconstructions
    through the same render program — the serving decode is the allowed
    non-normative device path, so agreement is to f32 drift, not bitwise.
    Covers: .r3ts path input, intra + signalled-motion inter frames,
    device-resident prediction state across frames."""
    from raht3dgs_tpu.codec.bitstream import write_sequence
    from raht3dgs_tpu.models.serving import (
        _render_scene_views,
        _scene_from_attrs,
        serve_sequence,
    )
    from raht3dgs_tpu.models.temporal import SequenceCodec

    side = 2 ** DEPTH
    pts = rng.integers(2, side - 4, size=(1600, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:300]
    base = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    n = len(base)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.02, 0.06, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    )
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)

    shifts = [np.zeros(3, int), np.array([1, 0, -1]), np.array([2, 1, 0])]
    positions = [np.clip(base + s, 0, side - 1) for s in shifts]
    frames = [
        prepare_voxel_frame(p, attrs, DEPTH, bucket=64, dtype=jnp.float32)
        for p in positions
    ]
    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, dtype=jnp.float32)
    streams, _ = sc.encode_sequence(frames, steps=0.002)
    assert streams[0].inter is False and streams[1].inter is True
    assert streams[1].motion is not None  # v3 signalled motion
    path = tmp_path / "seq.r3ts"
    write_sequence(path, streams)

    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    served = list(serve_sequence(
        str(path), vms, Kms, bg, width=SIZE, height=SIZE,
        positions=lambda i: positions[i], bucket=64, **RASTER,
    ))
    assert len(served) == len(frames)

    recons = sc.decode_sequence(streams, frames)
    voxel_size = jnp.float32(frames[0].width / side)
    vmin = jnp.asarray(frames[0].vmin, jnp.float32)
    for (imgs, dups, tiles), frame, rec in zip(served, frames, recons):
        full = np.zeros((frame.codes.shape[0], rec.shape[1]))
        full[: frame.n_voxels] = rec
        scene = _scene_from_attrs(
            jnp.asarray(full, jnp.float32), frame.codes, frame.weights,
            voxel_size, vmin, DEPTH)
        ref, _, _ = _render_scene_views(
            scene, vms, Kms, bg, width=SIZE, height=SIZE, **RASTER)
        np.testing.assert_allclose(np.asarray(imgs), np.asarray(ref),
                                   atol=2e-4)


def test_serve_sequence_rejects_underived_paths(rng, tmp_path):
    """v2 derived-motion streams must be refused (their prediction is the
    frozen HOST pipeline serve_sequence must not re-implement), as must
    inter-without-predecessor."""
    import pytest

    from raht3dgs_tpu.models.serving import serve_sequence
    from raht3dgs_tpu.models.temporal import SequenceCodec

    pts = rng.integers(0, 2 ** DEPTH, size=(900, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:200]
    pos = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    attrs = np.concatenate(
        [
            np.ones((len(pos), 4)) * [1, 0, 0, 0],
            np.full((len(pos), 3), 0.04),
            np.full((len(pos), 1), 0.8),
            np.zeros((len(pos), 48)),
        ],
        axis=1,
    )
    frames = [
        prepare_voxel_frame(pos, attrs, DEPTH, bucket=64,
                            dtype=jnp.float32)
        for _ in range(2)
    ]
    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, signal_motion=False,
                       dtype=jnp.float32)
    streams, _ = sc.encode_sequence(frames, steps=0.002)
    assert streams[1].inter and streams[1].motion is None
    vms, Kms = _cameras(1)
    with pytest.raises(NotImplementedError, match="derived-motion"):
        list(serve_sequence(streams, vms, Kms, width=SIZE, height=SIZE,
                            positions=[pos, pos], bucket=64, **RASTER))
    with pytest.raises(ValueError, match="no frame precedes"):
        list(serve_sequence(streams[1:], vms, Kms, width=SIZE,
                            height=SIZE, positions=[pos], bucket=64,
                            **RASTER))


def test_serve_sequence_predicted_streams(rng, tmp_path):
    """--predict --inter composition plays back on-chip: predicted-RAHT
    streams in a temporal sequence decode through the device praht loop
    (structure pass + plan traced into the step program) and match the
    normative host closed loop's rendered images to float drift."""
    from raht3dgs_tpu.models.serving import (
        _render_scene_views,
        _scene_from_attrs,
        serve_sequence,
    )
    from raht3dgs_tpu.models.temporal import SequenceCodec

    side = 2 ** DEPTH
    pts = rng.integers(2, side - 4, size=(1600, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:300]
    base = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    n = len(base)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.02, 0.06, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    )
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)
    shifts = [np.zeros(3, int), np.array([1, -1, 0])]
    positions = [np.clip(base + s, 0, side - 1) for s in shifts]
    frames = [
        prepare_voxel_frame(p, attrs, DEPTH, bucket=64, dtype=jnp.float32)
        for p in positions
    ]
    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, dtype=jnp.float32,
                       predict=True, predict_impl="host")
    streams, _ = sc.encode_sequence(frames, steps=0.002)
    assert any(s.predict for s in streams)
    assert streams[1].inter

    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    served = list(serve_sequence(
        streams, vms, Kms, bg, width=SIZE, height=SIZE,
        positions=positions, bucket=64, **RASTER,
    ))
    recons = sc.decode_sequence(streams, frames)
    voxel_size = jnp.float32(frames[0].width / side)
    vmin = jnp.asarray(frames[0].vmin, jnp.float32)
    for (imgs, _, _), frame, rec in zip(served, frames, recons):
        full = np.zeros((frame.codes.shape[0], rec.shape[1]))
        full[: frame.n_voxels] = rec
        scene = _scene_from_attrs(
            jnp.asarray(full, jnp.float32), frame.codes, frame.weights,
            voxel_size, vmin, DEPTH)
        ref, _, _ = _render_scene_views(
            scene, vms, Kms, bg, width=SIZE, height=SIZE, **RASTER)
        np.testing.assert_allclose(np.asarray(imgs), np.asarray(ref),
                                   atol=1e-3)


def test_serve_sequence_progressive_prefix(rng):
    """Progressive serving: K=n_voxels reproduces the full serve exactly
    (zeros beyond the prefix ARE the truncated coefficients); a small K
    still renders (coarse preview); inter sequences are refused."""
    import pytest

    from raht3dgs_tpu.models.serving import serve_sequence
    from raht3dgs_tpu.models.temporal import SequenceCodec

    pts = rng.integers(0, 2 ** DEPTH, size=(1200, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:250]
    pos = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    n = len(pos)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.02, 0.06, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    )
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)
    frame = prepare_voxel_frame(pos, attrs, DEPTH, bucket=64,
                                dtype=jnp.float32)
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    stream = codec.encode(frame, 0.002).stream
    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)

    def one(progressive):
        (imgs, _, _), = list(serve_sequence(
            [stream], vms, Kms, bg, width=SIZE, height=SIZE,
            positions=[pos], bucket=64, progressive=progressive,
            **RASTER))
        return np.asarray(imgs)

    full = one(0)
    np.testing.assert_array_equal(one(n), full)  # same program, same k
    coarse = one(max(n // 8, 1))
    assert coarse.shape == full.shape
    assert np.isfinite(coarse).all()
    assert np.abs(coarse - full).max() > 1e-4  # detail actually truncated

    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, dtype=jnp.float32)
    streams, _ = sc.encode_sequence([frame, frame], steps=0.002)
    with pytest.raises(ValueError, match="all-intra"):
        list(serve_sequence(streams, vms, Kms, bg, width=SIZE,
                            height=SIZE, positions=[pos, pos], bucket=64,
                            progressive=32, **RASTER))


def test_serve_sequence_view_sharded(rng):
    """serve_sequence(mesh=...) shards each frame's view scan over the
    mesh axis; images must match the unsharded playback (different XLA
    program — 1-ulp fusion differences, atol 1e-5), V padding views
    dropped, on both intra and inter frames."""
    from raht3dgs_tpu.models.serving import serve_sequence
    from raht3dgs_tpu.models.temporal import SequenceCodec
    from raht3dgs_tpu.parallel import make_mesh

    side = 2 ** DEPTH
    pts = rng.integers(2, side - 4, size=(1400, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:260]
    base = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    n = len(base)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.02, 0.06, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    )
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)
    positions = [base, np.clip(base + [0, 1, 1], 0, side - 1)]
    frames = [
        prepare_voxel_frame(p, attrs, DEPTH, bucket=64, dtype=jnp.float32)
        for p in positions
    ]
    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, dtype=jnp.float32)
    streams, _ = sc.encode_sequence(frames, steps=0.002)
    assert streams[1].inter

    vms, Kms = _cameras(3)  # 3 views over an 8-way axis: padding dropped
    bg = jnp.ones((3,), jnp.float32)
    plain = list(serve_sequence(
        streams, vms, Kms, bg, width=SIZE, height=SIZE,
        positions=positions, bucket=64, **RASTER))
    mesh = make_mesh(8)
    sharded = list(serve_sequence(
        streams, vms, Kms, bg, width=SIZE, height=SIZE,
        positions=positions, bucket=64, mesh=mesh, **RASTER))
    assert len(sharded) == len(plain) == 2
    for (a, _, _), (b, _, _) in zip(plain, sharded):
        assert np.asarray(b).shape == (3, SIZE, SIZE, 3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5)


def test_serve_sequence_cross_size_frames(rng):
    """Playback across frames with DIFFERENT voxel counts: the padded
    shapes change between frames (new step signature), and the inter
    prediction spans previous arrays of a different length — serving
    pads each frame independently of the encoder's shared bucket, which
    is sound because padding is algebraically invisible to the decode.
    Images must still match the normative closed loop."""
    from raht3dgs_tpu.models.serving import (
        _render_scene_views,
        _scene_from_attrs,
        serve_sequence,
    )
    from raht3dgs_tpu.models.temporal import SequenceCodec

    side = 2 ** DEPTH
    pts = rng.integers(2, side - 3, size=(1600, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:280]
    base = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    n = len(base)
    attrs = np.concatenate(
        [
            rng.normal(size=(n, 4)),
            rng.uniform(0.02, 0.06, (n, 3)),
            rng.uniform(0.3, 1.0, (n, 1)),
            rng.normal(0, 0.3, (n, 48)),
        ],
        axis=1,
    )
    attrs[:, 0:4] /= np.linalg.norm(attrs[:, 0:4], axis=1, keepdims=True)
    # frame 1 keeps only the first 130 voxels (content appears/disappears
    # between frames -> different n_voxels, different serving pad P)
    n1 = 130
    positions = [base, np.clip(base[:n1] + [1, 0, 0], 0, side - 1)]
    attr_seq = [attrs, attrs[:n1]]
    # encoder contract: shared bucket across the sequence
    frames = [
        prepare_voxel_frame(p, a, DEPTH, bucket=512, dtype=jnp.float32)
        for p, a in zip(positions, attr_seq)
    ]
    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, dtype=jnp.float32)
    streams, _ = sc.encode_sequence(frames, steps=0.002)
    assert streams[1].inter

    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    served = list(serve_sequence(
        streams, vms, Kms, bg, width=SIZE, height=SIZE,
        positions=positions, bucket=64, **RASTER,  # 320 then 192 slots
    ))
    recons = sc.decode_sequence(streams, frames)
    voxel_size = jnp.float32(frames[0].width / side)
    vmin = jnp.asarray(frames[0].vmin, jnp.float32)
    for (imgs, _, _), frame, rec in zip(served, frames, recons):
        full = np.zeros((frame.codes.shape[0], rec.shape[1]))
        full[: frame.n_voxels] = rec
        scene = _scene_from_attrs(
            jnp.asarray(full, jnp.float32), frame.codes, frame.weights,
            voxel_size, vmin, DEPTH)
        ref, _, _ = _render_scene_views(
            scene, vms, Kms, bg, width=SIZE, height=SIZE, **RASTER)
        np.testing.assert_allclose(np.asarray(imgs), np.asarray(ref),
                                   atol=2e-4)


def test_sparse_upload_tier(rng, monkeypatch):
    """The sparse wire tier (round 5): mostly-zero matrices ship
    (indices, values) and the device scatter rebuilds the EXACT dense
    matrix; the packer picks whichever representation is smaller."""
    from raht3dgs_tpu.models.pipeline import (
        pack_quantized_upload,
        upload_quantized,
    )

    # 1% density, values crossing all three dtypes
    for hi, vdt in ((100, np.int8), (20_000, np.int16),
                    (1 << 20, np.int32)):
        vals = np.zeros((56, 2048), dtype=np.int32)
        flat = vals.reshape(-1)
        pos = rng.choice(flat.size, size=flat.size // 100, replace=False)
        flat[pos] = rng.integers(1, hi, size=pos.size)
        flat[pos[0]] = hi - 1  # pin the dtype tier
        up = pack_quantized_upload(vals)
        assert up.shape == (56, 2048), "sparse tier should win at 1%"
        assert up.vals.dtype == vdt
        dense = np.asarray(upload_quantized(up)).astype(np.int32)
        np.testing.assert_array_equal(dense, vals)

    # all-zero matrix: sparse tier, rebuilds exact zeros
    z = np.zeros((8, 256), dtype=np.int32)
    up = pack_quantized_upload(z)
    assert up.shape == (8, 256)
    np.testing.assert_array_equal(
        np.asarray(upload_quantized(up)).astype(np.int32), z)

    # dense content must NOT take the sparse tier
    d = rng.integers(-100, 100, size=(8, 256)).astype(np.int32)
    d[d == 0] = 1
    assert pack_quantized_upload(d).shape is None

    # kill-switch
    s = np.zeros((8, 256), dtype=np.int32)
    s[0, 3] = 7
    monkeypatch.setenv("RAHT3DGS_UPLOAD_SPARSE", "0")
    assert pack_quantized_upload(s).shape is None
    monkeypatch.delenv("RAHT3DGS_UPLOAD_SPARSE")
    assert pack_quantized_upload(s).shape == (8, 256)


def test_sparse_upload_through_serve_frame(rng):
    """A sparse quantized matrix serves bitwise identically through the
    sparse wire tier and a forced dense upload."""
    from raht3dgs_tpu.models.pipeline import (
        pack_quantized_upload,
        upload_quantized,
    )

    frame, vals_T, inv, steps, vs, vmin = _make_served_frame(rng)
    vals_T = vals_T.copy()
    vals_T[:, 16:] = 0  # mostly-zero: the sparse tier engages
    up = pack_quantized_upload(vals_T)
    assert up.shape is not None
    vms, Kms = _cameras(2)
    bg = jnp.ones((3,), jnp.float32)
    kw = dict(depth=DEPTH, width=SIZE, height=SIZE, **RASTER)
    a = serve_frame(upload_quantized(up), inv, steps, frame.codes,
                    frame.weights, vs, vmin, vms, Kms, bg, **kw)
    b = serve_frame(jnp.asarray(vals_T), inv, steps, frame.codes,
                    frame.weights, vs, vmin, vms, Kms, bg, **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
