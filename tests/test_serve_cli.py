"""Serving CLI: compressed container in, PNG views out.

Covers the three container kinds (.r3tc / .r3ts / .r3tt) autodetected by
magic, geometry-section-driven positions (no side channel), and the
non-3DGS guard. The underlying serving programs are pinned against
normative decodes in test_serving.py; here we assert the driver surface:
exit codes, file layout, and the JSON summary line.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from raht3dgs_tpu.ops.morton import morton_decode
from raht3dgs_tpu.ops.prelude import morton_codes_np

DEPTH = 5
ARGS = ["--views", "2", "--size", "64", "--max-per-tile", "512"]


@pytest.fixture(scope="module")
def gs_scene():
    rng = np.random.default_rng(7)
    pts = rng.integers(2, 2**DEPTH - 3, size=(900, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:160]
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
    return pos, attrs


def _run(argv):
    from raht3dgs_tpu.cli.serve import main

    return main(argv)


def test_serve_r3tc_frame(gs_scene, tmp_path):
    from raht3dgs_tpu.codec.geometry import geometry_from_positions

    pos, attrs = gs_scene
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    frame = prepare_voxel_frame(pos, attrs, DEPTH, bucket=64,
                                dtype=jnp.float32)
    stream = codec.encode(frame, 0.002).stream
    stream.geometry = geometry_from_positions(pos, DEPTH)
    path = tmp_path / "frame.r3tc"
    path.write_bytes(stream.to_bytes())
    out = tmp_path / "views"
    rc = _run(["--stream", str(path), "--out", str(out), *ARGS])
    assert rc == 0
    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 2
    from PIL import Image

    assert Image.open(pngs[0]).size == (64, 64)


def test_serve_r3ts_sequence_u8(gs_scene, tmp_path, capsys):
    from raht3dgs_tpu.codec.bitstream import write_sequence
    from raht3dgs_tpu.codec.geometry import geometry_from_positions
    from raht3dgs_tpu.models.temporal import SequenceCodec

    pos, attrs = gs_scene
    positions = [pos, np.clip(pos + [1, 0, -1], 0, 2**DEPTH - 1)]
    frames = [
        prepare_voxel_frame(p, attrs, DEPTH, bucket=64, dtype=jnp.float32)
        for p in positions
    ]
    sc = SequenceCodec(DEPTH, gop=8, adaptive=False, dtype=jnp.float32)
    streams, _ = sc.encode_sequence(frames, steps=0.002)
    for s, p in zip(streams, positions):
        s.geometry = geometry_from_positions(p, DEPTH)
    path = tmp_path / "seq.r3ts"
    write_sequence(path, streams)
    out = tmp_path / "views"
    rc = _run(["--stream", str(path), "--out", str(out), "--u8", *ARGS])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["frames"] == 2 and rec["images"] == 4
    assert len(sorted(out.glob("*.png"))) == 4


def test_serve_r3tt_tiled(gs_scene, tmp_path, capsys):
    from raht3dgs_tpu.models.tiling import encode_tiled_frame

    pos, attrs = gs_scene
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    blob, stats = encode_tiled_frame(
        pos, attrs, DEPTH, 1, codec, 0.002, code_geometry=True,
        vmin=np.array([-1.0, -1.0, -1.0]), width=2.0,
    )
    path = tmp_path / "frame.r3tt"
    path.write_bytes(blob)
    out = tmp_path / "views"
    rc = _run(["--stream", str(path), "--out", str(out), "--margin", "4.0",
               *ARGS])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["container"] == "r3tt"
    assert rec["bricks_served"] == len(stats)  # huge margin keeps all
    assert len(sorted(out.glob("*.png"))) == 2


def test_serve_rejects_color_stream(tmp_path, capsys):
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 2**DEPTH, size=(400, 3))
    codes = np.unique(morton_codes_np(pts, DEPTH))[:100]
    pos = np.asarray(
        morton_decode(jnp.asarray(codes.astype(np.int32)), DEPTH))
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    frame = prepare_voxel_frame(pos, rng.normal(size=(len(pos), 3)),
                                DEPTH, bucket=64, dtype=jnp.float32)
    stream = codec.encode(frame, 4.0).stream
    path = tmp_path / "color.r3tc"
    path.write_bytes(stream.to_bytes())
    rc = _run(["--stream", str(path), "--out", str(tmp_path / "v"), *ARGS])
    assert rc == 2
    assert "3DGS" in capsys.readouterr().err


def test_serve_r3tt_roi(gs_scene, tmp_path, capsys):
    """--roi maps to TiledReader.select_roi: only intersecting bricks
    decode, and the render still succeeds on the subset scene."""
    from raht3dgs_tpu.models.tiling import TiledReader, encode_tiled_frame

    pos, attrs = gs_scene
    codec = AttributeCodec(DEPTH, dtype=jnp.float32)
    blob, stats = encode_tiled_frame(
        pos, attrs, DEPTH, 1, codec, 0.002, code_geometry=True,
        vmin=np.array([-1.0, -1.0, -1.0]), width=2.0,
    )
    path = tmp_path / "frame.r3tt"
    path.write_bytes(blob)
    h = 2 ** (DEPTH - 1)
    want = TiledReader(blob).select_roi((0, 0, 0), (h, h, h))
    out = tmp_path / "views"
    rc = _run(["--stream", str(path), "--out", str(out),
               "--roi", "0", "0", "0", str(h), str(h), str(h), *ARGS])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["bricks_served"] == len(want) < len(stats)
    assert len(sorted(out.glob("*.png"))) == 2


def test_serve_progressive_inter_previews_iframes(gs_scene, tmp_path,
                                                  capsys):
    """--progressive on an INTER sequence serves the I-frames only
    (random-access preview at GOP cadence), keeping original frame
    numbers — the round-4 verdict's unserved case."""
    from raht3dgs_tpu.codec.bitstream import write_sequence
    from raht3dgs_tpu.codec.geometry import geometry_from_positions
    from raht3dgs_tpu.models.temporal import SequenceCodec

    pos, attrs = gs_scene
    positions = [pos,
                 np.clip(pos + [1, 0, -1], 0, 2**DEPTH - 1),
                 np.clip(pos + [2, 0, -2], 0, 2**DEPTH - 1),
                 np.clip(pos + [3, 0, -3], 0, 2**DEPTH - 1)]
    frames = [
        prepare_voxel_frame(p, attrs, DEPTH, bucket=64, dtype=jnp.float32)
        for p in positions
    ]
    # gop=2 -> frames 0 and 2 are intra, 1 and 3 inter
    sc = SequenceCodec(DEPTH, gop=2, adaptive=False, dtype=jnp.float32)
    streams, _ = sc.encode_sequence(frames, steps=0.002)
    assert [s.inter for s in streams] == [False, True, False, True]
    for s, p in zip(streams, positions):
        s.geometry = geometry_from_positions(p, DEPTH)
    path = tmp_path / "seq.r3ts"
    write_sequence(path, streams)
    out = tmp_path / "views"
    rc = _run(["--stream", str(path), "--out", str(out),
               "--progressive", "64", *ARGS])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["frames"] == 2  # the two I-frames
    names = sorted(p.name for p in out.glob("*.png"))
    # original indices 0 and 2 preserved in the filenames
    assert any("0000" in n for n in names)
    assert any("0002" in n for n in names)
    assert not any("0001" in n or "0003" in n for n in names)
