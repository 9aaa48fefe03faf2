"""Beyond-reference features COMPOSE: one flag-product end-to-end test.

Encodes a short temporally-correlated sequence with EVERY beyond-reference
encode flag at once — ``--inter --predict --code-geometry --entropy-chunk
--quant-mode deadzone --entropy auto --save-sequence`` — then exercises
the full decode surface on the resulting .r3ts: all-frames decode, random
access to a P-frame, ``--progressive``, ``--lod``, and ``--geometry-lod``.
A second product covers the intra-only axis: ``--tiles --predict
--entropy auto`` through encode_ply + ROI decode. Pins that the features
compose rather than merely coexist (each is tested alone elsewhere)."""

import os

import numpy as np
import pytest

from raht3dgs_tpu.io.ply import save_ply_ascii
from raht3dgs_tpu.ops.prelude import morton_codes_np

DEPTH = 5
N_FRAMES = 4


@pytest.fixture(scope="module")
def composed(tmp_path_factory):
    """Encode once (module scope — the decode tests share the stream)."""
    tmp_path = tmp_path_factory.mktemp("compose")
    rng = np.random.default_rng(7)
    d = tmp_path / "8iVFBv2" / "loot" / "Ply"
    d.mkdir(parents=True)
    base = rng.integers(0, 2**DEPTH, (900, 3))
    cols = rng.integers(0, 255, (900, 3))
    originals = []
    for k in range(N_FRAMES):
        pts = np.clip(base + k, 0, 2**DEPTH - 1)  # drifting cloud
        _, first = np.unique(morton_codes_np(pts, DEPTH), return_index=True)
        originals.append((pts[first], cols[first]))
        save_ply_ascii(
            d / f"loot_vox10_{1000 + k:04d}.ply", pts[first].astype(float),
            cols[first].astype(float), width=2**DEPTH - 1,
        )

    from raht3dgs_tpu.cli.encode_dataset import main as enc_main

    seq = tmp_path / "seq.r3ts"
    rc = enc_main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(tmp_path), "--frames", "1", str(N_FRAMES),
        "--steps", "2",
        "--inter", "--predict", "--code-geometry", "--entropy-chunk", "128",
        "--quant-mode", "deadzone", "--entropy", "auto",
        "--save-sequence", str(seq),
        "--platform", "cpu", "--csv", str(tmp_path / "runtime.csv"),
    ])
    assert rc == 0 and seq.exists()
    return tmp_path, seq, originals


def _decode(args):
    from raht3dgs_tpu.cli.decode import main as dec_main

    assert dec_main([*args, "--platform", "cpu"]) == 0


def _read_ply(path):
    from raht3dgs_tpu.io.ply import read_ply_8i

    V, C, _ = read_ply_8i(str(path))
    return np.asarray(V), np.asarray(C)


def test_stream_carries_every_feature(composed):
    """The container actually records the full flag product (not silently
    dropping one), including at least one true P-frame."""
    tmp_path, seq, _ = composed
    from raht3dgs_tpu.codec.bitstream import SequenceReader

    reader = SequenceReader(str(seq))
    assert len(reader) == N_FRAMES
    streams = [reader.frame(i) for i in range(N_FRAMES)]
    assert all(s.geometry is not None for s in streams)
    assert all(s.chunk == 128 for s in streams)
    assert all(s.quant_mode == "deadzone" for s in streams)
    assert not streams[0].inter  # first frame is the I-frame
    assert any(s.inter for s in streams[1:]), (
        "adaptive fallback chose intra for every frame — the drifting-"
        "cloud fixture should produce P-frames"
    )
    assert all(s.predict for s in streams)  # --predict rode every frame
    # --entropy auto recorded per channel (v5 map) wherever RAC won; at
    # this tiny scale RLGR may win every channel, but the flag must not
    # corrupt anything — decode tests below pin correctness either way
    assert all(s.entropy_map is None or len(s.entropy_map) == 3
               for s in streams)
    # geometry profile discipline: intra frames must carry intra geometry
    # (random access), P-frames may use temporal geometry profiles
    for s in streams:
        prof = s.geometry[0]
        if not s.inter:
            assert prof in (0, 3), f"intra frame has temporal geometry {prof}"


def test_all_frames_decode_self_contained(composed):
    """--all-frames, NO --positions (geometry sections supply them):
    every frame reconstructs near the original."""
    tmp_path, seq, originals = composed
    out = tmp_path / "dec_{i}.ply"
    _decode(["--stream", str(seq), "--all-frames",
             "--output", str(out), "--color-space", "yuv"])
    for i, (V0, C0) in enumerate(originals):
        V, C = _read_ply(str(out).replace("{i}", str(i)))
        assert V.shape == V0.shape
        # positions are lossless (geometry section); compare as sets via
        # Morton order
        o = np.argsort(morton_codes_np(V0.astype(np.int64), DEPTH))
        np.testing.assert_array_equal(V.astype(np.int64), V0[o])
        # step-2 quantization + YUV<->RGB roundtrip (int truncation)
        mse = np.mean((C.astype(float) - C0[o].astype(float)) ** 2)
        assert mse < 16.0, f"frame {i}: mse {mse}"


def test_random_access_matches_all_frames(composed):
    """Decoding one P-frame by index == the same frame from the full
    sequence decode, byte-for-byte."""
    tmp_path, seq, _ = composed
    idx = N_FRAMES - 1
    full = tmp_path / "ra_full_{i}.ply"
    one = tmp_path / "ra_one.ply"
    _decode(["--stream", str(seq), "--all-frames",
             "--output", str(full), "--color-space", "yuv"])
    _decode(["--stream", str(seq), "--frame-index", str(idx),
             "--output", str(one), "--color-space", "yuv"])
    a = open(str(full).replace("{i}", str(idx)), "rb").read()
    b = open(one, "rb").read()
    assert a == b


def test_progressive_on_composed_stream(composed):
    """--progressive on the I-frame of the composed stream (chunked
    entropy => the prefix is byte-addressable)."""
    tmp_path, seq, originals = composed
    fullp = tmp_path / "prog_full.ply"
    prog = tmp_path / "prog_k.ply"
    _decode(["--stream", str(seq), "--frame-index", "0",
             "--output", str(fullp), "--color-space", "yuv"])
    _decode(["--stream", str(seq), "--frame-index", "0",
             "--progressive", "40", "--output", str(prog),
             "--color-space", "yuv"])
    _, Cf = _read_ply(fullp)
    _, Cp = _read_ply(prog)
    assert Cf.shape == Cp.shape
    assert np.mean((Cf.astype(float) - Cp.astype(float)) ** 2) > 0


def test_lod_on_composed_stream(composed):
    tmp_path, seq, originals = composed
    lod = tmp_path / "lod3.ply"
    _decode(["--stream", str(seq), "--frame-index", "0", "--lod", "3",
             "--output", str(lod), "--color-space", "yuv"])
    V, C = _read_ply(lod)
    V0 = originals[0][0]
    want = np.unique(
        morton_codes_np(V0.astype(np.int64), DEPTH) >> np.int64(6)
    ).size
    assert len(V) == want  # one point per occupied level-3 cell
    assert V.max() < 2**3


def test_geometry_lod_positions_preview(composed):
    tmp_path, seq, originals = composed
    out = tmp_path / "glod.ply"
    _decode(["--stream", str(seq), "--frame-index", "0",
             "--geometry-lod", "3", "--output", str(out)])
    from raht3dgs_tpu.io.ply import read_ply

    V = np.stack([read_ply(str(out)).vertices[n] for n in "xyz"], axis=1)
    V0 = originals[0][0]
    want = np.unique(
        morton_codes_np(V0.astype(np.int64), DEPTH) >> np.int64(6)
    ).size
    # positions-only preview, cell centers scaled onto the full-depth grid
    assert len(V) == want and V.max() < 2**DEPTH


def test_random_access_replays_encoder_dtype(tmp_path):
    """A float32-encoded inter sequence decoded with the CLI's default
    float64 flag: both --all-frames and P-frame random access must build
    frames with the STREAM's dtype (flag bit 7 — the closed loop needs
    the encoder's precision), so their outputs stay byte-identical."""
    rng = np.random.default_rng(11)
    d = tmp_path / "8iVFBv2" / "loot" / "Ply"
    d.mkdir(parents=True)
    base = rng.integers(0, 2**DEPTH, (700, 3))
    cols = rng.integers(0, 255, (700, 3))
    for k in range(3):
        pts = np.clip(base + k, 0, 2**DEPTH - 1)
        _, first = np.unique(morton_codes_np(pts, DEPTH), return_index=True)
        save_ply_ascii(
            d / f"loot_vox10_{1000 + k:04d}.ply", pts[first].astype(float),
            cols[first].astype(float), width=2**DEPTH - 1,
        )
    from raht3dgs_tpu.cli.encode_dataset import main as enc_main

    seq = tmp_path / "seq32.r3ts"
    assert enc_main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(tmp_path), "--frames", "1", "3",
        "--steps", "2", "--inter", "--code-geometry",
        "--dtype", "float32",
        "--save-sequence", str(seq),
        "--platform", "cpu", "--csv", str(tmp_path / "rt.csv"),
    ]) == 0
    from raht3dgs_tpu.codec.bitstream import SequenceReader

    streams = [SequenceReader(str(seq)).frame(i) for i in range(3)]
    assert all(s.dtype32 for s in streams)
    assert any(s.inter for s in streams[1:]), "fixture produced no P-frame"
    idx = max(i for i, s in enumerate(streams) if s.inter)
    full = tmp_path / "f32_{i}.ply"
    one = tmp_path / "f32_one.ply"
    # default --dtype (float64): the decoder must still replay float32
    _decode(["--stream", str(seq), "--all-frames",
             "--output", str(full), "--color-space", "yuv"])
    _decode(["--stream", str(seq), "--frame-index", str(idx),
             "--output", str(one), "--color-space", "yuv"])
    a = open(str(full).replace("{i}", str(idx)), "rb").read()
    assert a == open(one, "rb").read()


def test_tiles_compose_with_predict_and_auto_entropy(tmp_path):
    """The intra-only flag product: --tiles --predict --entropy auto
    --quant-mode deadzone through encode_ply, then full + ROI decode of
    the .r3tt (every tile stream must carry the predict flag)."""
    rng = np.random.default_rng(3)
    pts = rng.integers(0, 2**DEPTH, (2500, 3))
    _, first = np.unique(morton_codes_np(pts, DEPTH), return_index=True)
    V0 = pts[first]
    C0 = rng.integers(0, 255, (len(V0), 3)).astype(float)
    src = tmp_path / "in.ply"
    save_ply_ascii(src, V0.astype(float), C0, width=2**DEPTH - 1)

    from raht3dgs_tpu.cli.encode_ply import main as enc_main

    out = tmp_path / "streams"
    assert enc_main([
        "--input", str(src), "--depth", str(DEPTH), "--steps", "2",
        "--tiles", "2", "--predict", "--entropy", "auto",
        "--quant-mode", "deadzone", "--code-geometry",
        "--save-streams", str(out),
        "--platform", "cpu", "--csv", str(tmp_path / "t.csv"),
    ]) == 0
    blobs = sorted(out.glob("*.r3tt"))
    assert blobs
    from raht3dgs_tpu.models.tiling import TiledReader, decode_tiled_frame

    reader = TiledReader(blobs[0].read_bytes())
    assert len(reader) > 1
    assert all(reader.tile(i).predict for i in range(len(reader)))
    assert all(reader.tile(i).quant_mode == "deadzone"
               for i in range(len(reader)))
    V, A = decode_tiled_frame(blobs[0].read_bytes())
    assert len(V) == len(V0)
    # ROI decode touches only the intersecting bricks and stays finite
    half = 2 ** (DEPTH - 1)
    Vr, Ar = decode_tiled_frame(
        blobs[0].read_bytes(), roi=((0, 0, 0), (half, half, half))
    )
    assert len(Vr) <= len(V0) and np.isfinite(Ar).all()
    want = np.all(V0 < half, axis=1).sum()
    assert len(Vr) == want
