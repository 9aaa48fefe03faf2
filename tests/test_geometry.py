"""Geometry entropy coder: roundtrips, backend byte-identity, corruption.

The automaton in native/geom.cpp and codec/_geom_py.py is frozen stream
format (geometry profile 0) — these tests pin the two backends to each
other byte-for-byte and the roundtrip to exactness.
"""

import numpy as np
import pytest

from raht3dgs_tpu.codec import _geom_py, geometry
from raht3dgs_tpu.ops.octree import octree_serialize


def _random_codes(rng, n, depth):
    hi = min(1 << (3 * depth), 1 << 62)
    c = rng.integers(0, hi, size=n * 2, dtype=np.int64).astype(np.uint64)
    return np.unique(c)[:n]


def _surface_codes(depth, n=4000, seed=3):
    from raht3dgs_tpu.ops.morton import morton_encode
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    half = 1 << (depth - 1)
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = 0.8 * half + rng.normal(0, 1.0, n)
    pts = np.stack(
        [
            half + r * np.sin(theta) * np.cos(phi),
            half + r * np.sin(theta) * np.sin(phi),
            half + r * np.cos(theta),
        ],
        -1,
    )
    V = np.unique(np.clip(pts, 0, 2 * half - 1).astype(np.int64), axis=0)
    return np.unique(np.asarray(morton_encode(jnp.asarray(V), depth)))


@pytest.mark.parametrize("depth", [1, 3, 10, 21])
@pytest.mark.parametrize("n", [1, 5, 300])
def test_roundtrip_random(depth, n):
    rng = np.random.default_rng(depth * 100 + n)
    codes = _random_codes(rng, n, depth)
    sec = geometry.encode_geometry(codes, depth)
    back = geometry.decode_geometry(sec, depth, codes.size, dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)


def test_roundtrip_surface_and_rate():
    depth = 8
    codes = _surface_codes(depth)
    sec = geometry.encode_geometry(codes, depth)
    back = geometry.decode_geometry(sec, depth, codes.size, dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)
    # entropy coding must beat both raw codes and uncoded occupancy bytes
    occ = octree_serialize(codes, depth)
    assert len(sec) < occ.size
    assert len(sec) * 8 < codes.size * 3 * depth


def test_default_dtype_matches_morton_tier():
    codes10 = _surface_codes(10, n=500)
    sec = geometry.encode_geometry(codes10, 10)
    assert geometry.decode_geometry(sec, 10, codes10.size).dtype == np.int32
    codes12 = _random_codes(np.random.default_rng(0), 100, 12)
    sec = geometry.encode_geometry(codes12, 12)
    assert geometry.decode_geometry(sec, 12, 100).dtype == np.int64


def test_backend_byte_identity():
    if not geometry.native_available():
        pytest.skip("native geometry coder unavailable")
    for depth, n, seed in [(2, 3, 0), (6, 200, 1), (10, 2000, 2), (21, 64, 3)]:
        codes = _random_codes(np.random.default_rng(seed), n, depth)
        occ = octree_serialize(codes, depth)
        nat = geometry._encode_occ(occ, depth)
        py = _geom_py.encode(occ, depth)
        assert nat == py, f"encoder mismatch at depth={depth} n={n}"
        # python decoder reads the native stream and vice versa
        cap = codes.size * depth + 1
        np.testing.assert_array_equal(_geom_py.decode(nat, depth, cap), occ)
        np.testing.assert_array_equal(
            geometry._decode_occ(py, depth, cap), occ
        )


def test_python_fallback_roundtrip(monkeypatch):
    monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
    codes = _surface_codes(6, n=800)
    sec = geometry.encode_geometry(codes, 6)
    back = geometry.decode_geometry(sec, 6, codes.size, dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)


def test_decode_rejects_corruption():
    codes = _surface_codes(8, n=1000)
    sec = geometry.encode_geometry(codes, 8)
    # wrong leaf count in the header
    with pytest.raises(ValueError, match="corrupt|capacity|exceeds"):
        geometry.decode_geometry(sec, 8, codes.size - 5)
    # unknown profile byte
    with pytest.raises(ValueError, match="profile"):
        geometry.decode_geometry(b"\x07" + sec[1:], 8, codes.size)
    # empty section
    with pytest.raises(ValueError, match="empty"):
        geometry.decode_geometry(b"", 8, codes.size)
    # garbage payload must raise, never return wrong geometry silently
    rng = np.random.default_rng(0)
    garbage = bytes([0]) + rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    with pytest.raises(ValueError):
        geometry.decode_geometry(garbage, 8, codes.size)


def test_encode_rejects_bad_walk():
    # occupancy byte array inconsistent with the self-framing walk
    with pytest.raises(ValueError):
        geometry._encode_occ(np.array([3, 1], dtype=np.uint8), 3)
    with pytest.raises(ValueError):
        geometry._encode_occ(np.array([0], dtype=np.uint8), 1)


# -- container v4 + self-contained CLI decode ---------------------------------


def test_container_v4_roundtrip():
    from raht3dgs_tpu.codec.bitstream import FrameStream

    codes = _surface_codes(6, n=600)
    geom = geometry.encode_geometry(codes, 6)
    st = FrameStream(
        depth=6, n_voxels=codes.size, steps=np.array([2.0]),
        channels=[b"abc", b"defg"], geometry=geom,
    )
    blob = st.to_bytes()
    assert blob[4] == 4  # VERSION_GEOM
    back = FrameStream.from_bytes(blob)
    assert back.geometry == geom
    assert back.channels == [b"abc", b"defg"]
    np.testing.assert_array_equal(
        geometry.decode_geometry(back.geometry, 6, codes.size,
                                 dtype=codes.dtype),
        codes,
    )
    # geometry charged separately from the reference's attribute rate
    assert back.bpp() == st.payload_bytes * 8.0 / codes.size
    assert back.geometry_bpp() == len(geom) * 8.0 / codes.size
    assert back.total_bpp() == back.bpp() + back.geometry_bpp()
    # attribute rate never includes geometry bytes
    no_geom = FrameStream(
        depth=6, n_voxels=codes.size, steps=np.array([2.0]),
        channels=[b"abc", b"defg"],
    )
    assert back.bpp() == no_geom.bpp()


def test_container_v4_with_deadzone_and_motion():
    from raht3dgs_tpu.codec.bitstream import FrameStream

    codes = _surface_codes(5, n=200)
    geom = geometry.encode_geometry(codes, 5)
    st = FrameStream(
        depth=5, n_voxels=codes.size, steps=np.array([1.0]),
        channels=[b"xy"], quant_mode="deadzone", quant_f=0.3,
        rec_delta=0.12, inter=True, probes=27, motion=b"MOTIONBYTES",
        geometry=geom, chunk=64,
    )
    back = FrameStream.from_bytes(st.to_bytes())
    assert back.geometry == geom and back.motion == b"MOTIONBYTES"
    assert back.quant_mode == "deadzone" and back.inter and back.probes == 27
    assert back.chunk == 64


def test_container_v4_truncation_rejected():
    from raht3dgs_tpu.codec.bitstream import FrameStream

    codes = _surface_codes(5, n=200)
    st = FrameStream(
        depth=5, n_voxels=codes.size, steps=np.array([1.0]),
        channels=[b"xy"], geometry=geometry.encode_geometry(codes, 5),
    )
    blob = st.to_bytes()
    # cut inside the geometry section
    cut = len(blob) - len(st.channels[0]) - 4 - 10
    with pytest.raises(ValueError, match="truncated"):
        FrameStream.from_bytes(blob[:cut])


def test_default_streams_stay_v2():
    # attribute-only streams must remain byte-identical to pre-v4 writers
    from raht3dgs_tpu.codec.bitstream import FrameStream

    st = FrameStream(depth=5, n_voxels=10, steps=np.array([1.0]),
                     channels=[b"xy"])
    assert st.to_bytes()[4] == 2


def test_cli_self_contained_decode(tmp_path):
    import subprocess
    import sys

    from raht3dgs_tpu.io.ply import read_ply_8i, save_ply_ascii
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    rng = np.random.default_rng(11)
    depth = 5
    lim = 1 << depth
    pts = np.unique(rng.integers(0, lim, size=(500, 3)), axis=0)
    rgb = (pts * 7 % 256).astype(int)
    ply = tmp_path / "f.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=lim - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2",
         "--csv", str(tmp_path / "e.csv"), "--platform", "cpu",
         "--bucket", "512", "--save-streams", str(tmp_path),
         "--code-geometry"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "geometry" in out.stdout  # rate printed
    # decode WITHOUT --positions: the stream is self-contained
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "frame0001_step2.r3tc"),
         "--output", str(tmp_path / "rec.ply"),
         "--platform", "cpu", "--bucket", "512"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    V2, C2, _ = read_ply_8i(tmp_path / "rec.ply")
    # positions come back exactly, in Morton order
    order = np.argsort(morton_codes_np(pts.astype(np.int64), depth),
                       kind="stable")
    np.testing.assert_array_equal(V2.astype(np.int64), pts[order])
    assert np.abs(C2.astype(float) - rgb[order].astype(float)).mean() < 3.0
    # decoding a geometry-free stream without positions fails loudly
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2",
         "--csv", str(tmp_path / "e2.csv"), "--platform", "cpu",
         "--bucket", "512", "--save-streams", str(tmp_path / "nog")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "nog" / "frame0001_step2.r3tc"),
         "--output", str(tmp_path / "rec2.ply"),
         "--platform", "cpu", "--bucket", "512"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "no geometry section" in out.stderr


# -- temporal profile (profile 1) ----------------------------------------------


def _shifted_codes(codes, depth, shift=(1, 0, 0)):
    """Deterministically deform a cloud: translate, clip, dedup."""
    from raht3dgs_tpu.ops.morton import morton_decode, morton_encode
    import jax.numpy as jnp

    V = np.asarray(morton_decode(jnp.asarray(codes.astype(np.int64)), depth))
    V = np.clip(V + np.array(shift), 0, (1 << depth) - 1)
    return np.unique(np.asarray(morton_encode(jnp.asarray(V), depth)))


def test_temporal_roundtrip_and_gain():
    depth = 8
    c0 = _surface_codes(depth, n=6000, seed=5)
    c1 = _shifted_codes(c0, depth)
    sec_intra = geometry.encode_geometry(c1, depth)
    sec_temp = geometry.encode_geometry(c1, depth, prev_codes=c0)
    assert sec_intra[0] == 0 and sec_temp[0] == 1
    # a one-voxel translation leaves most octree bytes predictable
    assert len(sec_temp) < len(sec_intra)
    back = geometry.decode_geometry(sec_temp, depth, c1.size,
                                    dtype=c1.dtype, prev_codes=c0)
    np.testing.assert_array_equal(back, c1)


def test_temporal_needs_prev_codes():
    depth = 6
    c0 = _surface_codes(depth, n=500, seed=1)
    c1 = _shifted_codes(c0, depth)
    sec = geometry.encode_geometry(c1, depth, prev_codes=c0)
    with pytest.raises(ValueError, match="prev_codes"):
        geometry.decode_geometry(sec, depth, c1.size)
    # wrong reference frame desynchronizes the coder contexts; the
    # occupancy crc32 catches it DETERMINISTICALLY
    wrong = _shifted_codes(c0, depth, shift=(7, 3, 1))
    with pytest.raises(ValueError):
        geometry.decode_geometry(sec, depth, c1.size, prev_codes=wrong)


def test_temporal_backend_byte_identity(monkeypatch):
    if not geometry.native_available():
        pytest.skip("native geometry coder unavailable")
    depth = 7
    c0 = _surface_codes(depth, n=1500, seed=2)
    c1 = _shifted_codes(c0, depth, shift=(0, 1, 1))
    nat = geometry.encode_geometry(c1, depth, prev_codes=c0)
    monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
    py = geometry.encode_geometry(c1, depth, prev_codes=c0)
    assert nat == py
    # python decodes the native stream
    back = geometry.decode_geometry(nat, depth, c1.size, dtype=c1.dtype,
                                    prev_codes=c0)
    np.testing.assert_array_equal(back, c1)
    monkeypatch.delenv("RAHT3DGS_GEOM_NATIVE")
    back = geometry.decode_geometry(py, depth, c1.size, dtype=c1.dtype,
                                    prev_codes=c0)
    np.testing.assert_array_equal(back, c1)


def test_temporal_chain_over_sequence():
    # closed-loop chain: each frame decodes against the previous DECODED
    # frame, exactly as cli.decode --all-frames replays it
    depth = 7
    codes = [_surface_codes(depth, n=3000, seed=9)]
    for k in range(3):
        codes.append(_shifted_codes(codes[-1], depth, shift=(1, 0, k % 2)))
    prev_enc = None
    secs = []
    for c in codes:
        secs.append(geometry.encode_geometry(c, depth, prev_codes=prev_enc))
        prev_enc = c
    prev_dec = None
    for c, sec in zip(codes, secs):
        dec = geometry.decode_geometry(sec, depth, c.size, dtype=c.dtype,
                                       prev_codes=prev_dec)
        np.testing.assert_array_equal(dec, c)
        prev_dec = dec


def test_profile2_motion_compensated_reference():
    depth = 8
    c0 = _surface_codes(depth, n=6000, seed=5)
    c1 = _shifted_codes(c0, depth, shift=(2, 1, 0))
    sec1 = geometry.encode_geometry(c1, depth, prev_codes=c0)
    sec2 = geometry.encode_geometry(c1, depth, prev_codes=c0,
                                    motion=(2, 1, 0))
    assert sec2[0] == 2
    # a perfectly compensated reference codes (much) smaller
    assert len(sec2) < len(sec1)
    back = geometry.decode_geometry(sec2, depth, c1.size, dtype=c1.dtype,
                                    prev_codes=c0)
    np.testing.assert_array_equal(back, c1)
    # zero motion falls back to profile 1 (no 12-byte header for nothing)
    sec0 = geometry.encode_geometry(c1, depth, prev_codes=c0,
                                    motion=(0, 0, 0))
    assert sec0[0] == 1 and sec0 == sec1
    # truncated motion header rejected
    with pytest.raises(ValueError, match="truncated"):
        geometry.decode_geometry(sec2[:5], depth, c1.size, prev_codes=c0)
    # profile 2 still needs the reference frame
    with pytest.raises(ValueError, match="prev_codes"):
        geometry.decode_geometry(sec2, depth, c1.size)


def test_container_mutation_fuzz():
    """Random truncations and byte flips of a full-featured v4 container
    (chunked + deadzone + inter + motion + geometry) must surface as
    ValueError at worst — never a crash, hang, or non-ValueError
    exception. (Entropy payload flips may legally decode to different
    attributes; the structural sections are all self-checking.)"""
    from raht3dgs_tpu.codec.bitstream import FrameStream

    codes = _surface_codes(6, n=400, seed=4)
    rng = np.random.default_rng(0)
    st = FrameStream(
        depth=6, n_voxels=codes.size, steps=np.array([2.0]),
        channels=[rng.integers(0, 256, 40, dtype=np.uint8).tobytes()
                  for _ in range(3)],
        chunk=64, quant_mode="deadzone", quant_f=0.3, rec_delta=0.1,
        inter=True, probes=27, motion=b"\x04\x00" + b"\x00" * 20,
        geometry=geometry.encode_geometry(codes, 6),
    )
    blob = st.to_bytes()
    for k in range(60):
        cut = int(rng.integers(0, len(blob)))
        try:
            FrameStream.from_bytes(blob[:cut])
        except ValueError:
            pass
    for k in range(60):
        mut = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
        try:
            back = FrameStream.from_bytes(bytes(mut))
            if back.geometry is not None:
                geometry.decode_geometry(back.geometry, back.depth,
                                         back.n_voxels)
        except ValueError:
            pass
    # targeted: the u64 n_voxels field (container bytes 9..16) must never
    # turn into a giant allocation (MemoryError) — ValueError only
    for byte_idx in range(9, 17):
        for val in (0x7F, 0xFF):
            mut = bytearray(blob)
            mut[byte_idx] = val
            try:
                back = FrameStream.from_bytes(bytes(mut))
                if back.geometry is not None:
                    geometry.decode_geometry(back.geometry, back.depth,
                                             back.n_voxels)
            except ValueError:
                pass


def test_v4_inter_without_signalled_motion():
    """The review-found invariant break: a v2-semantics inter stream
    (derived motion, motion=None) with geometry attached must roundtrip —
    v4 writes an explicit zero-length motion section on inter frames."""
    from raht3dgs_tpu.codec.bitstream import FrameStream

    codes = _surface_codes(5, n=150)
    st = FrameStream(
        depth=5, n_voxels=codes.size, steps=np.array([1.0]),
        channels=[b"abc", b"de"], inter=True, probes=27, motion=None,
        geometry=geometry.encode_geometry(codes, 5),
    )
    blob = st.to_bytes()
    back = FrameStream.from_bytes(blob)
    assert back.inter and back.motion is None and back.probes == 27
    assert back.channels == [b"abc", b"de"]
    assert back.geometry == st.geometry
    # and the signalled-motion variant still roundtrips alongside
    st2 = FrameStream(
        depth=5, n_voxels=codes.size, steps=np.array([1.0]),
        channels=[b"abc"], inter=True, motion=b"MV",
        geometry=st.geometry,
    )
    b2 = FrameStream.from_bytes(st2.to_bytes())
    assert b2.motion == b"MV" and b2.geometry == st.geometry


def test_decode_cross_checks_positions_against_geometry(tmp_path):
    """With BOTH a --positions sidecar and an in-stream geometry section,
    decode must reject a wrong sidecar of the right point count."""
    import subprocess
    import sys

    from raht3dgs_tpu.io.ply import save_ply_ascii

    rng = np.random.default_rng(3)
    depth = 5
    lim = 1 << depth
    pts = np.unique(rng.integers(0, lim, size=(400, 3)), axis=0)
    rgb = (pts * 3 % 256).astype(int)
    ply = tmp_path / "f.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=lim - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2",
         "--csv", str(tmp_path / "e.csv"), "--platform", "cpu",
         "--bucket", "512", "--save-streams", str(tmp_path),
         "--code-geometry"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    stream = str(tmp_path / "frame0001_step2.r3tc")
    # correct sidecar passes the cross-check
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", stream, "--positions", str(ply),
         "--output", str(tmp_path / "ok.ply"), "--platform", "cpu"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    # same count, different voxels -> rejected
    wrong = np.clip(pts + 1, 0, lim - 1)
    _, first = np.unique(wrong, axis=0, return_index=True)
    if len(first) != len(pts):  # keep the count equal for the test
        wrong = (pts + np.array([lim // 2, 0, 0])) % lim
    ply2 = tmp_path / "wrong.ply"
    save_ply_ascii(ply2, wrong.astype(float), rgb, width=lim - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", stream, "--positions", str(ply2),
         "--output", str(tmp_path / "bad.ply"), "--platform", "cpu"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "does not match the geometry" in out.stderr


def test_fused_native_paths_byte_identical(monkeypatch):
    """The fused native encode (geom_encode_codes) must produce the exact
    bytes of the two-stage path, and the fused decode must read the
    fallback's streams (and vice versa)."""
    if not geometry.native_available():
        pytest.skip("native geometry coder unavailable")
    for depth, n in [(4, 50), (10, 4000), (21, 300)]:
        codes = _random_codes(np.random.default_rng(depth), n, depth)
        nat = geometry.encode_geometry(codes, depth)
        monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
        py = geometry.encode_geometry(codes, depth)
        back_py = geometry.decode_geometry(nat, depth, codes.size,
                                           dtype=codes.dtype)
        monkeypatch.delenv("RAHT3DGS_GEOM_NATIVE")
        assert nat == py, f"fused encode drifted at depth={depth}"
        back_nat = geometry.decode_geometry(py, depth, codes.size,
                                            dtype=codes.dtype)
        np.testing.assert_array_equal(back_py, codes)
        np.testing.assert_array_equal(back_nat, codes)


# -- ext3-context profiles (profiles 3-5) ----------------------------------------


def _body_codes(depth=8, seed=0, spv=2.0):
    from raht3dgs_tpu.eval.synth import synthetic_body_scan

    V = synthetic_body_scan(depth=depth, seed=seed, n_frames=1,
                            samples_per_voxel=spv)[0][0]
    return geometry.codes_from_positions(V, depth)


def test_ext3_roundtrip_and_gain():
    codes = _body_codes()
    s0 = geometry.encode_geometry(codes, 8, ext3=False)
    s3 = geometry.encode_geometry(codes, 8, ext3=True)
    assert s0[0] == 0 and s3[0] == 3
    # scan-like statistics at realistic size: ext3 must win
    assert len(s3) < len(s0)
    back = geometry.decode_geometry(s3, 8, codes.size, dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)


def test_ext3_auto_threshold():
    codes = _body_codes()
    assert codes.size >= geometry._EXT3_AUTO_MIN
    assert geometry.encode_geometry(codes, 8)[0] == 3
    small = codes[:1000]
    assert geometry.encode_geometry(small, 8)[0] == 0
    # env override forces either family
    import os

    os.environ["RAHT3DGS_GEOM_CONTEXTS"] = "ext3"
    try:
        assert geometry.encode_geometry(small, 8)[0] == 3
        os.environ["RAHT3DGS_GEOM_CONTEXTS"] = "legacy"
        assert geometry.encode_geometry(codes, 8)[0] == 0
    finally:
        del os.environ["RAHT3DGS_GEOM_CONTEXTS"]


@pytest.mark.parametrize("depth", [1, 3, 10, 21])
@pytest.mark.parametrize("n", [1, 5, 300])
def test_ext3_roundtrip_random(depth, n):
    rng = np.random.default_rng(depth * 100 + n)
    codes = _random_codes(rng, n, depth)
    sec = geometry.encode_geometry(codes, depth, ext3=True)
    assert sec[0] == 3
    back = geometry.decode_geometry(sec, depth, codes.size,
                                    dtype=codes.dtype)
    np.testing.assert_array_equal(back, codes)


def test_ext3_backend_byte_identity(monkeypatch):
    """Pins the C n6/ext3 computation to ops/octree.py:level_neighbors6."""
    if not geometry.native_available():
        pytest.skip("native geometry coder unavailable")
    for depth, n, seed in [(2, 3, 0), (6, 200, 1), (10, 2000, 2),
                           (21, 64, 3)]:
        codes = _random_codes(np.random.default_rng(seed), n, depth)
        nat = geometry.encode_geometry(codes, depth, ext3=True)
        monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
        py = geometry.encode_geometry(codes, depth, ext3=True)
        back_py = geometry.decode_geometry(nat, depth, codes.size,
                                           dtype=codes.dtype)
        monkeypatch.delenv("RAHT3DGS_GEOM_NATIVE")
        assert nat == py, f"ext3 encoder mismatch at depth={depth} n={n}"
        np.testing.assert_array_equal(back_py, codes)
        back_nat = geometry.decode_geometry(py, depth, codes.size,
                                            dtype=codes.dtype)
        np.testing.assert_array_equal(back_nat, codes)
    # surface workload too (exercises dense n6 patterns)
    codes = _surface_codes(8, n=3000, seed=9)
    nat = geometry.encode_geometry(codes, 8, ext3=True)
    monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
    py = geometry.encode_geometry(codes, 8, ext3=True)
    monkeypatch.delenv("RAHT3DGS_GEOM_NATIVE")
    assert nat == py


def test_ext3_temporal_roundtrip_identity_and_gain(monkeypatch):
    depth = 8
    c0 = _surface_codes(depth, n=6000, seed=5)
    c1 = _shifted_codes(c0, depth, shift=(2, 1, 0))
    s4 = geometry.encode_geometry(c1, depth, prev_codes=c0, ext3=True)
    s5 = geometry.encode_geometry(c1, depth, prev_codes=c0,
                                  motion=(2, 1, 0), ext3=True)
    assert s4[0] == 4 and s5[0] == 5
    # compensated reference still codes smaller than uncompensated
    assert len(s5) < len(s4)
    for sec in (s4, s5):
        back = geometry.decode_geometry(sec, depth, c1.size,
                                        dtype=c1.dtype, prev_codes=c0)
        np.testing.assert_array_equal(back, c1)
        with pytest.raises(ValueError, match="prev_codes"):
            geometry.decode_geometry(sec, depth, c1.size)
    if geometry.native_available():
        monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
        s4_py = geometry.encode_geometry(c1, depth, prev_codes=c0,
                                         ext3=True)
        s5_py = geometry.encode_geometry(c1, depth, prev_codes=c0,
                                         motion=(2, 1, 0), ext3=True)
        back = geometry.decode_geometry(s4, depth, c1.size, dtype=c1.dtype,
                                        prev_codes=c0)
        monkeypatch.delenv("RAHT3DGS_GEOM_NATIVE")
        assert s4_py == s4 and s5_py == s5
        np.testing.assert_array_equal(back, c1)
    # zero motion falls back to profile 4 (no 12-byte header for nothing)
    s40 = geometry.encode_geometry(c1, depth, prev_codes=c0,
                                   motion=(0, 0, 0), ext3=True)
    assert s40[0] == 4 and s40 == s4


def test_ext3_decode_rejects_corruption():
    codes = _body_codes()
    sec = geometry.encode_geometry(codes, 8, ext3=True)
    assert sec[0] == 3
    with pytest.raises(ValueError, match="corrupt|capacity|exceeds"):
        geometry.decode_geometry(sec, 8, codes.size - 5)
    # flip a payload byte: crc32 must catch whatever still walks
    mut = bytearray(sec)
    mut[len(mut) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        geometry.decode_geometry(bytes(mut), 8, codes.size)


def test_ext3_temporal_chain_over_sequence():
    # closed-loop chain with the ext3 profiles, as cli.decode replays it
    depth = 8
    from raht3dgs_tpu.eval.synth import synthetic_body_scan

    frames = synthetic_body_scan(depth=depth, seed=1, n_frames=3,
                                 samples_per_voxel=1.0)
    codes = [geometry.codes_from_positions(V, depth) for V, _ in frames]
    prev_enc = None
    secs = []
    for c in codes:
        secs.append(geometry.encode_geometry(c, depth, prev_codes=prev_enc,
                                             ext3=True))
        prev_enc = c
    assert secs[0][0] == 3 and all(s[0] == 4 for s in secs[1:])
    prev_dec = None
    for c, sec in zip(codes, secs):
        dec = geometry.decode_geometry(sec, depth, c.size, dtype=c.dtype,
                                       prev_codes=prev_dec)
        np.testing.assert_array_equal(dec, c)
        prev_dec = dec


def test_ctxsim_matches_real_coder():
    """The committed adaptive-coding simulator (native/ctxsim.cpp via
    scripts/exp_geom_contexts.py) must reproduce the real coder's output
    size: the docs' context-model verdicts rest on it. Bank-only model ==
    profile 0 bytes, ext3 model == profile 3 bytes (the range coder adds
    <0.2% framing overhead at these sizes)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    try:
        import exp_geom_contexts as egc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"experiment module unavailable: {e}")
    if egc._sim.load() is None:
        pytest.skip("ctxsim native kernel unavailable")
    codes = _body_codes()
    d = egc.decisions(codes, 8)
    for model, profile_bytes in [
        ("bank8.tree", geometry.encode_geometry(codes, 8, ext3=False)),
        ("bank8.ext3.tree", geometry.encode_geometry(codes, 8, ext3=True)),
    ]:
        ctx, n_ctx = egc.MODELS[model](d, 8)
        sim_bits = egc.sim_bits(ctx, d["bits"], n_ctx)
        actual_bits = (len(profile_bytes) - 5) * 8  # profile byte + crc32
        assert abs(sim_bits - actual_bits) / actual_bits < 0.005, (
            model, sim_bits, actual_bits)


# -- level-of-detail (prefix-level) decode --------------------------------------
# decode_geometry_lod walks only octree levels 0..L-1 and returns the node
# codes at depth L: ground truth is unique(codes >> 3*(depth-L)). Covers
# all six profiles and both backends (streams are byte-identical, so the
# python backend re-reads the native encoder's bytes).


def _lod_truth(codes, depth, level):
    return np.unique(codes.astype(np.uint64) >> np.uint64(3 * (depth - level)))


@pytest.mark.parametrize("ext3", [False, True])
def test_geometry_lod_intra(ext3, monkeypatch):
    depth = 8
    codes = _surface_codes(depth, n=5000, seed=11)
    sec = geometry.encode_geometry(codes, depth, ext3=ext3)
    assert sec[0] == (3 if ext3 else 0)
    for level in (1, 2, 4, 6, depth):
        want = _lod_truth(codes, depth, level)
        got = geometry.decode_geometry_lod(sec, depth, codes.size, level)
        np.testing.assert_array_equal(got.astype(np.uint64), want)
        monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
        got_py = geometry.decode_geometry_lod(sec, depth, codes.size, level)
        monkeypatch.delenv("RAHT3DGS_GEOM_NATIVE")
        np.testing.assert_array_equal(got_py.astype(np.uint64), want)


@pytest.mark.parametrize("ext3", [False, True])
@pytest.mark.parametrize("motion", [None, (1, -2, 0)])
def test_geometry_lod_temporal(ext3, motion, monkeypatch):
    depth = 8
    c0 = _surface_codes(depth, n=5000, seed=12)
    c1 = _shifted_codes(c0, depth)
    sec = geometry.encode_geometry(c1, depth, prev_codes=c0, motion=motion,
                                   ext3=ext3)
    for level in (1, 3, 5, depth):
        want = _lod_truth(c1, depth, level)
        got = geometry.decode_geometry_lod(sec, depth, c1.size, level,
                                           prev_codes=c0)
        np.testing.assert_array_equal(got.astype(np.uint64), want)
    monkeypatch.setenv("RAHT3DGS_GEOM_NATIVE", "0")
    got_py = geometry.decode_geometry_lod(sec, depth, c1.size, 4,
                                          prev_codes=c0)
    monkeypatch.delenv("RAHT3DGS_GEOM_NATIVE")
    np.testing.assert_array_equal(got_py.astype(np.uint64),
                                  _lod_truth(c1, depth, 4))


def test_geometry_lod_validates_args():
    depth = 6
    codes = _surface_codes(depth, n=400, seed=13)
    sec = geometry.encode_geometry(codes, depth)
    with pytest.raises(ValueError, match="lod level"):
        geometry.decode_geometry_lod(sec, depth, codes.size, 0)
    with pytest.raises(ValueError, match="lod level"):
        geometry.decode_geometry_lod(sec, depth, codes.size, depth + 1)
    # temporal section without the reference frame
    c1 = _shifted_codes(codes, depth)
    sec_t = geometry.encode_geometry(c1, depth, prev_codes=codes)
    with pytest.raises(ValueError, match="prev_codes"):
        geometry.decode_geometry_lod(sec_t, depth, c1.size, 3)


def test_geometry_lod_temporal_capacity_at_cut_level():
    """The per-level capacity bound applies to the FINAL expansion of a
    temporal LOD walk too, not just the levels before the cut."""
    depth = 8
    c0 = _surface_codes(depth, n=5000, seed=17)
    c1 = _shifted_codes(c0, depth)
    sec = geometry.encode_geometry(c1, depth, prev_codes=c0)
    level = 5
    n_at_cut = _lod_truth(c1, depth, level).size
    n_before = _lod_truth(c1, depth, level - 1).size
    lie = n_at_cut - 1
    assert n_before <= lie  # violation happens only at the cut level
    with pytest.raises(ValueError, match="level walk exceeds"):
        geometry.decode_geometry_lod(sec, depth, lie, level, prev_codes=c0)


def test_geometry_lod_full_level_delegates_with_crc():
    """level == depth goes through the checksum-verified full decode."""
    depth = 6
    codes = _surface_codes(depth, n=400, seed=14)
    sec = bytearray(geometry.encode_geometry(codes, depth))
    sec[3] ^= 0x40  # corrupt the crc field
    with pytest.raises(ValueError, match="checksum"):
        geometry.decode_geometry_lod(bytes(sec), depth, codes.size, depth)


def test_geometry_lod_positions():
    depth = 7
    codes = _surface_codes(depth, n=1500, seed=15)
    sec = geometry.encode_geometry(codes, depth)
    level = 4
    V = geometry.positions_from_geometry_lod(sec, depth, codes.size, level)
    assert V.shape == (_lod_truth(codes, depth, level).size, 3)
    assert V.min() >= 0 and V.max() < (1 << level)


def test_geometry_lod_dtype_tier():
    """LOD code dtype follows the CUT level's bit budget, not the leaf
    depth's — a J=21 stream decoded at level 6 yields int32 codes."""
    rng = np.random.default_rng(16)
    codes = _random_codes(rng, 300, 21)
    sec = geometry.encode_geometry(codes, 21)
    got = geometry.decode_geometry_lod(sec, 21, codes.size, 6)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got.astype(np.uint64),
                                  _lod_truth(codes, 21, 6))


def test_cli_geometry_lod_preview(tmp_path):
    import subprocess
    import sys

    from raht3dgs_tpu.io.ply import read_ply, save_ply_ascii
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    rng = np.random.default_rng(21)
    depth = 5
    lim = 1 << depth
    pts = np.unique(rng.integers(0, lim, size=(500, 3)), axis=0)
    rgb = (pts * 7 % 256).astype(int)
    ply = tmp_path / "f.ply"
    save_ply_ascii(ply, pts.astype(float), rgb, width=lim - 1)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_ply",
         "--input", str(ply), "--steps", "2",
         "--csv", str(tmp_path / "e.csv"), "--platform", "cpu",
         "--bucket", "512", "--save-streams", str(tmp_path),
         "--code-geometry"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    level = 3
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "frame0001_step2.r3tc"),
         "--output", str(tmp_path / "coarse.ply"),
         "--geometry-lod", str(level),
         "--platform", "cpu", "--bucket", "512"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert f"geometry LOD {level}/{depth}" in out.stdout
    v = read_ply(tmp_path / "coarse.ply").vertices
    V = np.stack([v["x"], v["y"], v["z"]], axis=1)
    codes = np.sort(morton_codes_np(pts.astype(np.int64), depth))
    want = np.unique(codes.astype(np.uint64) >> np.uint64(3 * (depth - level)))
    # output positions are full-depth cell centers of the coarse cells
    scale = 2.0 ** (depth - level)
    Vc = np.floor((V + 0.5) / scale).astype(np.int64)
    got = np.sort(morton_codes_np(Vc, level).astype(np.uint64))
    np.testing.assert_array_equal(got, want)
    # guard: cannot combine with attribute LOD
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "frame0001_step2.r3tc"),
         "--output", str(tmp_path / "x.ply"),
         "--geometry-lod", "2", "--lod", "2",
         "--platform", "cpu", "--bucket", "512"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "positions-only" in out.stderr
