"""Container/decoder corruption fuzz: hostile bytes must fail CLEANLY.

Contract: for any truncation or byte flip of a valid stream, the decode
surface either raises ValueError (structured rejection) or returns a
well-shaped finite-or-garbage reconstruction (entropy payloads carry no
checksum by design, matching the reference — garbage symbols decode to
garbage attributes); it must never crash, hang, over-read (the native
BitSource zero-fills at end of input), or allocate absurdly (header
counts are validated against the caller's padded capacity). Geometry
sections DO carry crc32, so payload corruption there must raise.
"""

import zlib

import numpy as np
import pytest

from raht3dgs_tpu.codec.bitstream import FrameStream
from raht3dgs_tpu.models.pipeline import AttributeCodec, prepare_voxel_frame
from raht3dgs_tpu.ops.prelude import morton_codes_np

ALLOWED = (ValueError,)


@pytest.fixture(scope="module")
def subject():
    import jax.numpy as jnp
    from raht3dgs_tpu.ops.morton import morton_decode

    rng = np.random.default_rng(5)
    depth = 6
    pts = rng.integers(0, 2**depth, size=(3000, 3))
    codes = np.unique(morton_codes_np(pts, depth))
    V = np.asarray(morton_decode(jnp.asarray(codes), depth), dtype=np.int64)
    rgb = rng.uniform(0, 255, size=(len(V), 3))
    frames = {}
    for name, kw in (
        ("plain", {}),
        ("chunked", dict(chunk=256)),
        ("deadzone", dict(quant_mode="deadzone")),
    ):
        codec = AttributeCodec(depth, **kw)
        frame = prepare_voxel_frame(V, rgb, depth)
        enc = codec.encode(frame, 4.0)
        if name == "plain":
            from raht3dgs_tpu.codec.geometry import geometry_from_positions

            enc.stream.geometry = geometry_from_positions(V, depth)
        frames[name] = (codec, frame, enc.stream.to_bytes())
    return frames


def _try_decode(codec, frame, data):
    """Parse + decode; return 'raised' or 'decoded'. Anything outside the
    ALLOWED exception set propagates and fails the test."""
    try:
        s = FrameStream.from_bytes(data)
    except ALLOWED:
        return "raised"
    try:
        rec, _ = codec.decode(s, frame.codes, frame.weights)
    except ALLOWED:
        return "raised"
    assert rec.shape == (s.n_voxels, s.n_channels)
    return "decoded"


@pytest.mark.parametrize("name", ["plain", "chunked", "deadzone"])
def test_truncation_sweep(subject, name):
    codec, frame, data = subject[name]
    outcomes = set()
    step = max(1, len(data) // 97)
    for cut in range(0, len(data), step):
        outcomes.add(_try_decode(codec, frame, data[:cut]))
    assert "raised" in outcomes  # short prefixes must be rejected


@pytest.mark.parametrize("name", ["plain", "chunked", "deadzone"])
def test_single_byte_flips(subject, name):
    codec, frame, data = subject[name]
    rng = np.random.default_rng(17)
    decoded = raised = 0
    for _ in range(300):
        pos = int(rng.integers(0, len(data)))
        bit = 1 << int(rng.integers(0, 8))
        mutated = bytearray(data)
        mutated[pos] ^= bit
        out = _try_decode(codec, frame, bytes(mutated))
        decoded += out == "decoded"
        raised += out == "raised"
    # payload corruption decodes to garbage (no checksum on attribute
    # payloads, by design — matching the reference); nothing may escape
    # the ValueError/clean-decode contract (enforced in _try_decode)
    assert decoded > 0
    # structural corruption must be rejected: flip each magic byte
    for pos in range(4):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        assert _try_decode(codec, frame, bytes(mutated)) == "raised"


def test_geometry_section_flips(subject):
    """Geometry carries crc32: any payload flip must raise, and the
    positions path must never return wrong codes silently."""
    from raht3dgs_tpu.codec import geometry

    codec, frame, data = subject["plain"]
    s = FrameStream.from_bytes(data)
    sec = s.geometry
    depth, n = s.depth, s.n_voxels
    want = np.asarray(frame.codes)[:n].astype(np.uint64)
    rng = np.random.default_rng(23)
    wrong = 0
    for _ in range(150):
        pos = int(rng.integers(0, len(sec)))
        bit = 1 << int(rng.integers(0, 8))
        mutated = bytearray(sec)
        mutated[pos] ^= bit
        try:
            got = geometry.decode_geometry(bytes(mutated), depth, n)
        except ALLOWED:
            continue
        except MemoryError:
            pytest.fail("geometry decode over-allocated on corrupt input")
        # a flip that decodes without error must still be detected by crc
        # unless it hit a dont-care byte; wrong undetected codes = bug
        if not np.array_equal(got.astype(np.uint64), want):
            wrong += 1
    assert wrong == 0, f"{wrong} corruptions decoded to WRONG codes silently"


def test_header_voxel_count_lies(subject):
    """A lying n_voxels header can't make the decoder scribble past the
    provided positions: it must raise, not allocate per the header."""
    import struct

    codec, frame, data = subject["plain"]
    # n_voxels lives at offset 4+1+1+1+2 = 9 (<4sBBBHQH)
    huge = bytearray(data)
    struct.pack_into("<Q", huge, 9, 1 << 40)
    with pytest.raises(ValueError):
        s = FrameStream.from_bytes(bytes(huge))
        codec.decode(s, frame.codes, frame.weights)


def test_truncated_sequence_container(tmp_path, subject):
    from raht3dgs_tpu.codec.bitstream import SequenceReader, write_sequence

    codec, frame, data = subject["plain"]
    s = FrameStream.from_bytes(data)
    path = tmp_path / "seq.r3ts"
    write_sequence(str(path), [s, s, s])
    blob = path.read_bytes()
    for cut in (0, 5, 11, 13, len(blob) // 2, len(blob) - 1):
        (tmp_path / "cut.r3ts").write_bytes(blob[:cut])
        with pytest.raises(ValueError):
            SequenceReader(str(tmp_path / "cut.r3ts"))


def test_motion_section_corruption(tmp_path):
    """v3 inter streams: corrupting the signalled motion section must
    fail cleanly — ValueError (lying block counts are checked against
    the frame's own code-derived block structure BEFORE any allocation)
    or a well-shaped garbage reconstruction; never a crash or an
    absurd allocation."""
    import jax.numpy as jnp

    from raht3dgs_tpu.models.temporal import SequenceCodec
    from raht3dgs_tpu.ops.morton import morton_decode

    rng = np.random.default_rng(11)
    depth = 6
    pts = rng.integers(1, 2**depth - 2, size=(3000, 3))
    codes = np.unique(morton_codes_np(pts, depth))[:800]
    V = np.asarray(morton_decode(jnp.asarray(codes), depth),
                   dtype=np.int64)
    rgb = rng.uniform(0, 255, size=(len(V), 3))
    frames = [
        prepare_voxel_frame(np.clip(V + s, 0, 2**depth - 1), rgb, depth)
        for s in (0, 1)
    ]
    sc = SequenceCodec(depth, gop=8, adaptive=False)
    streams, _ = sc.encode_sequence(frames, steps=4.0)
    assert streams[1].motion is not None
    blob = streams[1].to_bytes()
    motion = streams[1].motion
    # locate the motion payload inside the container
    off = blob.find(motion)
    assert off > 0

    def attempt(data):
        sc2 = SequenceCodec(depth, gop=8, adaptive=False)
        try:
            s0 = FrameStream.from_bytes(streams[0].to_bytes())
            sc2.decode_frame(s0, frames[0])
            s1 = FrameStream.from_bytes(data)
            rec = sc2.decode_frame(s1, frames[1])
        except ALLOWED:
            return "raised"
        assert rec.shape == (streams[1].n_voxels, 3)
        assert np.isfinite(rec).all() or True  # garbage ok, crash not
        return "decoded"

    outcomes = set()
    # byte flips across the motion section (header + payload)
    for k in range(0, len(motion), max(1, len(motion) // 24)):
        data = bytearray(blob)
        data[off + k] ^= 0x5A
        outcomes.add(attempt(bytes(data)))
    # truncations INSIDE the motion section
    for cut in (off + 1, off + len(motion) // 2, len(blob) - 1):
        outcomes.add(attempt(blob[:cut]))
    assert outcomes <= {"raised", "decoded"}
