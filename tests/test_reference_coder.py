"""Byte-identity vs the reference's *compiled* RLGR coder.

Compiles the reference `membuf` implementation
(/root/reference/python/PyRLGR/src/libs/rlgr/membuf.cpp — std-only C++)
into a tiny stdin/stdout CLI harness and asserts that both repo backends
(native C and pure Python) produce byte-identical streams, and decode the
reference's streams bit-exactly, on adversarial suites targeting the
coder's edge paths:

- long zero runs (run-mode adaptation, membuf.cpp:356-389)
- 32-bit GR escape (unary prefix capped at 32, membuf.cpp:242-256)
- trailing partial run flush (membuf.cpp:416-419)
- signed and unsigned symbol mappings (_s2u/_u2s, membuf.cpp:4-23)

Skipped cleanly when the reference tree is not mounted.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from raht3dgs_tpu.codec.rlgr import native_available, rlgr_decode, rlgr_encode

REF_DIR = "/root/reference/python/PyRLGR/src/libs/rlgr"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "membuf.cpp")),
    reason="reference tree not mounted",
)

_HARNESS = r"""
#include "membuf.h"
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <unistd.h>

static std::vector<uint8_t> read_all_stdin() {
    std::vector<uint8_t> buf;
    uint8_t tmp[65536];
    ssize_t n;
    while ((n = ::read(0, tmp, sizeof tmp)) > 0)
        buf.insert(buf.end(), tmp, tmp + n);
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 3) return 2;
    int flagSigned = std::atoi(argv[2]);
    std::vector<uint8_t> in = read_all_stdin();
    if (std::strcmp(argv[1], "encode") == 0) {
        size_t N = in.size() / sizeof(int64_t);
        std::vector<int64_t> seq(N);
        std::memcpy(seq.data(), in.data(), N * sizeof(int64_t));
        membuf mb;
        mb.rlgrWrite(seq.data(), N, (uint_least8_t)flagSigned);
        mb.close();
        std::vector<uint8_t> out = mb.get_buffer();
        fwrite(out.data(), 1, out.size(), stdout);
        return 0;
    }
    if (std::strcmp(argv[1], "decode") == 0) {
        if (argc < 4) return 2;
        size_t N = (size_t)std::atoll(argv[3]);
        membuf mb(in);
        std::vector<int64_t> seq(N);
        mb.rlgrRead(seq.data(), N, (uint_least8_t)flagSigned);
        fwrite(seq.data(), sizeof(int64_t), N, stdout);
        return 0;
    }
    return 2;
}
"""


@pytest.fixture(scope="session")
def ref_coder(tmp_path_factory):
    """Path to the compiled reference-coder CLI harness."""
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ unavailable")
    d = tmp_path_factory.mktemp("refrlgr")
    src = d / "harness.cpp"
    src.write_text(_HARNESS)
    exe = d / "refrlgr"
    subprocess.run(
        [gxx, "-O2", "-std=c++11", f"-I{REF_DIR}", str(src),
         os.path.join(REF_DIR, "membuf.cpp"), "-o", str(exe)],
        check=True, capture_output=True,
    )
    return str(exe)


def ref_encode(exe, values, signed):
    seq = np.ascontiguousarray(values, dtype=np.int64)
    r = subprocess.run(
        [exe, "encode", str(int(signed))], input=seq.tobytes(),
        capture_output=True, check=True,
    )
    return r.stdout


def ref_decode(exe, stream, n, signed):
    r = subprocess.run(
        [exe, "decode", str(int(signed)), str(n)], input=bytes(stream),
        capture_output=True, check=True,
    )
    return np.frombuffer(r.stdout, dtype=np.int64)


def _suites():
    rng = np.random.default_rng(7)
    suites = {
        # run-mode adaptation over very long zero runs (incl. the 1500-zero
        # adversarial stream from the round-1 verdict)
        "long_zero_runs": np.concatenate(
            [np.zeros(1500, np.int64), [5], np.zeros(700, np.int64),
             [-3, 2], np.zeros(64, np.int64), [1]]
        ),
        # 32-bit GR escape: u >> k >= 32 forces the escape codeword
        "gr_escape": np.array(
            [0, 2**31 - 1, -(2**31), 1, 2**30, -(2**29), 0, 0, 123456789],
            dtype=np.int64,
        ),
        # stream ending mid-run exercises the trailing partial-run flush
        "trailing_partial_run": np.concatenate(
            [[9, -1], np.zeros(37, np.int64)]
        ),
        # final run-terminating symbol whose mapped value is exactly 1:
        # the reference's in-place `u--` (membuf.cpp:359) aliases its
        # trailing-flush test and emits spurious trailing bits — byte
        # identity requires replicating that (signed: zigzag(-1) == 1;
        # unsigned: abs() maps the -1 to a literal 1)
        "aliased_flush": np.concatenate(
            [[7], np.zeros(40, np.int64), [-1]]
        ),
        "all_zero": np.zeros(256, np.int64),
        "single": np.array([42], dtype=np.int64),
        "empty": np.zeros(0, np.int64),
        # geometric magnitudes, the codec's typical coefficient statistics
        "geometric_mixed": (
            rng.geometric(0.05, size=4096).astype(np.int64) - 1
        ) * rng.choice([-1, 1], size=4096),
        # dense large values keep the coder out of run mode
        "no_run_mode": rng.integers(1 << 16, 1 << 24, size=512).astype(np.int64)
        * rng.choice([-1, 1], size=512),
    }
    return suites


@pytest.mark.parametrize("name", sorted(_suites()))
@pytest.mark.parametrize("signed", [True, False])
def test_byte_identity_vs_reference(ref_coder, name, signed):
    values = _suites()[name]
    if not signed:
        values = np.abs(values)
    ref_stream = ref_encode(ref_coder, values, signed)

    backends = ["python"] + (["native"] if native_available() else [])
    for backend in backends:
        stream, _ = rlgr_encode(values, signed=signed, backend=backend)
        assert bytes(stream) == bytes(ref_stream), (
            f"{backend} stream differs from reference coder on {name} "
            f"(len {len(stream)} vs {len(ref_stream)})"
        )
        dec, _ = rlgr_decode(ref_stream, len(values), signed=signed,
                             backend=backend)
        np.testing.assert_array_equal(np.asarray(dec), values)

    # and the reference decodes the repo's stream (trivially, same bytes —
    # this pins the harness itself)
    if len(values):
        np.testing.assert_array_equal(
            ref_decode(ref_coder, ref_stream, len(values), signed), values
        )


def test_reference_coder_fuzz(ref_coder):
    """Randomized cross-validation: mixed run/no-run regimes."""
    rng = np.random.default_rng(int(os.environ.get("RAHT3DGS_FUZZ_SEED", 11)))
    for trial in range(20):
        parts = []
        for _ in range(rng.integers(1, 6)):
            kind = rng.integers(0, 3)
            if kind == 0:
                parts.append(np.zeros(rng.integers(1, 400), np.int64))
            elif kind == 1:
                parts.append(
                    (rng.geometric(0.2, size=rng.integers(1, 200)) - 1)
                    * rng.choice([-1, 1])
                )
            else:
                parts.append(
                    rng.integers(-(2**31), 2**31, size=rng.integers(1, 50))
                )
        values = np.concatenate(parts).astype(np.int64)
        signed = bool(rng.integers(0, 2))
        if not signed:
            values = np.abs(values)
        ref_stream = ref_encode(ref_coder, values, signed)
        for backend in ["python"] + (["native"] if native_available() else []):
            stream, _ = rlgr_encode(values, signed=signed, backend=backend)
            assert bytes(stream) == bytes(ref_stream), (
                f"trial {trial} backend {backend}: stream mismatch"
            )
