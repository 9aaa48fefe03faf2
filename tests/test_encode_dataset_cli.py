"""encode_dataset CLI end-to-end on a synthetic 8iVFBv2 tree.

Pins the batched path's CSV contract: rows only for real frames (a
missing frame in range must not leak padding duplicates), and the shared
transform's time is amortized into every step's rows (summed stage
columns account for the full pipeline — the reporting-script contract)."""

import csv
import io
import os

import numpy as np
import pytest

from raht3dgs_tpu.io.ply import save_ply_ascii
from raht3dgs_tpu.ops.prelude import morton_codes_np


@pytest.fixture
def dataset_tree(tmp_path, rng):
    """<root>/8iVFBv2/loot/Ply/loot_vox10_NNNN.ply, frames 1000..1003 with
    1002 missing."""
    depth = 5
    d = tmp_path / "8iVFBv2" / "loot" / "Ply"
    d.mkdir(parents=True)
    base = rng.integers(0, 2**depth, (800, 3))
    base_cols = rng.integers(0, 255, (800, 3))
    for k, fr in enumerate((1000, 1001, 1003)):
        # temporally correlated frames (a drifting cloud): the --inter
        # adaptive fallback then actually chooses P-frames
        pts = np.clip(base + k, 0, 2**depth - 1)
        _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
        pts = pts[first]
        cols = base_cols[first]
        save_ply_ascii(
            d / f"loot_vox10_{fr:04d}.ply", pts.astype(float),
            cols.astype(float), width=2**depth - 1,
        )
    return tmp_path


def _run(dataset_tree, tmp_path, extra):
    from raht3dgs_tpu.cli.encode_dataset import main

    out = tmp_path / "runtime.csv"
    rc = main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(dataset_tree), "--frames", "1", "4",
        "--steps", "4", "8", "--platform", "cpu", "--csv", str(out),
        *extra,
    ])
    assert rc == 0
    with open(out) as f:
        return list(csv.DictReader(f))


def test_batched_rows_and_amortized_transform(dataset_tree, tmp_path):
    rows = _run(dataset_tree, tmp_path, ["--batch", "2"])
    # 3 real frames x 2 steps; the missing frame 1002 (and any padding
    # duplicate) must not produce rows
    assert len(rows) == 6
    frames = sorted({r["Frame"] for r in rows})
    assert frames == ["1", "2", "4"]
    # the shared transform is amortized into every step's rows
    t = [float(r["RAHT_transform_time"]) for r in rows]
    assert all(x > 0 for x in t), t


def test_sequential_matches_batched_rates(dataset_tree, tmp_path):
    rows_b = _run(dataset_tree, tmp_path, ["--batch", "2"])
    rows_s = _run(dataset_tree, tmp_path, [])
    rb = {(r["Frame"], r["Quantization_Step"]): r["Rate_bpp"] for r in rows_b}
    rs = {(r["Frame"], r["Quantization_Step"]): r["Rate_bpp"] for r in rows_s}
    assert rb == rs  # deterministic codec: identical rates either path


def test_encode_ply_voxelize_and_target_bpp(tmp_path, rng):
    """encode_ply's float-input voxelize path and rate-targeted mode."""
    from raht3dgs_tpu.cli.encode_ply import main as ply_main

    depth = 5
    pts = rng.uniform(0, 2**depth - 1, (3000, 3))
    cols = rng.integers(0, 255, (3000, 3))
    ply = tmp_path / "float.ply"
    save_ply_ascii(ply, pts, cols.astype(float), width=2**depth - 1)

    out = tmp_path / "runtime.csv"
    assert ply_main([
        "--input", str(ply), "--voxelize", "--steps", "4",
        "--platform", "cpu", "--csv", str(out), "--depth", str(depth),
    ]) == 0
    rows = out.read_text().strip().splitlines()
    assert len(rows) == 2  # header + one step row

    assert ply_main([
        "--input", str(ply), "--voxelize", "--target-bpp", "2.0",
        "--platform", "cpu", "--depth", str(depth),
    ]) == 0


def test_geometry_sequence_all_paths(dataset_tree, tmp_path):
    """--code-geometry on the sequential, batched and inter dataset paths:
    every saved frame carries a decodable geometry section and the whole
    .r3ts decodes without --positions."""
    import subprocess
    import sys

    from raht3dgs_tpu.cli.encode_dataset import main
    from raht3dgs_tpu.codec.bitstream import SequenceReader
    from raht3dgs_tpu.codec.geometry import decode_geometry

    for name, extra in [
        ("seq", []),
        ("batched", ["--batch", "2"]),
        ("inter", ["--inter"]),
    ]:
        seq_path = tmp_path / f"{name}.r3ts"
        steps = ["--steps", "4"]
        rc = main([
            "--dataset", "8iVFBv2", "--sequence", "loot",
            "--data-root", str(dataset_tree), "--frames", "1", "4",
            *steps, "--platform", "cpu",
            "--csv", str(tmp_path / f"{name}.csv"),
            "--save-sequence", str(seq_path), "--code-geometry", *extra,
        ])
        assert rc == 0
        seq = SequenceReader(seq_path)
        assert len(seq) == 3
        # geometry policy: intra profiles (0 legacy / 3 ext3, by size)
        # everywhere except --inter P-frames, which carry a temporal
        # profile (1/2 legacy, 4/5 ext3) and reference the previous
        # frame — I-frames keep .r3ts random access alive
        prev = None
        saw_temporal = False
        for i, st in enumerate(seq):
            assert st.geometry is not None
            if name != "inter":
                assert st.geometry[0] in (0, 3)
            else:
                assert st.geometry[0] in (0, 3) or st.inter
                assert st.geometry[0] in (
                    (1, 2, 4, 5) if st.inter else (0, 3)
                )
                saw_temporal |= bool(st.inter)
            codes = decode_geometry(st.geometry, st.depth, st.n_voxels,
                                    prev_codes=prev)
            assert codes.size == st.n_voxels
            assert st.geometry_bpp() > 0
            prev = codes
        if name == "inter":
            assert saw_temporal  # the synthetic tree does produce P-frames
    # full self-contained decode of the inter sequence (chained P-frames)
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "inter.r3ts"), "--all-frames",
         "--output", str(tmp_path / "rec_{i}.ply"),
         "--platform", "cpu"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for i in range(3):
        assert (tmp_path / f"rec_{i}.ply").exists()


def test_target_bpp_sequence(dataset_tree, tmp_path):
    """--target-bpp: constant-rate sequence encoding — every real frame
    lands at or under budget (within the search's refinement tolerance),
    rows carry the searched step, and the .r3ts decodes."""
    from raht3dgs_tpu.cli.encode_dataset import main

    out = tmp_path / "runtime_t.csv"
    seq = tmp_path / "seq_t.r3ts"
    rc = main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(dataset_tree), "--frames", "1", "4",
        "--target-bpp", "6.0", "--code-geometry",
        "--save-sequence", str(seq),
        "--platform", "cpu", "--csv", str(out),
    ])
    assert rc == 0
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3  # 3 real frames (1002 missing)
    for r in rows:
        assert float(r["Rate_bpp"]) <= 6.0 * 1.05
        assert float(r["Quantization_Step"]) > 0
        assert float(r["psnr"]) > 20.0
    from raht3dgs_tpu.codec.bitstream import SequenceReader

    reader = SequenceReader(str(seq))
    assert len(reader) == 3
    assert all(reader.frame(i).geometry is not None for i in range(3))
    # --batch cannot compose (refused, not ignored)
    assert main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(dataset_tree), "--target-bpp", "2.0",
        "--batch", "2", "--platform", "cpu",
        "--csv", str(tmp_path / "x.csv"),
    ]) == 2


def test_target_bpp_inter_sequence(dataset_tree, tmp_path):
    """--target-bpp --inter: rate-controlled temporal coding — each I/P
    candidate searches its own step; every frame lands at or under
    budget and at least one P-frame appears on the drifting fixture."""
    import numpy as np

    from raht3dgs_tpu.cli.encode_dataset import main

    out = tmp_path / "runtime_ti.csv"
    seq = tmp_path / "seq_ti.r3ts"
    rc = main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(dataset_tree), "--frames", "1", "4",
        "--target-bpp", "5.0", "--inter", "--code-geometry",
        "--save-sequence", str(seq),
        "--platform", "cpu", "--csv", str(out),
    ])
    assert rc == 0
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    for r in rows:
        assert float(r["Rate_bpp"]) <= 5.0 * 1.05
        assert float(r["psnr"]) > 15.0
    # the searched steps may differ per frame (that IS rate control)
    from raht3dgs_tpu.codec.bitstream import SequenceReader

    reader = SequenceReader(str(seq))
    streams = [reader.frame(i) for i in range(len(reader))]
    assert any(s.inter for s in streams[1:]), "no P-frame chosen"
    assert not streams[0].inter
    # the rate-controlled inter stream decodes through the ordinary CLI
    from raht3dgs_tpu.cli.decode import main as dec_main

    assert dec_main([
        "--stream", str(seq), "--all-frames",
        "--output", str(tmp_path / "ti_{i}.ply"),
        "--color-space", "yuv", "--platform", "cpu",
    ]) == 0


def test_target_bpp_cbr(dataset_tree, tmp_path):
    """--cbr: leaky-bucket credit carry — prefix means stay at or under
    target (the streaming guarantee) while the sequence spends at least
    as much of the budget as independent per-frame searches."""
    import numpy as np

    from raht3dgs_tpu.cli.encode_dataset import main

    rates = {}
    for mode, extra in (("indep", []), ("cbr", ["--cbr"])):
        out = tmp_path / f"runtime_{mode}.csv"
        rc = main([
            "--dataset", "8iVFBv2", "--sequence", "loot",
            "--data-root", str(dataset_tree), "--frames", "1", "4",
            "--target-bpp", "4.0", *extra,
            "--platform", "cpu", "--csv", str(out),
        ])
        assert rc == 0
        with open(out) as f:
            rates[mode] = [float(r["Rate_bpp"])
                           for r in csv.DictReader(f)]
        assert len(rates[mode]) == 3
    for k in range(3):  # every prefix mean at or under target
        assert np.mean(rates["cbr"][: k + 1]) <= 4.0 * 1.001
    assert np.mean(rates["cbr"]) >= np.mean(rates["indep"]) - 1e-9
    # the CBR inter path accepts the flag too
    rc = main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(dataset_tree), "--frames", "1", "4",
        "--target-bpp", "4.0", "--cbr", "--inter",
        "--platform", "cpu", "--csv", str(tmp_path / "ci.csv"),
    ])
    assert rc == 0
    with open(tmp_path / "ci.csv") as f:
        ci = [float(r["Rate_bpp"]) for r in csv.DictReader(f)]
    for k in range(len(ci)):
        assert np.mean(ci[: k + 1]) <= 4.0 * 1.001
    # --cbr without --target-bpp is refused, not ignored
    assert main([
        "--dataset", "8iVFBv2", "--sequence", "loot",
        "--data-root", str(dataset_tree),
        "--cbr", "--platform", "cpu",
        "--csv", str(tmp_path / "y.csv"),
    ]) == 2
