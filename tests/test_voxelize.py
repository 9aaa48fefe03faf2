import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.ops.voxelize import voxelize
from raht3dgs_tpu.ops.prelude import morton_codes_np
from conftest import make_cloud


def _voxelize_np(PC, depth, vmin=None, width=None):
    """Straightforward numpy model of voxelize_pc_batched semantics."""
    V, C = PC[:, :3], PC[:, 3:]
    if vmin is None:
        vmin = V.min(axis=0)
    V0 = V - vmin
    if width is None:
        width = V0.max()
    vs = width / 2**depth
    Vint = np.clip(np.floor(V0 / vs).astype(np.int64), 0, 2**depth - 1)
    codes = morton_codes_np(Vint, depth)
    order = np.argsort(codes, kind="stable")
    cs = codes[order]
    uniq, inv_start = np.unique(cs, return_index=True)
    means = np.stack(
        [C[order][cs == u].mean(axis=0) for u in uniq]
    )
    counts = np.array([(cs == u).sum() for u in uniq], dtype=float)
    return uniq, means, counts, vs, vmin, width


def test_matches_numpy_model(rng):
    depth = 4
    PC = make_cloud(rng, 300, depth, dup_frac=0.5)
    res = voxelize(jnp.asarray(PC), depth)
    uniq, means, counts, vs, vmin, width = _voxelize_np(PC, depth)
    nvox = int(res.nvox)
    assert nvox == len(uniq)
    np.testing.assert_array_equal(np.asarray(res.codes)[:nvox], uniq)
    np.testing.assert_allclose(
        np.asarray(res.attributes)[:nvox], means, rtol=1e-9
    )
    np.testing.assert_array_equal(np.asarray(res.counts)[:nvox], counts)
    assert np.isclose(float(res.voxel_size), vs)
    # Padding slots: zero weight, sentinel codes strictly above real range.
    pads = np.asarray(res.codes)[nvox:]
    assert np.all(np.asarray(res.counts)[nvox:] == 0)
    assert np.all(pads > (1 << (3 * depth)) - 1)
    assert np.all(np.diff(np.asarray(res.codes)) > 0)  # sorted, unique


def test_positions_decode(rng):
    depth = 6
    PC = make_cloud(rng, 500, depth)
    res = voxelize(jnp.asarray(PC), depth)
    nvox = int(res.nvox)
    pos = np.asarray(res.positions)[:nvox]
    assert pos.min() >= 0 and pos.max() < 2**depth
    codes = morton_codes_np(pos, depth)
    np.testing.assert_array_equal(codes, np.asarray(res.codes)[:nvox])


def test_residuals_reconstruct(rng):
    depth = 5
    PC = make_cloud(rng, 400, depth, dup_frac=0.3)
    res = voxelize(jnp.asarray(PC), depth)
    # sorted point attrs == voxel mean + delta
    sorted_attrs = PC[np.asarray(res.sort_idx), 3:]
    rec = (
        np.asarray(res.attributes)[np.asarray(res.point_voxel)]
        + np.asarray(res.delta_attr)
    )
    np.testing.assert_allclose(rec, sorted_attrs, rtol=1e-9, atol=1e-9)


def test_n_valid_padding(rng):
    depth = 5
    PC = make_cloud(rng, 256, depth)
    PCpad = np.concatenate([PC, np.full((64, PC.shape[1]), 1e9)], axis=0)
    res = voxelize(jnp.asarray(PC), depth)
    res_p = voxelize(jnp.asarray(PCpad), depth, n_valid=jnp.asarray(256))
    nvox = int(res.nvox)
    assert int(res_p.nvox) == nvox
    np.testing.assert_array_equal(
        np.asarray(res_p.codes)[:nvox], np.asarray(res.codes)[:nvox]
    )
    np.testing.assert_allclose(
        np.asarray(res_p.attributes)[:nvox],
        np.asarray(res.attributes)[:nvox],
        rtol=1e-12,
    )
    assert np.all(np.asarray(res_p.counts)[nvox:] == 0)


def test_vmin_width_overrides(rng):
    depth = 4
    PC = make_cloud(rng, 100, depth)
    vmin = np.zeros(3)
    width = float(2**depth)
    res = voxelize(jnp.asarray(PC), depth, vmin=jnp.asarray(vmin), width=width)
    # With width=2^J, voxel_size == 1, so integer coords == floor(position)
    nvox = int(res.nvox)
    assert np.isclose(float(res.voxel_size), 1.0)
    assert nvox <= 100


def test_legacy_voxelize_pc_wrapper(tmp_path, rng):
    from raht3dgs_tpu.ops.voxelize import voxelize_pc

    depth = 4
    PC = make_cloud(rng, 200, depth, dup_frac=0.4)
    PCvox, PCsorted, voxel_indices, DeltaPC = voxelize_pc(
        PC, {"J": depth, "writeFileOut": True,
             "filename": str(tmp_path / "out")}
    )
    assert PCvox.shape[1] == PC.shape[1]
    assert PCsorted.shape == PC.shape
    assert voxel_indices[0] == 0
    assert len(voxel_indices) == len(PCvox)
    assert DeltaPC.shape == PC.shape
    assert (tmp_path / "out_vox.ply").exists()
    header = (tmp_path / "out_data.txt").read_text().splitlines()[0].split()
    assert int(header[5]) == len(PCvox)


def test_voxelize_depth21_uint64_codes_exact(rng):
    """Depth 21: codes and pad sentinels must share the uint64 dtype — a
    mixed int64/uint64 where() would promote to float64 and round 63-bit
    codes (caught by review; this pins the fix)."""
    n = 500
    pts = rng.uniform(0, 2.0**21, (n, 3))
    PC = np.concatenate([pts, rng.uniform(0, 255, (n, 3))], axis=1)
    res = voxelize(jnp.asarray(PC), 21)
    assert res.codes.dtype == jnp.uint64
    nv = int(res.nvox)
    codes = np.asarray(res.codes)[:nv]

    # exact integer recomputation (python ints are arbitrary precision)
    vs = float(res.width) / 2**21
    vmin = np.asarray(res.vmin)
    Vint = np.clip(np.floor((pts - vmin) / vs), 0, 2**21 - 1).astype(np.int64)
    want = set()
    for x, y, z in Vint:
        c = 0
        for b in range(21):
            c |= ((int(z) >> b) & 1) << (3 * b)
            c |= ((int(y) >> b) & 1) << (3 * b + 1)
            c |= ((int(x) >> b) & 1) << (3 * b + 2)
        want.add(c)
    assert set(int(c) for c in codes) == want
    # ascending and unique
    assert np.all(np.diff(codes.astype(np.uint64)) > 0)


def test_positions_equal_decoded_codes(rng):
    """The lane-gathered positions must equal morton_decode of the codes
    (the voxelizer derives them from the sorted points' own quantized
    coordinates instead of running a decode pass)."""
    import jax.numpy as jnp

    from raht3dgs_tpu.ops.morton import morton_decode
    from raht3dgs_tpu.ops.voxelize import voxelize

    for depth in (4, 11):  # int32 and int64 code tiers
        pts = rng.uniform(0, 100.0, size=(500, 3))
        attrs = rng.uniform(0, 255, size=(500, 2))
        res = voxelize(jnp.asarray(np.concatenate([pts, attrs], 1)), depth)
        nv = int(res.nvox)
        got = np.asarray(res.positions)[:nv]
        want = np.asarray(morton_decode(res.codes, depth))[:nv]
        np.testing.assert_array_equal(got, want)
        assert got.dtype == want.dtype


def test_payload_sort_matches_pair_gather(rng, monkeypatch):
    """The payload-through-sort formulation (RAHT3DGS_VOX_SORT=payload,
    default for <= 6 columns) is BITWISE the pair-sort + row-gather
    formulation, duplicate-code ties included (lax.sort is stable by
    default; the one stable permutation applies to every operand)."""
    import jax

    depth = 5
    PC = make_cloud(rng, 700, depth, dup_frac=0.4)
    outs = {}
    for mode in ("payload", "pair"):
        monkeypatch.setenv("RAHT3DGS_VOX_SORT", mode)
        jax.clear_caches()  # the env var is read at trace time
        outs[mode] = voxelize(jnp.asarray(PC), depth)
    monkeypatch.delenv("RAHT3DGS_VOX_SORT")
    jax.clear_caches()
    a, b = outs["payload"], outs["pair"]
    assert int(a.nvox) == int(b.nvox)
    n = int(a.nvox)
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_array_equal(
        np.asarray(a.positions), np.asarray(b.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(a.attributes)[:n], np.asarray(b.attributes)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(a.delta_attr), np.asarray(b.delta_attr)
    )
