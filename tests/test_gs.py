import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from raht3dgs_tpu.models.gs_merge import (
    merge_gaussian_clusters,
    merge_gaussian_clusters_with_indices,
    prepare_cluster_data,
)
from raht3dgs_tpu.models.gs_voxelize import compress_to_nvox, world_positions
from raht3dgs_tpu.models.gs_codec import encode_gs_frame
from raht3dgs_tpu.eval.metrics import compute_attribute_metrics, gs_group_psnr
from raht3dgs_tpu.eval.cameras import generate_random_cameras
from raht3dgs_tpu.eval.render import point_render, render_comparison


def _scene(rng, n=500):
    return {
        "means": rng.normal(size=(n, 3)),
        "quats": _unit(rng.normal(size=(n, 4))),
        "scales": np.abs(rng.normal(size=(n, 3))) * 0.05,
        "opacities": rng.uniform(0.2, 1.0, size=n),
        "colors": rng.normal(size=(n, 48)),
    }


def _unit(q):
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _merge_np(scene, ids, k, weight_by_opacity=True):
    """Straightforward numpy model of the reference CUDA merge kernel."""
    w = scene["opacities"] if weight_by_opacity else np.ones(len(ids))
    out = {
        "means": np.zeros((k, 3)),
        "quats": np.tile([0.0, 0, 0, 1.0], (k, 1)),
        "scales": np.zeros((k, 3)),
        "opacities": np.zeros(k),
        "colors": np.zeros((k, scene["colors"].shape[1])),
    }
    for c in range(k):
        m = ids == c
        tw = w[m].sum()
        tws = tw if tw > 0 else 1.0
        out["means"][c] = (scene["means"][m] * w[m, None]).sum(0) / tws
        out["scales"][c] = (scene["scales"][m] * w[m, None]).sum(0) / tws
        out["colors"][c] = (scene["colors"][m] * w[m, None]).sum(0) / tws
        qa = (scene["quats"][m] * w[m, None]).sum(0)
        qn = np.linalg.norm(qa)
        if qn > 0:
            out["quats"][c] = qa / qn
        out["opacities"][c] = min(scene["opacities"][m].sum(), 1.0)
    return out


def test_merge_matches_kernel_semantics(rng):
    scene = _scene(rng, 300)
    k = 40
    ids = rng.integers(0, k, size=300)
    ref = _merge_np(scene, ids, k)
    got = merge_gaussian_clusters(
        jnp.asarray(scene["means"]), jnp.asarray(scene["quats"]),
        jnp.asarray(scene["scales"]), jnp.asarray(scene["opacities"]),
        jnp.asarray(scene["colors"]), jnp.asarray(ids), num_clusters=k,
    )
    for a, b in zip(got, (ref["means"], ref["quats"], ref["scales"],
                          ref["opacities"], ref["colors"])):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-9, atol=1e-9)


def test_merge_uniform_weights(rng):
    scene = _scene(rng, 100)
    ids = rng.integers(0, 10, size=100)
    ref = _merge_np(scene, ids, 10, weight_by_opacity=False)
    got = merge_gaussian_clusters(
        jnp.asarray(scene["means"]), jnp.asarray(scene["quats"]),
        jnp.asarray(scene["scales"]), jnp.asarray(scene["opacities"]),
        jnp.asarray(scene["colors"]), jnp.asarray(ids), num_clusters=10,
        weight_by_opacity=False,
    )
    np.testing.assert_allclose(np.asarray(got[0]), ref["means"], rtol=1e-9)


def test_csr_interface(rng):
    scene = _scene(rng, 120)
    labels = rng.integers(100, 110, size=120)  # non-contiguous label space
    idx, off = prepare_cluster_data(labels)
    assert off[0] == 0 and off[-1] == 120
    got = merge_gaussian_clusters_with_indices(
        scene["means"], scene["quats"], scene["scales"],
        scene["opacities"], scene["colors"], idx, off,
    )
    _, inverse = np.unique(labels, return_inverse=True)
    ref = _merge_np(scene, inverse, len(off) - 1)
    np.testing.assert_allclose(np.asarray(got[0]), ref["means"], rtol=1e-9)


def test_compress_to_nvox(tmp_path, rng):
    scene = _scene(rng, 2000)
    res = compress_to_nvox(scene, depth=4, output_dir=str(tmp_path))
    assert 0 < res.n_voxels <= 2000
    assert (tmp_path / "compressed_Nvox_gaussians.ply").exists()
    # merged scene reloads through the reader
    from raht3dgs_tpu.io.ply import read_compressed_3dgs_ply

    V, attrs, vs, vmin = read_compressed_3dgs_ply(
        tmp_path / "compressed_Nvox_gaussians.ply"
    )
    assert len(V) == res.n_voxels
    assert attrs.shape[1] == 56
    np.testing.assert_allclose(vs, res.voxel_size, rtol=1e-6)
    # voxel positions in range; world positions inside the scene bbox
    assert V.min() >= 0 and V.max() < 2**4
    w = world_positions(res)
    assert w.shape == (res.n_voxels, 3)
    # attribute metrics vs original run clean
    r = slice(0, res.n_voxels)
    merged = {
        "means": res.means_world[r], "quats": res.quats[r],
        "scales": res.scales[r], "opacities": res.opacities[r],
        "colors": res.colors[r],
    }
    m = compute_attribute_metrics(scene, merged, res.cluster_of_input)
    assert m["quaternion_mean_dist"] >= 0
    assert np.isfinite(m["position_rmse"])


def test_gs_codec_rd(rng):
    scene = _scene(rng, 1500)
    res = compress_to_nvox(scene, depth=5)
    r = slice(0, res.n_voxels)
    attrs = np.concatenate(
        [res.quats[r], res.scales[r], res.opacities[r][:, None], res.colors[r]],
        axis=1,
    )
    pts = encode_gs_frame(
        res.positions_int[r], attrs, depth=5, steps=(0.01, 0.1), bucket=512
    )
    assert pts[0].psnr["psnr_all"] > pts[1].psnr["psnr_all"]
    assert pts[0].bpp > pts[1].bpp
    for key in ("psnr_quats", "psnr_scales", "psnr_opacity", "psnr_colors"):
        assert np.isfinite(pts[0].psnr[key])
    row = pts[0].csv_row()
    assert len(row.split(",")) == 20  # frame + 19 reference columns
    # the pipelined sweep must carry the shared stage times into every
    # point exactly once (encode_gs_frame merges the prelude/transform
    # timer into each step's own timer)
    for p in pts:
        assert p.times["RAHT_prelude_time"] > 0
        assert p.times["RAHT_transform_time"] > 0
        assert p.times["Quant_time"] >= 0
        assert p.times["Entropy_enc_time"] > 0
    assert (
        pts[0].times["RAHT_prelude_time"] == pts[1].times["RAHT_prelude_time"]
    )


def test_point_render_smoke(rng):
    scene = _scene(rng, 800)
    viewmats, Ks, W, H = generate_random_cameras(
        scene["means"].mean(0), 3.0, n_views=2, image_width=64, image_height=64
    )
    imgs = point_render(scene, viewmats, Ks, W, H)
    assert imgs.shape == (2, 64, 64, 3)
    assert imgs.min() >= 0 and imgs.max() <= 1
    # identical scenes -> infinite PSNR
    out = render_comparison(scene, scene, n_views=2, image_size=64,
                            backend="preview")
    assert out["backend"] == "preview"
    assert out["psnr_min"] == float("inf")


def test_render_comparison_detects_difference(rng):
    scene = _scene(rng, 800)
    worse = dict(scene)
    worse["colors"] = scene["colors"] + rng.normal(size=scene["colors"].shape)
    out = render_comparison(scene, worse, n_views=2, image_size=64,
                            backend="preview")
    assert np.isfinite(out["psnr_avg"])
    assert out["psnr_avg"] < 100


def test_cli_decode_3dgs_roundtrip(tmp_path, rng):
    # Full serving loop: synthetic 3DGS voxel frame -> compressed PLY ->
    # encode_3dgs --target-bpp --save-streams -> decode --color-space 3dgs
    # -> positions identical, attributes within the quantization bound.
    from raht3dgs_tpu.io.ply import read_compressed_3dgs_ply, save_ply_3dgs
    from raht3dgs_tpu.ops.prelude import morton_codes_np

    depth, n = 6, 800
    pts = rng.integers(0, 2**depth, size=(2 * n, 3))
    _, first = np.unique(morton_codes_np(pts, depth), return_index=True)
    pts = pts[first[:n]]
    n = len(pts)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    save_ply_3dgs(
        tmp_path / "scene.ply",
        means=pts.astype(float), quats=quats,
        scales=np.abs(rng.normal(size=(n, 3))),
        opacities=rng.uniform(0.2, 1.0, size=n),
        colors=rng.normal(size=(n, 48)),
        voxel_size=0.02, vmin=np.array([-1.0, -1.0, -1.0]),
    )
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.encode_3dgs",
         "--input", str(tmp_path / "scene.ply"), "--depth", str(depth),
         "--target-bpp", "200", "--save-streams", str(tmp_path),
         "--platform", "cpu", "--bucket", "1024"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    out = subprocess.run(
        [sys.executable, "-m", "raht3dgs_tpu.cli.decode",
         "--stream", str(tmp_path / "gs_bpp200.r3tc"),
         "--positions", str(tmp_path / "scene.ply"),
         "--output", str(tmp_path / "rec.ply"), "--color-space", "3dgs",
         "--platform", "cpu", "--bucket", "1024"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    V, a, vs, vmin = read_compressed_3dgs_ply(tmp_path / "rec.ply")
    V0, a0, vs0, _ = read_compressed_3dgs_ply(tmp_path / "scene.ply")
    np.testing.assert_array_equal(np.sort(morton_codes_np(V, depth)),
                                  np.sort(morton_codes_np(V0, depth)))
    assert abs(vs - vs0) < 1e-9
    perm = np.argsort(morton_codes_np(V, depth), kind="stable")
    perm0 = np.argsort(morton_codes_np(V0, depth), kind="stable")
    rmse = float(np.sqrt(np.mean((a[perm][:, 8:] - a0[perm0][:, 8:]) ** 2)))
    assert rmse < 0.25  # within quantization error at the searched step
    assert np.allclose(np.linalg.norm(a[:, 0:4], axis=1), 1.0, atol=1e-5)


def test_raw_scene_ply_keeps_float_positions(tmp_path, rng):
    """A raw (unvoxelized) 3DGS scene PLY must keep float world coordinates
    — truncating through the integer-voxel reader collapsed every gaussian
    onto the integer lattice (caught by review; this pins the fix)."""
    from raht3dgs_tpu.io.ply import read_3dgs_scene_ply, save_ply_3dgs

    n = 50
    means = rng.uniform(-2, 2, (n, 3))
    quats = rng.normal(size=(n, 4))
    scales = np.abs(rng.normal(size=(n, 3))) * 0.01
    opac = rng.uniform(0, 1, n)
    colors = rng.normal(size=(n, 48))
    raw = tmp_path / "scene.ply"
    save_ply_3dgs(raw, means, quats, scales, opac, colors)  # no voxel meta
    pos, attrs, meta = read_3dgs_scene_ply(raw)
    assert meta is None
    np.testing.assert_allclose(pos, means, atol=1e-6)

    # the CLI loader: raw scenes float through; pre-voxelized ones map to
    # voxel centers
    import argparse

    from raht3dgs_tpu.cli.voxelize_3dgs import _load_params

    args = argparse.Namespace(ckpt=None, ply=str(raw))
    params, _ = _load_params(args)
    np.testing.assert_allclose(params["means"], means, atol=1e-6)

    vox = tmp_path / "voxelized.ply"
    save_ply_3dgs(vox, np.floor(means + 2.0), quats, scales, opac, colors,
                  voxel_size=0.5, vmin=np.array([-2.0, -2.0, -2.0]))
    args = argparse.Namespace(ckpt=None, ply=str(vox))
    params, _ = _load_params(args)
    want = (np.floor(means + 2.0) + 0.5) * 0.5 + np.array([-2.0, -2.0, -2.0])
    np.testing.assert_allclose(params["means"], want, atol=1e-6)
