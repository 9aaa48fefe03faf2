#!/usr/bin/env python3
"""Fetch / verify the reference benchmark datasets (8iVFBv2, MVUB).

The reference's methodology runs on real captures
(`/root/reference/python/data_util.py:8-22,422-433`): 8i Voxelized Full
Bodies v2 (vox10, ~0.7-1M voxels/frame) and Microsoft Voxelized Upper
Bodies (vox9). This script downloads them from the canonical JPEG Pleno
database into the directory layout the registry (io/datasets.py) expects:

    <root>/8iVFBv2/<seq>/Ply/<seq>_vox10_NNNN.ply
    <root>/MVUB/<seq>/ply/frameNNNN.ply

Canonical sources (JPEG Pleno plenodb — the same trees the reference's
path templates address):

- 8iVFBv2:  http://plenodb.jpeg.org/pc/8ilabs/
    longdress.zip / loot.zip / redandblack.zip / soldier.zip
  (d'Eon, Harrison, Myers, Chou, "8i Voxelized Full Bodies v2", ISO/IEC
  JTC1/SC29 WG11 m40059/M74006, Jan 2017)
- MVUB:     http://plenodb.jpeg.org/pc/microsoft/
    andrew9 / david9 / phil9 / ricardo9 / sarah9 (upper-body vox9 zips)
  (Loop, Cai, Orts-Escolano, Chou, "Microsoft Voxelized Upper Bodies",
  ISO/IEC JTC1/SC29 WG11 m38673/M72012, May 2016)
- A public pre-trained 3DGS checkpoint set (for io/gsplat_ckpt.py and
  cli/voxelize_3dgs.py): https://repo-sam.inria.fr/fungraph/
  3d-gaussian-splatting/datasets/pretrained/models.zip (INRIA official
  pre-trained models, 14 GB); any `torch.save({'splats': ...})`
  checkpoint from gsplat's simple_trainer works too.

plenodb publishes no checksums, so this script records the sha256 of
every archive on first successful download into `<root>/CHECKSUMS.sha256`
and verifies against that file on later runs (tamper/corruption detection
across mirrors/resumes).

    python scripts/fetch_datasets.py --data-root /data/pc --dataset 8iVFBv2 \
        --sequence loot                       # download + extract + verify
    python scripts/fetch_datasets.py --data-root /data/pc --verify-only
    python scripts/fetch_datasets.py --data-root /data/pc --smoke
        # read the first frame of every present sequence through the
        # registry and report N/J; auto-skips what is absent

This environment has no network egress — here the script is expected to
be used with --verify-only/--smoke against an already-mounted tree.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.error
import urllib.request
import zipfile

BASE_8I = "http://plenodb.jpeg.org/pc/8ilabs"
BASE_MVUB = "http://plenodb.jpeg.org/pc/microsoft"

ARCHIVES = {
    ("8iVFBv2", seq): f"{BASE_8I}/{seq}.zip"
    for seq in ("longdress", "loot", "redandblack", "soldier")
}
ARCHIVES.update({
    ("MVUB", seq): f"{BASE_MVUB}/{seq}.zip"
    for seq in ("andrew9", "david9", "phil9", "ricardo9", "sarah9")
})


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def load_checksums(root: str) -> dict:
    path = os.path.join(root, "CHECKSUMS.sha256")
    out = {}
    if os.path.exists(path):
        for line in open(path):
            parts = line.split()
            if len(parts) == 2:
                out[parts[1]] = parts[0]
    return out


def save_checksums(root: str, sums: dict) -> None:
    with open(os.path.join(root, "CHECKSUMS.sha256"), "w") as f:
        for name in sorted(sums):
            f.write(f"{sums[name]}  {name}\n")


def fetch(dataset: str, sequence: str, root: str) -> bool:
    url = ARCHIVES.get((dataset, sequence))
    if url is None:
        print(f"no archive known for {dataset}/{sequence}")
        return False
    archive = os.path.join(root, os.path.basename(url))
    sums = load_checksums(root)
    name = os.path.basename(url)
    if not os.path.exists(archive):
        print(f"downloading {url} ...")
        try:
            urllib.request.urlretrieve(url, archive)  # nosec: canonical host
        except (urllib.error.URLError, OSError) as e:
            print(f"  download failed ({e}) — no network egress here? "
                  "Fetch on a networked machine and mount the tree.")
            return False
    digest = sha256(archive)
    if name in sums and sums[name] != digest:
        print(f"  CHECKSUM MISMATCH for {name}: recorded {sums[name]}, "
              f"got {digest} — refusing to extract")
        return False
    if name not in sums:
        sums[name] = digest
        save_checksums(root, sums)
        print(f"  recorded sha256 {digest}")
    print(f"extracting {archive} ...")
    with zipfile.ZipFile(archive) as z:
        z.extractall(os.path.join(root, dataset))
    return True


def verify(root: str, smoke: bool) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from raht3dgs_tpu.io.datasets import (
        DATASET_CONFIG,
        frame_path,
        get_pointcloud,
    )

    found = 0
    for ds, seqs in DATASET_CONFIG.items():
        for seq in seqs:
            p = frame_path(ds, seq, 1, data_root=root)
            if p is None or not os.path.exists(p):
                print(f"  absent: {ds}/{seq}")
                continue
            found += 1
            if not smoke:
                print(f"  present: {ds}/{seq} ({p})")
                continue
            out = get_pointcloud(ds, seq, 1, data_root=root)
            if out is None:
                print(f"  present but UNREADABLE: {p}")
                return 1
            V, C, depth = out
            print(f"  ok: {ds}/{seq} frame 1 -> N={len(V)}, J={depth}, "
                  f"C range [{C.min():.0f}, {C.max():.0f}]")
    print(f"{found} sequence(s) present under {root}")
    return 0 if found else 2


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--dataset", choices=("8iVFBv2", "MVUB"))
    ap.add_argument("--sequence")
    ap.add_argument("--verify-only", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="read frame 1 of every present sequence through "
                    "the registry (auto-skips absent sequences)")
    args = ap.parse_args(argv)
    os.makedirs(args.data_root, exist_ok=True)
    if args.verify_only or args.smoke:
        return verify(args.data_root, args.smoke)
    targets = [
        (ds, seq) for (ds, seq) in ARCHIVES
        if (args.dataset is None or ds == args.dataset)
        and (args.sequence is None or seq == args.sequence)
    ]
    ok = True
    for ds, seq in targets:
        ok &= fetch(ds, seq, args.data_root)
    if ok:
        return verify(args.data_root, smoke=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
