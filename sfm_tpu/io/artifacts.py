"""Stage-1 artifact reader: build a PairTable from on-disk pair files.

The reference persists per-pair artifacts (correspondences/pair_<i>_<j>_pts{1,2}.npy,
fundamental/..._F.npz, matches/..._matches.npz) plus matching_results.csv
(ref find_matches.py:312-327, :352-364), and its reconstruct stage re-reads
them (ref sfm_reconstruction.py:77-117, C18). This module reads both our own
artifacts and the reference's shipped ones, so `reconstruct` is a drop-in
resume point for either pipeline's preprocess output.

Keypoint identity across pairs is recovered by interning exact pixel
coordinates per image: the same physical keypoint appears with bit-identical
coords in every pair file that includes it, which is exactly the identity the
union-find track builder needs.
"""
from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from sfm_tpu.matching.sweep import PairTable


def _img_id(name: str) -> int:
    digits = "".join(c for c in str(name).split("/")[-1].split(".")[0] if c.isdigit())
    return int(digits) if digits else 0


def load_pair_artifacts(data_dir, max_matches: int = 1024):
    """Read matching_results.csv + per-pair files into (PairTable, xy).

    Returns (table, xy (N, K, 2) interned keypoint coords, num_images).
    Accepted pairs are exactly the CSV rows; per-pair correspondences come
    from correspondences/pair_<i>_<j>_pts{1,2}.npy (inliers only in the
    reference's output — match_valid == inliers in that case).
    """
    d = Path(data_dir)
    csv_path = d / "matching_results.csv"
    if not csv_path.exists():
        raise FileNotFoundError(csv_path)

    rows = []
    with csv_path.open() as f:
        for row in csv.DictReader(f):
            rows.append(row)
    if not rows:
        raise ValueError(f"empty {csv_path}")

    # Column names: ours are image1/image2; the reference's shipped CSV uses
    # img1/img2 (+ a pair_name column).
    def img_col(r, a, b):
        return r.get(a) if r.get(a) is not None else r[b]

    pair_ids = [
        (_img_id(img_col(r, "image1", "img1")), _img_id(img_col(r, "image2", "img2")))
        for r in rows
    ]
    num_images = max(max(i, j) for i, j in pair_ids) + 1

    # Intern keypoints: (img, x, y) -> keypoint id.
    intern: Dict[int, Dict[Tuple[float, float], int]] = {
        i: {} for i in range(num_images)
    }

    def kp_id(img: int, x: float, y: float) -> int:
        key = (round(float(x), 3), round(float(y), 3))
        table = intern[img]
        if key not in table:
            table[key] = len(table)
        return table[key]

    P = len(rows)
    M = max_matches
    xy1 = np.zeros((P, M, 2), np.float32)
    xy2 = np.zeros((P, M, 2), np.float32)
    idx1 = np.zeros((P, M), np.int32)
    idx2 = np.zeros((P, M), np.int32)
    match_valid = np.zeros((P, M), bool)
    inliers = np.zeros((P, M), bool)
    Fs = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))

    for p, ((i, j), row) in enumerate(zip(pair_ids, rows)):
        stem = f"pair_{i}_{j}"
        p1f = d / "correspondences" / f"{stem}_pts1.npy"
        p2f = d / "correspondences" / f"{stem}_pts2.npy"
        if not p1f.exists():
            continue
        p1 = np.load(p1f).reshape(-1, 2)
        p2 = np.load(p2f).reshape(-1, 2)
        n = min(len(p1), M)
        xy1[p, :n] = p1[:n]
        xy2[p, :n] = p2[:n]
        match_valid[p, :n] = True
        inliers[p, :n] = True  # reference persists inlier correspondences
        for m in range(n):
            idx1[p, m] = kp_id(i, *p1[m])
            idx2[p, m] = kp_id(j, *p2[m])
        ff = d / "fundamental" / f"{stem}_F.npz"
        if ff.exists():
            Fs[p] = np.load(ff)["F"].astype(np.float32)

    # Assemble interned keypoint coordinate table.
    K = max((len(t) for t in intern.values()), default=1)
    xy = np.zeros((num_images, max(K, 1), 2), np.float32)
    for img, table in intern.items():
        for (x, y), k in table.items():
            xy[img, k] = (x, y)

    def col(name, cast):
        return np.array([cast(r.get(name, 0)) for r in rows])

    table = PairTable(
        pairs=np.array(pair_ids, np.int32),
        accept=np.ones(P, bool),
        num_matches=col("num_matches", lambda v: int(float(v))),
        num_inliers=col("num_inliers", lambda v: int(float(v))),
        inlier_ratio=col("inlier_ratio", float).astype(np.float32),
        reprojection_error=col("reprojection_error", float).astype(np.float32),
        well_distributed=col("well_distributed", lambda v: str(v).lower() in ("true", "1")),
        F=Fs,
        xy1=xy1,
        xy2=xy2,
        idx1=idx1,
        idx2=idx2,
        match_valid=match_valid,
        inliers=inliers,
    )
    return table, xy, num_images
