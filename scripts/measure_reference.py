"""Measure the CPU reference pipeline's per-pair throughput on bunny.

The reference records no wall-clock anywhere (BASELINE.md), so we measure an
equivalent of its per-pair path, built from its documented parameters
(SURVEY.md C4-C6; utils/find_matches.py:74-310): FAST(threshold=20) detect +
ORB(nfeatures=10000) describe, BFMatcher Hamming knn k=2 with 0.75 ratio,
cv2.findFundamentalMat FM_RANSAC @3.0 px, symmetric-epipolar inlier
re-derivation, quality gates. This is a re-implementation from the survey's
behavioral description for timing purposes — not a copy of reference code.

Writes BASELINE_MEASURED.json at the repo root.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np
import cv2

ROOT = Path(__file__).resolve().parents[1]
BUNNY = Path("/root/reference/bunny_data")


def load_gray(p):
    img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
    assert img is not None, p
    return img


def load_mask(p):
    m = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
    _, m = cv2.threshold(m, 127, 255, cv2.THRESH_BINARY_INV)
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, np.ones((3, 3), np.uint8))
    return m


def detect(img, mask):
    fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    orb = cv2.ORB_create(nfeatures=10000, scaleFactor=1.2, nlevels=8, edgeThreshold=31)
    kps = fast.detect(img, mask)
    kps, desc = orb.compute(img, kps)
    return kps, desc


def match_pair(k1, d1, k2, d2):
    if d1 is None or d2 is None or len(d1) < 8 or len(d2) < 8:
        return None
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    knn = bf.knnMatch(d1, d2, k=2)
    good = [m for m, n in (p for p in knn if len(p) == 2) if m.distance < 0.75 * n.distance]
    if len(good) < 8:
        return None
    p1 = np.float32([k1[m.queryIdx].pt for m in good])
    p2 = np.float32([k2[m.trainIdx].pt for m in good])
    F, _ = cv2.findFundamentalMat(p1, p2, cv2.FM_RANSAC, 3.0, 0.99)
    if F is None:
        return None
    # symmetric epipolar re-derivation (find_matches.py:157-201 semantics)
    h1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
    h2 = np.concatenate([p2, np.ones((len(p2), 1))], 1)
    l2 = h1 @ F.T
    l1 = h2 @ F
    d2e = np.abs(np.sum(h2 * l2, 1)) / np.linalg.norm(l2[:, :2], axis=1)
    d1e = np.abs(np.sum(h1 * l1, 1)) / np.linalg.norm(l1[:, :2], axis=1)
    err = 0.5 * (d1e + d2e)
    inl = err < 3.0
    return {"num": len(good), "inl": int(inl.sum()),
            "err": float(err[inl].mean()) if inl.any() else 0.0}


def main(n_images=36):
    imgs = sorted((BUNNY / "images").glob("*.ppm"))[:n_images]
    masks = sorted((BUNNY / "silhouettes").glob("*.pgm"))[:n_images]

    t0 = time.time()
    feats = [detect(load_gray(i), load_mask(m)) for i, m in zip(imgs, masks)]
    t_detect = time.time() - t0
    print(f"detect: {t_detect:.1f}s for {len(imgs)} images", file=sys.stderr)

    pairs = [(i, j) for i in range(len(imgs)) for j in range(i + 1, len(imgs))]
    t0 = time.time()
    results = []
    for i, j in pairs:
        r = match_pair(*feats[i], *feats[j])
        if r:
            results.append(r)
    t_match = time.time() - t0
    pairs_per_sec = len(pairs) / t_match
    print(
        f"match+verify: {t_match:.1f}s for {len(pairs)} pairs "
        f"({pairs_per_sec:.2f} pairs/s), {len(results)} with >=8 ratio matches",
        file=sys.stderr,
    )

    out = {
        "machine": "this container CPU",
        "n_images": len(imgs),
        "detect_s": t_detect,
        "detect_images_per_s": len(imgs) / t_detect,
        "match_verify_s": t_match,
        "pairs": len(pairs),
        "pairs_per_sec": pairs_per_sec,
        "method": "reference-equivalent FAST+ORB+BF-knn+FM_RANSAC per SURVEY.md C4-C6",
    }
    (ROOT / "BASELINE_MEASURED.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
