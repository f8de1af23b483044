"""Full bunny pipeline on forced CPU — config iteration without the TPU tunnel.

Usage: python scripts/bunny_full_cpu.py [contrast_threshold] [prune_mult]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sfm_tpu.config import SfMConfig, FeatureConfig, BAConfig
from sfm_tpu.io.native import load_gray_batch, load_mask_batch, probe
from sfm_tpu.features import detect_and_describe
from sfm_tpu.matching import all_pairs_sweep
from sfm_tpu.reconstruction import StructureFromMotion

T0 = time.time()


def log(m):
    print("[%7.1fs] %s" % (time.time() - T0, m), flush=True)


def main(ct=0.006, prune=3.0, seed=0, upsample=False, kind="sift"):
    d = Path("/root/reference/bunny_data")
    imgs = sorted((d / "images").glob("*.ppm"))
    masks = sorted((d / "silhouettes").glob("*.pgm"))
    h, w, _ = probe(imgs[0])
    gray = load_gray_batch(imgs, h, w)
    mk = load_mask_batch(masks, h, w)
    log("loaded %d images (native)" % len(imgs))

    cfg = SfMConfig(
        features=FeatureConfig(contrast_threshold=ct, upsample_first_octave=upsample,
                               kind=kind),
        ba=BAConfig(prune_multiplier=prune),
        seed=seed,
    )
    feats = []
    for i in range(len(imgs)):
        feats.append(detect_and_describe(gray[i], mk[i], config=cfg.features))
    xy = np.stack([np.asarray(f.xy) for f in feats])
    desc = np.stack([np.asarray(f.desc) for f in feats])
    valid = np.stack([np.asarray(f.valid) for f in feats])
    log("features: kps min %d mean %.0f max %d" % (
        valid.sum(1).min(), valid.sum(1).mean(), valid.sum(1).max()))

    table = all_pairs_sweep(xy, desc, valid, cfg)
    acc = table.accepted()
    deg = np.zeros(len(imgs), int)
    for p in acc:
        i, j = table.pairs[p]
        deg[i] += 1
        deg[j] += 1
    log("sweep: %d accepted, inliers %.1f, err %.3f, degree min %d" % (
        len(acc), table.num_inliers[acc].mean(),
        table.reprojection_error[acc].mean(), deg.min()))

    sfm = StructureFromMotion(table, xy, cfg)
    res = sfm.run_reconstruction()
    s = res.stats
    log("RESULT ct=%s prune=%s seed=%d up=%s kind=%s: cams=%d pts=%d obs=%d "
        "err=%.3f maxerr=%.1f tracklen=%.2f" % (
            ct, prune, seed, upsample, kind, s["num_cameras"], s["num_points"],
            s["num_observations"], s["mean_reprojection_error"],
            s["max_reprojection_error"], s["mean_track_length"]))
    calib = d / "calib"
    if calib.is_dir():
        from sfm_tpu.io.calib import evaluate_result_against_gt

        # Full-range run: engine ids == calib stems, no name map needed.
        ev = evaluate_result_against_gt(calib, res)
        if ev is not None:
            log("GT: rot med %.3f deg / max %.3f, ATE %.4f (%.2f%% scene)" % (
                ev["rot_err_deg_median"], ev["rot_err_deg_max"],
                ev["ate"], 100 * ev["ate_rel"]))
    return res


if __name__ == "__main__":
    ct = float(sys.argv[1]) if len(sys.argv) > 1 else 0.006
    prune = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    upsample = "up" in sys.argv[3:]
    kind = "orb" if "orb" in sys.argv[3:] else "sift"
    main(ct, prune, upsample=upsample, kind=kind)
