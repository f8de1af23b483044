"""Stage-1 sweep on the bunny dataset: features + all-pairs match/verify.

Usage: python scripts/bunny_sweep.py  (saves features + PairTable to /tmp)
"""
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sfm_tpu.io.images import load_image_gray, load_mask
from sfm_tpu.features import detect_and_describe
from sfm_tpu.matching import all_pairs_sweep
from sfm_tpu.config import SfMConfig

T0 = time.time()


def log(msg):
    print("[%8.1fs] %s" % (time.time() - T0, msg), flush=True)


def main(data_dir="/root/reference/bunny_data", chunk_size=32):
    d = Path(data_dir)
    imgs = [load_image_gray(p) for p in sorted((d / "images").glob("*.ppm"))]
    masks = [load_mask(p) for p in sorted((d / "silhouettes").glob("*.pgm"))]
    log("loaded %d images" % len(imgs))

    cfg = SfMConfig()
    feats = []
    for n, (im, mk) in enumerate(zip(imgs, masks)):
        f = detect_and_describe(im, mk, config=cfg.features)
        f.xy.block_until_ready()
        if n == 0:
            log("first detect done")
        feats.append(f)
    log("features done")
    # Stack on device, transfer once: per-array device->host round-trips over
    # the TPU tunnel are latency-bound.
    import jax.numpy as jnp
    from sfm_tpu.utils.transfer import device_get_chunked
    xy_d = jnp.stack([f.xy for f in feats])
    desc_d = jnp.stack([f.desc for f in feats])
    valid_d = jnp.stack([f.valid for f in feats])
    xy, desc, valid = device_get_chunked((xy_d, desc_d, valid_d))
    log("transferred")
    log(
        "kps per image: min %d mean %.0f max %d"
        % (valid.sum(1).min(), valid.sum(1).mean(), valid.sum(1).max())
    )
    np.savez("/tmp/bunny_feats.npz", xy=xy, desc=desc, valid=valid)

    t0 = time.time()
    table = all_pairs_sweep(xy, desc, valid, cfg, chunk_size=chunk_size)
    dt = time.time() - t0
    log("sweep: %.1fs (%d pairs, %.1f pairs/s)" % (dt, table.num_pairs, table.num_pairs / dt))
    acc = table.accepted()
    log("accepted pairs: %d" % len(acc))
    if len(acc):
        log(
            "mean matches %.1f  inliers %.1f  ratio %.3f  err %.3f px"
            % (
                table.num_matches[acc].mean(),
                table.num_inliers[acc].mean(),
                table.inlier_ratio[acc].mean(),
                table.reprojection_error[acc].mean(),
            )
        )
        deg = np.zeros(len(imgs), int)
        for p in acc:
            i, j = table.pairs[p]
            deg[i] += 1
            deg[j] += 1
        log("degree min/mean/max: %d %.1f %d" % (deg.min(), deg.mean(), deg.max()))
    with open("/tmp/bunny_table.pkl", "wb") as f:
        pickle.dump(table, f)
    log("saved table")


if __name__ == "__main__":
    main()
