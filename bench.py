"""Headline benchmark: all-pairs match+verify throughput on the bunny set.

Prints ONE JSON line:
  {"metric": "pairs_matched_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": R}

The measured stage is the framework's core device program — descriptor
matching (MXU matmul + top-2 ratio test + mutual check) and geometric
verification (2048-hypothesis vmapped F-RANSAC + quality gates) per image
pair, the reference's find_matches.py:246-310 hot loop. The baseline is the
reference-equivalent OpenCV CPU path measured on this machine
(BASELINE_MEASURED.json, scripts/measure_reference.py), since the reference
publishes no numbers (BASELINE.md).

Timing excludes compilation (one warmup chunk) and excludes device->host
transfer of bulk per-pair artifacts (they stay on device; production
consumers read them there).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

BUNNY = Path("/root/reference/bunny_data")
FEATS_CACHE = Path("/tmp/bunny_feats_bench.npz")


def get_features(cfg):
    """Detect features for all bunny images (cached across bench runs)."""
    import jax
    from sfm_tpu.io.images import load_image_gray, load_mask
    from sfm_tpu.features import detect_and_describe
    from sfm_tpu.utils.transfer import device_get_chunked

    if FEATS_CACHE.exists():
        z = np.load(FEATS_CACHE)
        return z["xy"], z["desc"], z["valid"]
    import jax.numpy as jnp

    imgs = sorted((BUNNY / "images").glob("*.ppm"))
    masks = sorted((BUNNY / "silhouettes").glob("*.pgm"))
    feats = [
        detect_and_describe(load_image_gray(i), load_mask(m), config=cfg.features)
        for i, m in zip(imgs, masks)
    ]
    xy = jnp.stack([f.xy for f in feats])
    desc = jnp.stack([f.desc for f in feats])
    valid = jnp.stack([f.valid for f in feats])
    xy_h, desc_h, valid_h = device_get_chunked((xy, desc, valid))
    np.savez(FEATS_CACHE, xy=xy_h, desc=desc_h, valid=valid_h)
    return xy_h, desc_h, valid_h


def main():
    import jax
    import jax.numpy as jnp
    from sfm_tpu.config import SfMConfig
    from sfm_tpu.matching.sweep import _sweep_chunk_fn, candidate_pairs

    cfg = SfMConfig()
    xy, desc, valid = get_features(cfg)
    n = xy.shape[0]
    pairs = candidate_pairs(n)
    P = pairs.shape[0]

    chunk = 32
    pad = (-P) % chunk
    pairs_p = np.concatenate([pairs, np.zeros((pad, 2), np.int32)]) if pad else pairs
    keys = jax.random.split(jax.random.key(0), P + pad)

    xy_d = jnp.asarray(xy)
    desc_d = jnp.asarray(desc)
    valid_d = jnp.asarray(valid)
    fn = jax.jit(_sweep_chunk_fn(cfg))

    # Warmup / compile.
    out = fn(keys[:chunk], jnp.asarray(pairs_p[:chunk]), xy_d, desc_d, valid_d)
    jax.block_until_ready(out)

    # Timed sweep over all pairs; outputs stay on device.
    t0 = time.time()
    outs = []
    for c0 in range(0, P + pad, chunk):
        outs.append(
            fn(keys[c0:c0 + chunk], jnp.asarray(pairs_p[c0:c0 + chunk]),
               xy_d, desc_d, valid_d)
        )
    jax.block_until_ready(outs)
    dt = time.time() - t0
    pairs_per_sec = P / dt

    accepted = int(np.sum(np.concatenate([np.asarray(o["accept"]) for o in outs])[:P]))

    baseline_file = ROOT / "BASELINE_MEASURED.json"
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())["pairs_per_sec"]
    else:
        base = float("nan")
    print(
        json.dumps(
            {
                "metric": "pairs_matched_per_sec",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / base, 2) if base == base else None,
                "detail": {
                    "pairs": int(P),
                    "sweep_s": round(dt, 3),
                    "accepted_pairs": accepted,
                    "baseline_pairs_per_sec": base if base == base else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
