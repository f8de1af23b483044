"""End-to-end batched-frontend throughput on the 36 bunny images (real TPU).

Measures what ImageMatcher.detect_all actually runs: native u8 batch decode
-> detect_and_describe_batch (sub-batched vmapped dispatches, chunked
uploads). Reports cold and warm imgs/s; the reference CPU baseline is
138 imgs/s (BASELINE_MEASURED.json).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from sfm_tpu.config import FeatureConfig
from sfm_tpu.io.native import load_gray_u8_batch, load_mask_batch
from sfm_tpu.features import detect_and_describe_batch


def main(upsample=True, batch=None):
    img_dir = Path("/root/reference/bunny_data/images")
    mask_dir = Path("/root/reference/bunny_data/silhouettes")
    paths = sorted(img_dir.glob("*.ppm"))
    mpaths = [mask_dir / (p.stem + ".pgm") for p in paths]
    cfg = FeatureConfig(upsample_first_octave=upsample)
    if batch is not None:
        cfg = FeatureConfig(upsample_first_octave=upsample, detect_batch=batch)
    print(f"config: upsample={upsample} detect_batch={cfg.detect_batch}",
          flush=True)

    t0 = time.time()
    imgs = load_gray_u8_batch(paths, 768, 1024)
    masks = load_mask_batch(mpaths, 768, 1024)
    t_load = time.time() - t0
    print(f"decode {len(paths)} imgs+masks: {t_load*1e3:.0f} ms "
          f"({len(paths)/t_load:.0f} imgs/s)", flush=True)

    def run():
        f = detect_and_describe_batch(
            imgs, masks, config=cfg, batch_size=cfg.detect_batch)
        jax.block_until_ready(f.desc)
        # tunnel: block_until_ready does not actually block; force a sync
        return np.asarray(f.valid[:, :1]).sum(), f

    t0 = time.time()
    nval, f = run()
    t_cold = time.time() - t0
    print(f"cold: {t_cold:.1f} s ({len(paths)/t_cold:.1f} imgs/s)", flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    t_warm = float(np.median(times))
    kps = np.asarray(f.valid).sum(1)
    print(f"warm: {t_warm:.2f} s ({len(paths)/t_warm:.1f} imgs/s) "
          f"runs={[f'{t:.2f}' for t in times]}", flush=True)
    print(f"keypoints/img: mean {kps.mean():.0f} min {kps.min()} max {kps.max()}",
          flush=True)
    print(f"e2e incl decode warm: {len(paths)/(t_warm+t_load):.1f} imgs/s",
          flush=True)


if __name__ == "__main__":
    up = "noup" not in sys.argv[1:]
    batch = None
    for a in sys.argv[1:]:
        if a.isdigit():
            batch = int(a)
    main(upsample=up, batch=batch)
