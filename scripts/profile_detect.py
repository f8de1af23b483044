"""Per-stage timing of the feature frontend on one bunny image (real TPU).

Times each sub-program separately (pyramid conv stack, extrema grids,
candidate top-k, orientation, descriptor) to locate the wall-clock sink.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import FeatureConfig
from sfm_tpu.io.images import load_image_gray, load_mask
from sfm_tpu.features.pyramid import build_pyramid
from sfm_tpu.features.detect import dog_extrema_scores, select_octave_candidates
from sfm_tpu.features.descriptor import (
    octave_gradients, keypoint_orientation, keypoint_descriptor,
)
from sfm_tpu.features.frontend import detect_and_describe, _octave_budget


def timeit(f, n=10, warmup=1):
    for _ in range(warmup):
        r = f()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def main():
    cfg = FeatureConfig()
    img = jnp.asarray(load_image_gray("/root/reference/bunny_data/images/0000.ppm"))
    mask = jnp.asarray(load_mask("/root/reference/bunny_data/silhouettes/0000.pgm"))

    t_full = timeit(lambda: detect_and_describe(img, mask, config=cfg), n=5)
    print(f"full frontend: {t_full:.1f} ms", flush=True)

    pyr = jax.jit(lambda x: build_pyramid(x, cfg.num_octaves, cfg.scales_per_octave,
                                          cfg.sigma0, cfg.assumed_blur))
    print(f"pyramid:       {timeit(lambda: pyr(img)):.1f} ms", flush=True)

    gaussians, dogs = pyr(img)
    for o in range(cfg.num_octaves):
        d = dogs[o]
        ext = jax.jit(lambda x: dog_extrema_scores(x, cfg.contrast_threshold, cfg.edge_threshold))
        t_e = timeit(lambda: ext(d))
        fields = ext(d)
        budget = _octave_budget(cfg.max_keypoints, o)
        sel = jax.jit(lambda f: select_octave_candidates(f, budget))
        t_s = timeit(lambda: sel(fields))
        cands = sel(fields)
        gx, gy = octave_gradients(gaussians[o])
        layer = cands["layer"] - 1
        x_o = cands["x"].astype(jnp.float32)
        y_o = cands["y"].astype(jnp.float32)
        sig = jnp.full_like(x_o, 2.0)
        ori = jax.jit(jax.vmap(lambda xx, yy, ll, ss: keypoint_orientation(gx, gy, xx, yy, ll, ss)))
        t_o = timeit(lambda: ori(x_o, y_o, layer, sig))
        ang = ori(x_o, y_o, layer, sig)
        dsc = jax.jit(jax.vmap(lambda xx, yy, ll, ss, aa: keypoint_descriptor(gx, gy, xx, yy, ll, ss, aa)))
        t_d = timeit(lambda: dsc(x_o, y_o, layer, sig, ang))
        print(f"octave {o} ({d.shape}): extrema {t_e:.1f} ms, top-k {t_s:.1f} ms, "
              f"orient({budget}) {t_o:.1f} ms, desc {t_d:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
