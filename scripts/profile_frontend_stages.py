"""Cumulative-stage timing of the PRODUCTION batched frontend (real TPU).

profile_detect.py times stages as isolated programs, which misses fusion
across stage boundaries. This harness instead jits CUMULATIVE PREFIXES of
_detect_impl (pyramid | +extrema/select | +refine/global-topk | full) under
the same (batch, geometry) as production, so each stage's cost is the delta
between consecutive prefixes under real fusion.

Usage: python scripts/profile_frontend_stages.py [batch] [noup]
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import FeatureConfig
from sfm_tpu.io.native import load_gray_u8_batch
from sfm_tpu.features.pyramid import build_pyramid
from sfm_tpu.features.detect import (
    dog_extrema_scores, refine_and_gate, select_octave_candidates)
from sfm_tpu.features.frontend import _detect_impl, _octave_budget


def prefix(image, config: FeatureConfig, upto: str):
    """Re-traces _detect_impl's stages up to `upto`, returning live outputs."""
    from sfm_tpu.features.frontend import _normalize_image

    image = _normalize_image(image)
    S = config.scales_per_octave
    gaussians, dogs = build_pyramid(
        image, num_octaves=config.num_octaves, scales_per_octave=S,
        sigma0=config.sigma0, assumed_blur=config.assumed_blur,
        upsample=config.upsample_first_octave)
    if upto == "pyramid":
        # Sum, not the stacks: returning full stacks adds HBM writes the
        # production program never pays for the last octave's fused consumers.
        return sum(jnp.sum(d) for d in dogs)
    outs = []
    for o in range(config.num_octaves):
        fields = dog_extrema_scores(
            dogs[o], config.contrast_threshold, config.edge_threshold)
        cands = select_octave_candidates(
            fields, _octave_budget(config.max_keypoints, o))
        if upto == "select":
            outs.append((cands["score"], cands["x"]))
            continue
        off_x, off_y, off_s, gated = refine_and_gate(
            dogs[o], cands["layer"], cands["y"], cands["x"],
            config.contrast_threshold, config.edge_threshold)
        outs.append((gated, cands["x"].astype(jnp.float32) + off_x))
    return outs


def timeit(f, n=10, warmup=2):
    for _ in range(warmup):
        r = jax.block_until_ready(f())
        np.asarray(jax.tree.leaves(r)[0])  # force tunnel sync
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = jax.block_until_ready(f())
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main(batch=12, upsample=True):
    cfg = FeatureConfig(upsample_first_octave=upsample)
    paths = sorted(Path("/root/reference/bunny_data/images").glob("*.ppm"))[:batch]
    imgs = jnp.asarray(load_gray_u8_batch(paths, 768, 1024))
    print(f"batch={batch} upsample={upsample}", flush=True)

    stages = []
    for name in ("pyramid", "select", "refine"):
        fn = jax.jit(jax.vmap(partial(prefix, config=cfg, upto=name)))
        t = timeit(lambda: fn(imgs))
        stages.append((name, t))
        print(f"  upto {name:8s}: {t:7.1f} ms/batch  {t/batch:6.2f} ms/img",
              flush=True)

    full = jax.jit(jax.vmap(
        lambda im: _detect_impl(im, jnp.ones((1, 1), bool), cfg, False)))
    t = timeit(lambda: full(imgs))
    stages.append(("full", t))
    print(f"  full frontend: {t:7.1f} ms/batch  {t/batch:6.2f} ms/img "
          f"({batch/(t/1e3):.1f} imgs/s)", flush=True)
    prev = 0.0
    print("deltas (stage cost under fusion):", flush=True)
    for name, t in stages:
        print(f"  {name:8s}: {(t-prev)/batch:6.2f} ms/img", flush=True)
        prev = t


if __name__ == "__main__":
    b = 12
    for a in sys.argv[1:]:
        if a.isdigit():
            b = int(a)
    main(batch=b, upsample="noup" not in sys.argv[1:])
