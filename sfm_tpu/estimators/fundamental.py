"""Fundamental-matrix RANSAC (replaces cv2.findFundamentalMat FM_RANSAC,
ref find_matches.py:282) plus the reference's inlier re-derivation via the
symmetric epipolar distance (ref find_matches.py:157-201).

One call = one image pair; vmap over a leading pair axis for the sharded
all-pairs sweep. All shapes static: correspondences are padded to a fixed N
with a validity mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.geometry.epipolar import eight_point, symmetric_epipolar_distance
from sfm_tpu.estimators.ransac import ransac_sample_indices, ransac_select


@partial(jax.jit, static_argnames=("iters",))
def estimate_fundamental_ransac(
    key,
    pts1,
    pts2,
    valid,
    iters: int = 2048,
    threshold: float = 3.0,
):
    """Robust F estimation from padded correspondences.

    pts1, pts2: (N, 2) pixel coords; valid: (N,) bool. Returns a dict:
      F          (3, 3)  rank-2, unit Frobenius norm, refit on all inliers
      inliers    (N,)    bool, symmetric epipolar distance < threshold
      num_inliers ()     int32
      errors     (N,)    symmetric epipolar distances under the refit F
      ok         ()      bool — enough valid rows to attempt (>= 8)

    Mirrors the reference contract: RANSAC at ``threshold`` px (ref 3.0), then
    inliers re-derived from the symmetric epipolar distance of the *final* F
    (the reference discards cv2's own mask the same way, find_matches.py:284-291).
    """
    pts1 = jnp.asarray(pts1, jnp.float32)
    pts2 = jnp.asarray(pts2, jnp.float32)
    valid = jnp.asarray(valid, bool)
    n_valid = jnp.sum(valid)
    ok = n_valid >= 8

    idx = ransac_sample_indices(key, valid, iters, 8)  # (iters, 8)
    s1 = pts1[idx]  # (iters, 8, 2)
    s2 = pts2[idx]
    # Hypotheses skip the rank-2 SVD (3x3 SVDs x thousands of hypotheses
    # dominate TPU wall-clock; epipolar scoring is first-order insensitive).
    Fs = jax.vmap(lambda a, b: eight_point(a, b, enforce_rank2=False))(s1, s2)

    # Score every hypothesis against every correspondence: (iters, N).
    errors = jax.vmap(symmetric_epipolar_distance, in_axes=(0, None, None))(Fs, pts1, pts2)
    _, best_inliers, _ = ransac_select(errors, valid, threshold)

    # Refit on the winning consensus set (weighted 8-point), then re-derive
    # the final inlier set from the refit model.
    w = best_inliers.astype(jnp.float32)
    F = eight_point(pts1, pts2, w)
    final_err = symmetric_epipolar_distance(F, pts1, pts2)
    inliers = (final_err < threshold) & valid
    return {
        "F": F,
        "inliers": inliers & ok,
        "num_inliers": jnp.sum(inliers & ok).astype(jnp.int32),
        "errors": final_err,
        "ok": ok,
    }
