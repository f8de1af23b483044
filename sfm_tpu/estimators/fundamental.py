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


@partial(jax.jit, static_argnames=("iters", "prefix_valid", "score_budget"))
def estimate_fundamental_ransac(
    key,
    pts1,
    pts2,
    valid,
    iters: int = 2048,
    threshold: float = 3.0,
    prefix_valid: bool = False,
    score_budget: int = 0,
):
    """Robust F estimation from padded correspondences.

    pts1, pts2: (N, 2) pixel coords; valid: (N,) bool. Returns a dict:
      F          (3, 3)  rank-2, unit Frobenius norm, refit on all inliers
      inliers    (N,)    bool, symmetric epipolar distance < threshold
      num_inliers ()     int32
      errors     (N,)    symmetric epipolar distances under the refit F
      ok         ()      bool — enough valid rows to attempt (>= 8)

    ``prefix_valid``: set when valid rows form a leading prefix (compacted
    match tables) — enables O(iters*k) sampling instead of an (iters, N) sort.
    ``score_budget``: if >0, hypotheses are *selected* on only the first
    ``score_budget`` rows (rows are quality-sorted in the sweep path, so this
    subset is the most informative); the final consensus refit and the
    reported inliers always use the full set. Cuts the (iters, N) error
    matrix, the dominant per-pair cost, by N/score_budget.

    Contract parity: RANSAC at ``threshold`` px (ref 3.0), then inliers
    re-derived from the symmetric epipolar distance of the *final* F (the
    reference discards cv2's own mask the same way, find_matches.py:284-291).
    """
    pts1 = jnp.asarray(pts1, jnp.float32)
    pts2 = jnp.asarray(pts2, jnp.float32)
    valid = jnp.asarray(valid, bool)
    n_valid = jnp.sum(valid)
    ok = n_valid >= 8

    idx = ransac_sample_indices(key, valid, iters, 8, prefix=prefix_valid)
    s1 = pts1[idx]  # (iters, 8, 2)
    s2 = pts2[idx]
    # Hypotheses skip the rank-2 SVD (3x3 SVDs x thousands of hypotheses
    # dominate TPU wall-clock; epipolar scoring is first-order insensitive)
    # and use 3 inverse-iteration steps (minimal samples have an exact null
    # space: convergence is immediate).
    # Hypothesis solves: no rank-2 SVD, 3 inverse-iteration steps (exact null
    # space on minimal samples), and no Cholesky-fallback tier (a degenerate
    # sample's junk F simply scores no consensus).
    Fs = jax.vmap(
        lambda a, b: eight_point(a, b, enforce_rank2=False, null_iters=3,
                                 null_fallback=False)
    )(s1, s2)

    # Score every hypothesis against the scoring subset: (iters, N_score).
    if score_budget and score_budget < pts1.shape[0]:
        sc1, sc2, scv = pts1[:score_budget], pts2[:score_budget], valid[:score_budget]
    else:
        sc1, sc2, scv = pts1, pts2, valid
    errors = jax.vmap(symmetric_epipolar_distance, in_axes=(0, None, None))(Fs, sc1, sc2)
    best_h, _, _ = ransac_select(errors, scv, threshold)

    # Consensus of the winning hypothesis over the FULL set, then refit
    # (weighted 8-point with rank-2 enforcement), then final inliers.
    err_h = symmetric_epipolar_distance(Fs[best_h], pts1, pts2)
    w = ((err_h < threshold) & valid).astype(jnp.float32)
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
