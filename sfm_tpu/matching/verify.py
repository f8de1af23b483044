"""Geometric verification of a matched pair + the reference's quality gates.

Gates mirror ref find_matches.py:203-214 exactly:
  num_inliers >= 15, inlier_ratio >= 0.3, mean inlier symmetric-epipolar
  error <= 2.0 px, and point spread (std) > 20 px on both axes of both images
  ("well-distributed").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.estimators.fundamental import estimate_fundamental_ransac
from sfm_tpu.matching.core import match_descriptors

_EPS = 1e-12


def _masked_std(x, w):
    """Weighted std of (N,) values with weights (N,)."""
    n = jnp.maximum(jnp.sum(w), _EPS)
    mean = jnp.sum(x * w) / n
    var = jnp.sum(w * (x - mean) ** 2) / n
    return jnp.sqrt(var)


@partial(jax.jit, static_argnames=("ransac_iters", "prefix_valid", "score_budget"))
def verify_pair(
    key,
    xy1,
    xy2,
    valid,
    ransac_iters: int = 2048,
    ransac_threshold: float = 3.0,
    min_inliers: int = 15,
    min_inlier_ratio: float = 0.3,
    max_reproj_error: float = 2.0,
    min_spread: float = 20.0,
    prefix_valid: bool = False,
    score_budget: int = 0,
):
    """RANSAC F + quality gates on one padded match set.

    Returns dict: F, inliers (N,), num_matches, num_inliers, inlier_ratio,
    reprojection_error (mean inlier symmetric-epipolar error, px),
    well_distributed (bool), accept (bool).
    """
    est = estimate_fundamental_ransac(
        key, xy1, xy2, valid, iters=ransac_iters, threshold=ransac_threshold,
        prefix_valid=prefix_valid, score_budget=score_budget,
    )
    inl = est["inliers"]
    w = inl.astype(jnp.float32)
    n_matches = jnp.sum(valid).astype(jnp.int32)
    n_inl = est["num_inliers"]
    ratio = n_inl.astype(jnp.float32) / jnp.maximum(n_matches.astype(jnp.float32), 1.0)
    mean_err = jnp.sum(jnp.where(inl, est["errors"], 0.0)) / jnp.maximum(
        n_inl.astype(jnp.float32), 1.0
    )
    spread_ok = (
        (_masked_std(xy1[:, 0], w) > min_spread)
        & (_masked_std(xy1[:, 1], w) > min_spread)
        & (_masked_std(xy2[:, 0], w) > min_spread)
        & (_masked_std(xy2[:, 1], w) > min_spread)
    )
    accept = (
        est["ok"]
        & (n_inl >= min_inliers)
        & (ratio >= min_inlier_ratio)
        & (mean_err <= max_reproj_error)
        & spread_ok
    )
    return {
        "F": est["F"],
        "inliers": inl,
        "num_matches": n_matches,
        "num_inliers": n_inl,
        "inlier_ratio": ratio,
        "reprojection_error": mean_err,
        "well_distributed": spread_ok,
        "accept": accept,
    }


@partial(jax.jit, static_argnames=("max_matches", "mutual_check", "ransac_iters"))
def match_and_verify(
    key,
    desc1, xy_1, valid1,
    desc2, xy_2, valid2,
    ratio_threshold: float = 0.75,
    max_matches: int = 1024,
    mutual_check: bool = True,
    ransac_iters: int = 2048,
    ransac_threshold: float = 3.0,
    min_inliers: int = 15,
    min_inlier_ratio: float = 0.3,
    max_reproj_error: float = 2.0,
    min_spread: float = 20.0,
):
    """Full per-pair path: descriptor match -> F-RANSAC -> quality gates.

    This is the unit that the all-pairs sweep vmaps/shards over. Returns the
    verify_pair dict plus the padded match arrays (xy1, xy2, match_valid,
    idx1, idx2).
    """
    m = match_descriptors(
        desc1, valid1, desc2, valid2,
        ratio_threshold=ratio_threshold,
        max_matches=max_matches,
        mutual_check=mutual_check,
    )
    xy1 = xy_1[m["idx1"]] * m["valid"][:, None]
    xy2 = xy_2[m["idx2"]] * m["valid"][:, None]
    # match tables are compacted best-first: valid rows are a prefix, and the
    # first rows are the most reliable matches -> fast sampling + subset
    # hypothesis scoring.
    out = verify_pair(
        key, xy1, xy2, m["valid"],
        ransac_iters=ransac_iters,
        ransac_threshold=ransac_threshold,
        min_inliers=min_inliers,
        min_inlier_ratio=min_inlier_ratio,
        max_reproj_error=max_reproj_error,
        min_spread=min_spread,
        prefix_valid=True,
        score_budget=min(256, xy1.shape[0]),
    )
    out["xy1"] = xy1
    out["xy2"] = xy2
    out["match_valid"] = m["valid"]
    out["idx1"] = m["idx1"]
    out["idx2"] = m["idx2"]
    return out
