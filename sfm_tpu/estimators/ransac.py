"""The shared RANSAC machinery: masked sampling with static shapes.

The reference relies on OpenCV's adaptive-termination RANSAC loops
(find_matches.py:282, sfm_reconstruction.py:246). On TPU, data-dependent
termination forces host sync every iteration, so instead we run a *fixed*
hypothesis budget as one batched program: every hypothesis solves and scores
in parallel (vmap), invalid data rows are excluded by masking (never by
gather-compaction), and the winner is an argmax. With a budget of ~1-2k
hypotheses this dominates OpenCV's adaptive loop in quality at a tiny fraction
of the wall-clock, because the whole batch is a handful of fused XLA kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ransac_sample_indices(key, valid, iters: int, sample_size: int,
                          prefix: bool = False):
    """Draw ``iters`` minimal samples of ``sample_size`` valid indices.

    valid: (N,) bool mask of usable data rows. Returns (iters, sample_size)
    int32 indices.

    prefix=False (general masks): Gumbel top-k — iid noise over all N rows,
    invalid rows pushed to -inf, top-k per hypothesis = a uniform
    without-replacement sample with static shapes. Costs a (iters, N) sort.

    prefix=True (valid rows form a leading prefix — true for match tables and
    PnP budgets, which are compacted best-first): sample uniform integers in
    [0, n_valid) directly — O(iters*k), no sort. With-replacement, so a
    hypothesis can repeat a row (probability ~k^2/2n); a degenerate sample
    just scores few inliers and loses the argmax, which costs a vanishing
    amount of the fixed hypothesis budget.

    If fewer than ``sample_size`` rows are valid, samples contain invalid
    rows; callers gate on the valid count (scoring is masked anyway).
    """
    if prefix:
        n_valid = jnp.maximum(jnp.sum(valid).astype(jnp.int32), 1)
        u = jax.random.uniform(key, (iters, sample_size))
        return jnp.minimum(
            (u * n_valid).astype(jnp.int32), n_valid - 1
        )
    noise = jax.random.uniform(key, (iters, valid.shape[0]))
    noise = jnp.where(valid[None, :], noise, -jnp.inf)
    _, idx = jax.lax.top_k(noise, sample_size)
    return idx.astype(jnp.int32)


def ransac_select(errors, valid, threshold):
    """Pick the best hypothesis from a (iters, N) error matrix.

    Returns (best_idx, best_inlier_mask (N,), best_count). Inliers are rows
    with error < threshold that are valid; the winner maximizes the count with
    mean inlier error as the tie-breaker (lower is better).
    """
    inl = (errors < threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    # Tie-break: prefer lower mean inlier error among equal counts.
    err_sum = jnp.sum(jnp.where(inl, errors, 0.0), axis=1)
    mean_err = err_sum / jnp.maximum(counts, 1)
    score = counts.astype(jnp.float32) - mean_err / jnp.maximum(threshold, 1e-6)
    best = jnp.argmax(score)
    return best, inl[best], counts[best]
