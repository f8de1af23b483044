"""Seed-pair selection + two-view initialization.

The reference scores every verified pair by num_inliers * ||t|| with t from
recoverPose of E = K^T F K (sfm_reconstruction.py:61-106) — but recovered
translations are unit-norm, so that score degenerates to the inlier count and
prefers adjacent, short-baseline pairs whose essential-matrix geometry is
ill-conditioned (measured on bunny: the top such pair triangulates at ~9.5 px
median error and the whole reconstruction dies). We keep the vmapped
pose-recovery sweep but score like mature SfM systems: inlier count weighted
by median triangulation parallax, gated on two-view consistency.
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.geometry.epipolar import essential_from_fundamental, recover_pose
from sfm_tpu.geometry.triangulation import triangulate_two_view
from sfm_tpu.geometry.projection import project
from sfm_tpu.utils.precision import f32_matmuls

_EPS = 1e-12


def _masked_median(x, mask, iters: int = 24):
    """Median of x where mask, by unrolled bisection on the value range.

    Equivalent to sort(x)[(n-1)//2] to within range/2^iters — more than
    enough for scoring. Why not jnp.sort: the TPU sort program's (remote)
    first-dispatch compile cost measured 141 s on the tunnel; bisection is
    24 compares + reductions, loop-free. Returns +inf when nothing is masked
    in (so downstream gates reject, matching the sort-based semantics).
    """
    n = jnp.sum(mask)
    target = (n + 1) // 2  # count(x <= median) must reach this
    lo = jnp.zeros((), x.dtype)
    hi = jnp.max(jnp.where(mask, x, 0.0))
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(mask & (x <= mid))
        hit = cnt >= target
        lo = jnp.where(hit, lo, mid)
        hi = jnp.where(hit, mid, hi)
    return jnp.where(n > 0, hi, jnp.inf)


@jax.jit
@f32_matmuls
def _score_pairs(Fs, xy1, xy2, valid, K):
    """Pose recovery + parallax/consistency scoring over the pair batch.

    Returns (scores (P,), Rs, ts, med_parallax_deg (P,), med_err (P,)).
    score = cheirality_count * clip(median_parallax, 0, 10 deg), zeroed when
    the recovered two-view geometry cannot reproject its own inliers to
    < 3 px median (degenerate F/E).
    """

    def one(F, p1, p2, v):
        E = essential_from_fundamental(F, K)
        n_good, R, t, mask = recover_pose(E, p1, p2, K, v.astype(jnp.float32))
        eye = jnp.eye(3, dtype=F.dtype)
        zero = jnp.zeros((3,), F.dtype)
        P1 = K @ jnp.concatenate([eye, zero[:, None]], axis=1)
        P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulate_two_view(P1, P2, p1, p2)            # (N, 3)

        # Two-view consistency: reprojection into both views.
        pr1, z1 = project(X, eye, zero, K)
        pr2, z2 = project(X, R, t, K)
        err = jnp.maximum(
            jnp.linalg.norm(pr1 - p1, axis=-1), jnp.linalg.norm(pr2 - p2, axis=-1)
        )
        use = mask & (z1 > 0) & (z2 > 0)
        med_err = _masked_median(err, use)

        # Parallax: angle between the two viewing rays.
        c2 = -R.T @ t                                       # camera-2 center
        r1 = X
        r2 = X - c2
        cosang = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), _EPS
        )
        ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
        med_par = _masked_median(ang, use)

        consistent = med_err < 3.0
        score = (
            n_good.astype(jnp.float32)
            * jnp.clip(med_par, 0.0, 10.0)
            * consistent.astype(jnp.float32)
        )
        return score, R, t, med_par, med_err

    return jax.vmap(one)(Fs, xy1, xy2, valid)


def find_best_initial_pair(table, K, max_candidates: int = 256, max_matches: int = 256):
    """Pick the seed pair. Returns (pair_row, R, t, score).

    Only the ``max_candidates`` highest-inlier accepted pairs compete, each
    scored on its first ``max_matches`` correspondences (rows are
    quality-sorted) — at 1000s of accepted pairs the full vmapped scorer
    would need tens of GB for the 4-candidate cheirality triangulations.
    """
    acc = table.accepted()
    if len(acc) == 0:
        raise ValueError("no accepted pairs to seed from")
    if len(acc) > max_candidates:
        order = np.argsort(-table.num_inliers[acc])[:max_candidates]
        acc = acc[order]
    M = min(max_matches, table.xy1.shape[1])
    Fs = jnp.asarray(table.F[acc])
    xy1 = jnp.asarray(table.xy1[acc][:, :M])
    xy2 = jnp.asarray(table.xy2[acc][:, :M])
    valid = jnp.asarray((table.inliers[acc] & table.match_valid[acc])[:, :M])
    scores, Rs, ts, med_par, med_err = _score_pairs(
        Fs, xy1, xy2, valid, jnp.asarray(K, jnp.float32)
    )
    scores = np.asarray(scores)
    best = int(np.argmax(scores))
    if scores[best] <= 0:
        # Every pair failed the consistency gate; fall back to raw inliers.
        best = int(np.argmax(np.asarray(table.num_inliers[acc])))
    return int(acc[best]), np.asarray(Rs[best]), np.asarray(ts[best]), float(scores[best])
