"""Two-view epipolar geometry: F/E estimation, distances, pose recovery.

Replaces cv2.findFundamentalMat (find_matches.py:282), the symmetric epipolar
error (find_matches.py:157-201), E = K^T F K (sfm_reconstruction.py:85) and
cv2.recoverPose (sfm_reconstruction.py:88, :128) with batched, maskable jnp.

All estimators take a ``weights`` vector instead of boolean gather so shapes
stay static: an excluded correspondence simply has weight 0. This is what lets
RANSAC vmap thousands of hypotheses with no data-dependent shapes.

Convention: ``x2^T F x1 = 0`` for homogeneous pixel coords x1 in image 1 and
x2 in image 2 (OpenCV's convention, which the reference relies on).
"""
from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.utils.precision import f32_matmuls
from sfm_tpu.utils.linalg import smallest_eigvec

from sfm_tpu.geometry.triangulation import triangulate_two_view

_EPS = 1e-12


def _homog(pts):
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_points(pts, weights=None):
    """Hartley normalization: translate to centroid, scale mean norm to sqrt(2).

    pts: (..., N, 2); weights: (..., N) or None.
    Returns (pts_norm (..., N, 2), T (..., 3, 3)) with x_norm = T @ x_homog.
    """
    pts = jnp.asarray(pts)
    if weights is None:
        weights = jnp.ones(pts.shape[:-1], dtype=pts.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), _EPS)
    centroid = jnp.sum(pts * w, axis=-2, keepdims=True) / wsum
    centered = pts - centroid
    mean_dist = jnp.sum(jnp.linalg.norm(centered, axis=-1, keepdims=True) * w, axis=-2, keepdims=True) / wsum
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_dist, _EPS)
    pts_norm = centered * scale

    s = scale[..., 0, 0]
    cx = centroid[..., 0, 0]
    cy = centroid[..., 0, 1]
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zero, -s * cx], axis=-1),
            jnp.stack([zero, s, -s * cy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return pts_norm, T


@f32_matmuls
def eight_point(pts1, pts2, weights=None, enforce_rank2: bool = True,
                null_iters: int = 8, null_fallback: bool = True):
    """Weighted normalized 8-point fundamental-matrix estimate.

    pts1, pts2: (N, 2) pixel correspondences (N >= 8); weights: (N,) soft
    selector (0 excludes a row). Returns F (3, 3), scaled to unit Frobenius
    norm. Safe to vmap over a leading hypothesis/pair axis.

    The null vector comes from shifted inverse iteration, not eigh — tiny
    batched eigh dominates TPU wall-clock when vmapped over thousands of
    RANSAC hypotheses (see sfm_tpu.utils.linalg). ``enforce_rank2`` costs a
    3x3 SVD; hypothesis scoring can skip it (the epipolar distances of a
    nearly-rank-2 F are unchanged to first order) and apply it on the final
    refit only.
    """
    pts1 = jnp.asarray(pts1)
    pts2 = jnp.asarray(pts2)
    if weights is None:
        weights = jnp.ones(pts1.shape[:-1], dtype=pts1.dtype)

    n1, T1 = normalize_points(pts1, weights)
    n2, T2 = normalize_points(pts2, weights)

    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    ones = jnp.ones_like(x1)
    # Row layout matches F.reshape(9): x2^T F x1 = A @ vec(F).
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1)
    A = A * weights[..., None]

    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    f = smallest_eigvec(AtA, iters=null_iters, fallback=null_fallback)
    F = f.reshape(f.shape[:-1] + (3, 3))

    if enforce_rank2:
        U, S, Vt = jnp.linalg.svd(F)
        S = S.at[..., 2].set(0.0)
        F = U @ (S[..., :, None] * Vt)

    # Denormalize: x2n^T Fn x1n = (T2 x2)^T Fn (T1 x1) -> F = T2^T Fn T1.
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    F = F / jnp.maximum(jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), _EPS)
    return F


@f32_matmuls
def symmetric_epipolar_distance(F, pts1, pts2):
    """Mean of the two point-to-epipolar-line distances, in pixels.

    Matches the reference's definition exactly (find_matches.py:160-171):
    lines in image 1 are F^T x2, lines in image 2 are F x1, and the symmetric
    error is the *average* (d1 + d2) / 2.
    """
    x1 = _homog(jnp.asarray(pts1))
    x2 = _homog(jnp.asarray(pts2))
    l1 = jnp.einsum("...ji,...nj->...ni", F, x2)  # F^T x2: lines in image 1
    l2 = jnp.einsum("...ij,...nj->...ni", F, x1)  # F x1:   lines in image 2
    d1 = jnp.abs(jnp.sum(l1 * x1, axis=-1)) / jnp.maximum(jnp.linalg.norm(l1[..., :2], axis=-1), _EPS)
    d2 = jnp.abs(jnp.sum(l2 * x2, axis=-1)) / jnp.maximum(jnp.linalg.norm(l2[..., :2], axis=-1), _EPS)
    return 0.5 * (d1 + d2)


@f32_matmuls
def sampson_distance(F, pts1, pts2):
    """First-order geometric (Sampson) distance — the usual RANSAC score."""
    x1 = _homog(jnp.asarray(pts1))
    x2 = _homog(jnp.asarray(pts2))
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2)
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / jnp.maximum(den, _EPS)


@f32_matmuls
def essential_from_fundamental(F, K1, K2=None):
    """E = K2^T F K1 (sfm_reconstruction.py:85)."""
    if K2 is None:
        K2 = K1
    return jnp.swapaxes(jnp.asarray(K2), -1, -2) @ F @ jnp.asarray(K1)


@f32_matmuls
def fundamental_from_essential(E, K1, K2=None):
    if K2 is None:
        K2 = K1
    K1inv = jnp.linalg.inv(jnp.asarray(K1))
    K2inv = jnp.linalg.inv(jnp.asarray(K2))
    return jnp.swapaxes(K2inv, -1, -2) @ E @ K1inv


@f32_matmuls
def _cofactor(E):
    """Cofactor matrix of (..., 3, 3): rows are cross products of the other
    two rows (Cof(E)[0] = E[1] x E[2], cyclic)."""
    c0 = jnp.cross(E[..., 1, :], E[..., 2, :])
    c1 = jnp.cross(E[..., 2, :], E[..., 0, :])
    c2 = jnp.cross(E[..., 0, :], E[..., 1, :])
    return jnp.stack([c0, c1, c2], axis=-2)


def _skew(t):
    z = jnp.zeros_like(t[..., 0])
    return jnp.stack([
        jnp.stack([z, -t[..., 2], t[..., 1]], axis=-1),
        jnp.stack([t[..., 2], z, -t[..., 0]], axis=-1),
        jnp.stack([-t[..., 1], t[..., 0], z], axis=-1),
    ], axis=-2)


def _orthonormalize(R, iters: int = 3):
    """Newton iteration toward the orthogonal polar factor:
    R <- 1.5 R - 0.5 R R^T R. Converges quadratically for the near-rotations
    Horn's formula yields from a noisy (inexact rank-2) E."""
    for _ in range(iters):
        R = 1.5 * R - 0.5 * jnp.einsum("...ij,...kj,...kl->...il", R, R, R)
    return R


def decompose_essential(E):
    """E -> (R1, R2, t): the four candidate poses are (R{1,2}, +-t).

    Closed form (Horn 1990), no SVD: for E = [t]x R with |t| = 1 and
    singular values (1, 1, 0),
        t  = unit null vector of E E^T,
        R  = Cof(E) - [t]x E        (and the second rotation from -E).
    TPU note: jnp.linalg.svd on a 3x3 lowers to a large iterative program
    whose first-dispatch cost through the remote-TPU path dominated seed
    selection (measured 238-397 s); this closed form is a handful of fused
    multiplies.
    """
    # Normalize to singular values ~(1, 1, 0): ||E||_F^2 = 2.
    En = E * (jnp.sqrt(2.0) / jnp.maximum(
        jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), _EPS))
    EEt = En @ jnp.swapaxes(En, -1, -2)
    t = smallest_eigvec(EEt)
    B = _skew(t)
    R1 = _orthonormalize(_cofactor(En) - B @ En)
    R2 = _orthonormalize(_cofactor(-En) - B @ (-En))
    return R1, R2, t


def _cheirality_counts(R, t, pts1, pts2, K, weights):
    """Cheirality for BOTH (R, t) and (R, -t) from ONE triangulation.

    The DLT system for -t is A(t) diag(1,1,1,-1): its (least-squares)
    homogeneous solution is exactly (v, -w), i.e. the dehomogenized point is
    -X — so the second candidate's depths come for free. (P1 = K[I|0] has a
    zero fourth column, so its rows are untouched by the sign flip.)
    """
    eye = jnp.eye(3, dtype=R.dtype)
    zero = jnp.zeros((3,), dtype=R.dtype)
    P1 = K @ jnp.concatenate([eye, zero[:, None]], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_two_view(P1, P2, pts1, pts2)
    z1 = X[..., 2]
    z2 = X @ R[2, :] + t[2]
    good_p = (z1 > 0) & (z2 > 0)              # (R, t) sees X
    good_n = (z1 < 0) & (z2 < 0)              # (R, -t) sees -X
    return (
        (jnp.sum(good_p * weights), good_p),
        (jnp.sum(good_n * weights), good_n),
    )


@f32_matmuls
def recover_pose(E, pts1, pts2, K, weights=None):
    """Pick the (R, t) among the four E decompositions with the best cheirality.

    Mirrors cv2.recoverPose (sfm_reconstruction.py:88, :128): returns
    (num_good, R, t, mask) where mask flags correspondences that triangulate in
    front of both cameras under the winning pose. ``t`` has unit norm.
    """
    pts1 = jnp.asarray(pts1)
    pts2 = jnp.asarray(pts2)
    if weights is None:
        weights = jnp.ones(pts1.shape[:-1], dtype=pts1.dtype)
    R1, R2, t = decompose_essential(E)
    # Two triangulations cover all four candidates: (R, -t)'s cheirality
    # falls out of (R, t)'s triangulation (see _cheirality_counts).
    (c1p, m1p), (c1n, m1n) = _cheirality_counts(R1, t, pts1, pts2, K, weights)
    (c2p, m2p), (c2n, m2n) = _cheirality_counts(R2, t, pts1, pts2, K, weights)
    counts = jnp.stack([c1p, c1n, c2p, c2n])
    masks = jnp.stack([m1p, m1n, m2p, m2n])
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    best = jnp.argmax(counts)
    return counts[best], Rs[best], ts[best], masks[best] & (weights > 0)
