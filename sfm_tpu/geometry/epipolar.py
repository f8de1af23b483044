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
                null_iters: int = 8):
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
    f = smallest_eigvec(AtA, iters=null_iters)
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
def decompose_essential(E):
    """E -> (R1, R2, t): the four candidate poses are (R{1,2}, +-t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Keep rotations proper.
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def _cheirality(R, t, pts1, pts2, K, weights):
    """Triangulate under (R, t) and count points in front of both cameras."""
    eye = jnp.eye(3, dtype=R.dtype)
    zero = jnp.zeros((3,), dtype=R.dtype)
    P1 = K @ jnp.concatenate([eye, zero[:, None]], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_two_view(P1, P2, pts1, pts2)
    z1 = X[..., 2]
    x2cam = X @ R.T + t
    z2 = x2cam[..., 2]
    good = (z1 > 0) & (z2 > 0)
    return jnp.sum(good * weights), good


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
    candidates = ((R1, t), (R1, -t), (R2, t), (R2, -t))
    counts = []
    masks = []
    for R_c, t_c in candidates:
        c, m = _cheirality(R_c, t_c, pts1, pts2, K, weights)
        counts.append(c)
        masks.append(m)
    counts = jnp.stack(counts)
    masks = jnp.stack(masks)
    Rs = jnp.stack([c[0] for c in candidates])
    ts = jnp.stack([c[1] for c in candidates])
    best = jnp.argmax(counts)
    return counts[best], Rs[best], ts[best], masks[best] & (weights > 0)
