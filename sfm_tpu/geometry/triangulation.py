"""DLT triangulation, two-view and multi-view.

Replaces cv2.triangulatePoints (sfm_reconstruction.py:138, :292). The reference
"multi-view" path actually only ever uses the first two views of a track
(sfm_reconstruction.py:292-294); here :func:`triangulate_multiview` is a true
masked multi-view DLT so tracks longer than 2 observations (which our
union-find track builder produces, fixing reference limitation C15) use all
their views.
"""
from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.utils.precision import f32_matmuls
from sfm_tpu.utils.linalg import smallest_eigvec

_EPS = 1e-12


def _solve_dlt(A):
    """Smallest right singular vector of A (..., M, 4), dehomogenized to 3-D.

    Rows of A are normalized first so pixel-scale magnitudes do not wreck f32
    conditioning. The null vector comes from inverse iteration on the 4x4
    normal matrix (batched tiny SVDs are a TPU wall-clock trap — see
    sfm_tpu.utils.linalg).
    """
    norms = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(norms, _EPS)
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    X = smallest_eigvec(AtA)
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < _EPS, _EPS, w)
    return X[..., :3] / w[..., None]


@f32_matmuls
def triangulate_two_view(P1, P2, pts1, pts2):
    """Batched two-view DLT.

    P1, P2: (3, 4) (or broadcastable (..., 3, 4)); pts1, pts2: (..., N, 2).
    Returns (..., N, 3) world points.
    """
    pts1 = jnp.asarray(pts1)
    pts2 = jnp.asarray(pts2)
    P1 = jnp.asarray(P1)
    P2 = jnp.asarray(P2)

    def rows(P, pts):
        x = pts[..., 0:1]
        y = pts[..., 1:2]
        r0 = x * P[..., None, 2, :] - P[..., None, 0, :]
        r1 = y * P[..., None, 2, :] - P[..., None, 1, :]
        return r0, r1

    a0, a1 = rows(P1, pts1)
    b0, b1 = rows(P2, pts2)
    A = jnp.stack([a0, a1, b0, b1], axis=-2)  # (..., N, 4, 4)
    return _solve_dlt(A)


@f32_matmuls
def triangulate_multiview(Ps, pts, valid=None):
    """Masked multi-view DLT for one track.

    Ps: (V, 3, 4) projection matrices; pts: (V, 2) observations;
    valid: (V,) bool — invalid views contribute zero rows (ignored by the SVD).
    Returns (3,) world point. vmap over a leading track axis for batches.
    """
    Ps = jnp.asarray(Ps)
    pts = jnp.asarray(pts)
    x = pts[..., 0:1]
    y = pts[..., 1:2]
    r0 = x * Ps[..., 2, :] - Ps[..., 0, :]
    r1 = y * Ps[..., 2, :] - Ps[..., 1, :]
    A = jnp.concatenate([r0, r1], axis=-2)  # (2V, 4)
    if valid is not None:
        v = jnp.concatenate([valid, valid], axis=-1).astype(A.dtype)
        A = A * v[..., None]
    return _solve_dlt(A)
