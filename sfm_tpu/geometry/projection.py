"""Pinhole projection and reprojection residuals.

Replaces the reference's per-call K rebuild + cv2.Rodrigues projection
(sfm_reconstruction.py:453-470, :597-608) with batched differentiable jnp —
this is the innermost function of bundle adjustment, so its jacfwd must be
cheap and exact.

Convention: world->camera, ``x_cam = R @ X + t``; pixels are (x, y).
"""
from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.utils.precision import f32_matmuls

from sfm_tpu.geometry.rotations import rodrigues

_EPS = 1e-12


def camera_matrix(fx, fy, cx, cy, dtype=jnp.float32):
    """Build K (3, 3) from scalars (broadcasts to (..., 3, 3))."""
    fx, fy, cx, cy = (jnp.asarray(v, dtype=dtype) for v in (fx, fy, cx, cy))
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, zero, cx], axis=-1),
            jnp.stack([zero, fy, cy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


@f32_matmuls
def project(points, R, t, K):
    """Project world points to pixels.

    points: (..., 3); R: (..., 3, 3); t: (..., 3); K: (..., 3, 3) or (3, 3).
    Returns (pixels (..., 2), depth (...,)).
    """
    points = jnp.asarray(points)
    x_cam = jnp.einsum("...ij,...j->...i", R, points) + t
    depth = x_cam[..., 2]
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    z = jnp.where(jnp.abs(depth) < _EPS, _EPS, depth)
    u = fx * x_cam[..., 0] / z + cx
    v = fy * x_cam[..., 1] / z + cy
    return jnp.stack([u, v], axis=-1), depth


def project_rvec(points, rvec, t, K):
    """Same as :func:`project` but with an axis-angle rotation (BA param form)."""
    return project(points, rodrigues(rvec), t, K)


@f32_matmuls
def reprojection_errors(points3d, observations, R, t, K, valid=None):
    """Per-observation Euclidean pixel error.

    points3d: (N, 3); observations: (N, 2); R/t: single pose or batched (N, ...).
    Returns (N,) errors; invalid entries are 0 when ``valid`` is given.
    """
    proj, _ = project(points3d, R, t, K)
    err = jnp.linalg.norm(proj - observations, axis=-1)
    if valid is not None:
        err = jnp.where(valid, err, 0.0)
    return err
