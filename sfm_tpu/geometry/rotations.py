"""Rotation parameterizations: axis-angle (Rodrigues), matrices, quaternions.

Replaces the reference's cv2.Rodrigues round-trips (sfm_reconstruction.py:260,
:419, :465, :544) and the exporter's Shepperd quaternion conversion
(export.py:123-151) with batched, differentiable jnp implementations — these sit
inside the BA residual, so they must be jit/vmap/jacfwd-safe (no data-dependent
branching, smooth near theta -> 0).

All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.utils.precision import f32_matmuls

_EPS = 1e-12


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


@f32_matmuls
def rodrigues(rvec):
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    R = I + a*K + b*K^2 with a = sin(t)/t, b = (1-cos(t))/t^2, K = skew(rvec).
    Uses Taylor branches near t=0 so jacfwd through this is exact and finite.
    """
    rvec = jnp.asarray(rvec)
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    small = theta2 < 1e-8
    # Safe sqrt: substitute 1.0 under the small branch so grads stay finite.
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    K = skew(rvec)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


@f32_matmuls
def rotation_to_rvec(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Branchless (jnp.where) handling of the three regimes: generic, theta -> 0,
    and theta -> pi (where the skew part vanishes and the axis comes from the
    diagonal of (R + I) / 2).
    """
    R = jnp.asarray(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)

    # Skew part: v = (R32-R23, R13-R31, R21-R12); ||v|| = 2 sin(theta).
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    near_zero = theta < 1e-5
    near_pi = theta > jnp.pi - 1e-3

    # Generic: the axis is v normalized (||v|| = 2 sin(theta), but normalizing
    # by the *computed* norm is far better conditioned near pi than dividing
    # by sin(arccos(...))). Near zero: rvec ~ v / 2.
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    generic = v / jnp.maximum(vnorm, _EPS) * theta[..., None]
    tiny = 0.5 * v

    # Near pi: axis_i = sqrt(max((R_ii + 1)/2, 0)); fix signs from v (which is
    # ~0 but its sign survives) and from off-diagonal products.
    axis_abs = jnp.sqrt(jnp.maximum((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1) + 1.0) * 0.5, 0.0))
    # Pick the largest component positive; set other signs from R off-diagonals:
    # for unit axis u, R_ij + R_ji = 2 u_i u_j (i != j) when theta = pi.
    i_max = jnp.argmax(axis_abs, axis=-1)
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]

    def sign_for(k, comp):
        # sign of component `comp` given the max component k is taken positive
        s = jnp.where(
            k == 0,
            jnp.where(comp == 1, jnp.sign(s01), jnp.sign(s02)),
            jnp.where(
                k == 1,
                jnp.where(comp == 0, jnp.sign(s01), jnp.sign(s12)),
                jnp.where(comp == 0, jnp.sign(s02), jnp.sign(s12)),
            ),
        )
        return jnp.where(comp == k, 1.0, jnp.where(s == 0, 1.0, s))

    signs = jnp.stack([sign_for(i_max, jnp.full_like(i_max, c)) for c in range(3)], axis=-1)
    axis_pi = axis_abs * signs.astype(axis_abs.dtype)
    axis_pi = axis_pi / jnp.maximum(jnp.linalg.norm(axis_pi, axis=-1, keepdims=True), _EPS)
    pi_branch = axis_pi * theta[..., None]

    out = jnp.where(near_zero[..., None], tiny, jnp.where(near_pi[..., None], pi_branch, generic))
    return out


@f32_matmuls
def quaternion_from_matrix(R):
    """(..., 3, 3) -> unit quaternion (w, x, y, z), w >= 0.

    Branchless Shepperd-style conversion (reference: export.py:123-151): compute
    all four candidate constructions and select the best-conditioned one.
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_k^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    k = jnp.argmax(cands, axis=-1)

    def build(case):
        if case == 0:
            s = jnp.sqrt(jnp.maximum(qw2, _EPS)) * 2.0
            return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1)
        if case == 1:
            s = jnp.sqrt(jnp.maximum(qx2, _EPS)) * 2.0
            return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1)
        if case == 2:
            s = jnp.sqrt(jnp.maximum(qy2, _EPS)) * 2.0
            return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1)
        s = jnp.sqrt(jnp.maximum(qz2, _EPS)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1)

    stacked = jnp.stack([build(c) for c in range(4)], axis=-2)  # (..., 4 cases, 4)
    onehot = (k[..., None] == jnp.arange(4)).astype(stacked.dtype)  # (..., 4 cases)
    q = jnp.sum(stacked * onehot[..., None], axis=-2)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


@f32_matmuls
def matrix_from_quaternion(q):
    """Unit quaternion (w, x, y, z) (..., 4) -> (..., 3, 3)."""
    q = jnp.asarray(q)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
