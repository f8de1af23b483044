"""Per-observation residuals, analytic Jacobians, and Huber IRLS weights.

The residual is the 2-vector pixel reprojection error of one observation as a
function of (camera rvec+t, shared intrinsics, point). Jacobians come from
vmapped jax.jacrev on that function — exact to machine precision, two
reverse-mode passes per observation, all fused by XLA across the observation
batch (contrast: the reference finite-differences a *dense*
(2·obs+4·cams) x (10·cams+3·points) Jacobian, sfm_reconstruction.py:506-514).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sfm_tpu.geometry.rotations import rodrigues

_EPS = 1e-12


def residual_one(rvec, tvec, intr, point, xy):
    """Reprojection residual (2,) of one observation."""
    R = rodrigues(rvec)
    xc = R @ point + tvec
    z = jnp.where(jnp.abs(xc[2]) < _EPS, _EPS, xc[2])
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = fx * xc[0] / z + cx
    v = fy * xc[1] / z + cy
    return jnp.stack([u, v]) - xy


# Batched residuals + Jacobians. Output shapes:
#   r   (O, 2)
#   J_c (O, 2, 6)   d r / d (rvec, t)
#   J_k (O, 2, 4)   d r / d intr
#   J_p (O, 2, 3)   d r / d point
def _res_packed(camp, intr, point, xy):
    return residual_one(camp[:3], camp[3:], intr, point, xy)


# Reverse mode: the residual is R^13 -> R^2, so jacrev costs 2 passes where
# jacfwd costs 13 — measured ~3x faster LM iterations at 200k observations.
_jac = jax.jacrev(_res_packed, argnums=(0, 1, 2))


# Observation rows per lax.map chunk in residuals_and_jacobians. The
# vmapped-jacrev temps through rodrigues have shape (chunk, 2, 3, 3) and
# XLA lays their trailing 3x3 on (4, 128) tiles — a 57x padding expansion
# (pixel-500 OOM dump: 2 x 6.67 GB temps for 2 x 120 MB of data at
# O = 1.75M). Chunking bounds those temps to ~0.5 GB each regardless of O;
# the OUTPUTS (O,2,6)/(O,2,4)/(O,2,3) are unaffected (XLA already stores
# them minor-dim-on-O, compact). Small problems bypass the map entirely.
_JAC_CHUNK = 131072


def _chunked_over_obs(fn, leaves, O, chunk=_JAC_CHUNK):
    """lax.map ``fn`` over O-leading leaves in fixed-size chunks."""
    pad = (-O) % chunk
    if pad:
        leaves = [jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in leaves]
    n = (O + pad) // chunk
    reshaped = [a.reshape((n, chunk) + a.shape[1:]) for a in leaves]
    outs = jax.lax.map(fn, tuple(reshaped))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:])[:O], outs)


def residuals_and_jacobians(problem_arrays):
    """Compute r, J_c, J_k, J_p for every observation row (masked later)."""
    rvec, tvec, intr, points, obs_cam, obs_point, obs_xy = problem_arrays
    camp = jnp.concatenate([rvec, tvec], axis=-1)        # (C, 6)
    cam_o = camp[obs_cam]                                # (O, 6)
    pt_o = points[obs_point]                             # (O, 3)
    O = cam_o.shape[0]

    if O <= _JAC_CHUNK:
        r = jax.vmap(_res_packed, in_axes=(0, None, 0, 0))(cam_o, intr, pt_o, obs_xy)
        J_c, J_k, J_p = jax.vmap(_jac, in_axes=(0, None, 0, 0))(cam_o, intr, pt_o, obs_xy)
        return r, J_c, J_k, J_p

    def f(args):
        c, p, x = args
        r = jax.vmap(_res_packed, in_axes=(0, None, 0, 0))(c, intr, p, x)
        J_c, J_k, J_p = jax.vmap(_jac, in_axes=(0, None, 0, 0))(c, intr, p, x)
        return r, J_c, J_k, J_p

    return _chunked_over_obs(f, [cam_o, pt_o, obs_xy], O)


def _res_packed10(camp, point, xy):
    return residual_one(camp[:3], camp[3:6], camp[6:10], point, xy)


_jac10 = jax.jacrev(_res_packed10, argnums=(0, 1))


def residuals_and_jacobians_percam(problem_arrays):
    """Per-camera-intrinsics variant: the camera block is 10 parameters
    (rvec, t, fx, fy, cx, cy) — the reference's parameterization
    (ref sfm_reconstruction.py:415-427). Returns r (O,2), J_c (O,2,10),
    J_p (O,2,3); there is no separate shared-intrinsics Jacobian."""
    rvec, tvec, intr_c, points, obs_cam, obs_point, obs_xy = problem_arrays
    camp = jnp.concatenate([rvec, tvec, intr_c], axis=-1)  # (C, 10)
    cam_o = camp[obs_cam]
    pt_o = points[obs_point]
    O = cam_o.shape[0]

    if O <= _JAC_CHUNK:
        r = jax.vmap(_res_packed10)(cam_o, pt_o, obs_xy)
        J_c, J_p = jax.vmap(_jac10)(cam_o, pt_o, obs_xy)
        return r, J_c, J_p

    def f(args):
        c, p, x = args
        r = jax.vmap(_res_packed10)(c, p, x)
        J_c, J_p = jax.vmap(_jac10)(c, p, x)
        return r, J_c, J_p

    return _chunked_over_obs(f, [cam_o, pt_o, obs_xy], O)


def huber_weights(r, delta: float):
    """IRLS weights for the Huber loss on the 2-norm of each residual.

    w = 1 inside |r| <= delta, delta/|r| outside; applied as sqrt(w) to both
    J and r so the weighted normal equations implement the robust step.
    """
    norm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, _EPS))
    return w


def huber_cost(r, valid, delta: float):
    """Total Huber cost (the LM accept/reject metric)."""
    norm = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * norm**2
    lin = delta * (norm - 0.5 * delta)
    c = jnp.where(norm <= delta, quad, lin)
    return jnp.sum(jnp.where(valid, c, 0.0))
