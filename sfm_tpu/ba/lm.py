"""The Levenberg-Marquardt outer loop (accept/reject with adaptive damping).

One jitted program: `lax.while_loop` over LM iterations; each iteration
re-linearizes (vmapped analytic Jacobians), solves the reduced camera system
with matrix-free PCG, back-substitutes the point step, and accepts or rejects
against the Huber cost — the classical Ceres-style schedule, with fully
static shapes so it compiles once per problem capacity.

Contract parity with the reference (sfm_reconstruction.py:401-549): Huber
robust loss, shared-intrinsics optimization with the same regularization
intent (anchor fx to init, fx~fy, principal point to image center, weight
0.1 — ref :489-501), and an ftol-style relative-decrease stop (ref :512).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from sfm_tpu.config import BAConfig
from sfm_tpu.ba.problem import BAProblem
from sfm_tpu.ba.residuals import residuals_and_jacobians, huber_weights, huber_cost
from sfm_tpu.ba.schur import build_operator, pcg_solve, back_substitute, dense_schur_solve

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
) -> Tuple[BAProblem, dict]:
    """Run LM bundle adjustment; returns (updated problem, stats dict).

    intr_ref: regularization anchor (fx0, _, cx0, cy0); defaults to the
    problem's initial intrinsics (ref anchors fx to init and c to the image
    center it hardcodes — sfm_reconstruction.py:489-501).

    With ``config.f64_normal_equations`` the normal-equation island runs in
    float64 (x64 enabled around trace + execution; everything else stays
    f32).
    """
    if config.f64_normal_equations:
        with jax.enable_x64(True):
            out, stats = _run_ba_jit(problem, config, intr_ref, optimize_intrinsics)
            return out, {k: jax.device_get(v) for k, v in stats.items()}
    return _run_ba_jit(problem, config, intr_ref, optimize_intrinsics)


@partial(jax.jit, static_argnames=("config", "optimize_intrinsics"))
def _run_ba_jit(
    problem: BAProblem,
    config: BAConfig = BAConfig(),
    intr_ref: jnp.ndarray = None,
    optimize_intrinsics: bool = True,
) -> Tuple[BAProblem, dict]:
    if intr_ref is None:
        intr_ref = problem.intr
    C = problem.num_cameras
    P = problem.num_points
    reg_w = jnp.float32(config.intrinsics_reg_weight)

    cam_free = (problem.cam_valid & ~problem.cam_fixed).astype(jnp.float32)
    point_valid = problem.point_valid
    obs_valid = problem.obs_valid.astype(jnp.float32) * point_valid[
        problem.obs_point
    ].astype(jnp.float32) * problem.cam_valid[problem.obs_cam].astype(jnp.float32)

    def total_cost(rvec, tvec, intr, points):
        r, *_ = _residuals_only(rvec, tvec, intr, points)
        c = huber_cost(r, obs_valid > 0, config.huber_delta)
        if optimize_intrinsics:
            r_reg, _, _ = _intr_reg(intr, intr_ref, reg_w)
            c = c + 0.5 * jnp.sum(r_reg**2)
        return c

    def _residuals_only(rvec, tvec, intr, points):
        return residuals_and_jacobians(
            (rvec, tvec, intr, points, problem.obs_cam, problem.obs_point, problem.obs_xy)
        )

    def lm_step(rvec, tvec, intr, points, lam):
        r, J_c, J_k, J_p = _residuals_only(rvec, tvec, intr, points)
        w = huber_weights(r, config.huber_delta)
        if optimize_intrinsics:
            _, Hreg, greg = _intr_reg(intr, intr_ref, reg_w)
        else:
            J_k = J_k * 0.0
            Hreg = jnp.eye(4, dtype=jnp.float32)
            greg = jnp.zeros(4, jnp.float32)
        if config.f64_normal_equations:
            # f64 island: the reductions J^T J / J^T r square the condition
            # number — everything from here to the solved step runs f64.
            f64 = lambda x: x.astype(jnp.float64)
            r, J_c, J_k, J_p, w = map(f64, (r, J_c, J_k, J_p, w))
            Hreg, greg = f64(Hreg), f64(greg)
        op, rhs_c, rhs_k, g_p = build_operator(
            J_c, J_k, J_p, r, w,
            problem.obs_cam, problem.obs_point, obs_valid,
            cam_free, point_valid, lam, Hreg, C, P,
        )
        rhs_k = rhs_k - greg
        if C <= config.use_dense_schur_below:
            # Small scene: exact dense Cholesky on the reduced system — one
            # fused program instead of cg_iters sequential matvecs.
            xc, xk = dense_schur_solve(op, rhs_c, rhs_k)
        else:
            xc, xk = pcg_solve(op, rhs_c, rhs_k, config.cg_iters, config.cg_tol)
        dp = back_substitute(op, g_p, xc, xk)
        f32 = lambda x: x.astype(jnp.float32)
        return f32(xc), f32(xk), f32(dp)

    init_cost = total_cost(problem.rvec, problem.tvec, problem.intr, problem.points)

    def cond(state):
        it, done, *_ = state
        return (it < config.max_iterations) & ~done

    def body(state):
        it, done, rvec, tvec, intr, points, lam, cost, n_acc = state
        xc, xk, dp = lm_step(rvec, tvec, intr, points, lam)
        rvec_n = rvec + xc[:, :3]
        tvec_n = tvec + xc[:, 3:]
        intr_n = intr + xk
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
        )

    state = (
        jnp.int32(0),
        jnp.array(False),
        problem.rvec,
        problem.tvec,
        problem.intr,
        problem.points,
        jnp.float32(config.init_lambda),
        init_cost,
        jnp.int32(0),
    )
    it, _, rvec, tvec, intr, points, lam, cost, n_acc = jax.lax.while_loop(
        cond, body, state
    )

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
