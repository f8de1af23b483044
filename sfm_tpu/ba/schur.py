"""Matrix-free Schur-complement system + block-Jacobi PCG.

The reduced (camera + shared-intrinsics) system is never materialized: one
S-matvec costs one point-side segment reduction + one camera-side reduction
over the flat observation table, each O(obs) work — this is what makes BA
scale to thousands of cameras on device, and it shards naturally over the
observation axis (GSPMD turns the reductions into local sums + psum).

TPU notes (measured on v5e): scatter-based segment_sum runs ~2.3x slower than
an MXU matmul against a precomputed one-hot camera matrix, so camera-side
reductions go through the one-hot path (the (O, C) one-hot is built once per
operator). The matvec also fuses its two camera reductions into one:
S x = B^T(Bx - W V^-1 W^T-part) + damping, reducing (a - z) in a single pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-10


class SchurOperator(NamedTuple):
    """Everything needed to apply S and the preconditioner (all whitened)."""

    Jc: jnp.ndarray        # (O, 2, 6) — zeroed for fixed/invalid cams & obs
    Jk: jnp.ndarray        # (O, 2, 4) — zeroed if intrinsics frozen
    Jp: jnp.ndarray        # (O, 2, 3) — zeroed for invalid points & obs
    obs_cam: jnp.ndarray   # (O,)
    obs_point: jnp.ndarray # (O,)
    onehot_cam: jnp.ndarray  # (O, C) f32 — camera-side reduction operator
    Vinv: jnp.ndarray      # (P, 3, 3) damped inverse point blocks
    lam_diag_c: jnp.ndarray  # (C, 6) LM damping diagonal for cameras
    lam_diag_k: jnp.ndarray  # (4,)
    unit_c: jnp.ndarray    # (C,) 1.0 where the camera has no free params
    Hreg_k: jnp.ndarray    # (4, 4) intrinsics regularization hessian
    Mc: jnp.ndarray        # (C, 6, 6) block-Jacobi preconditioner (inverted)
    Mk: jnp.ndarray        # (4, 4)


def _seg_sum_pt(values, seg_ids, num_segments):
    """Point-side segment reduction (scatter path; ids are data-dependent)."""
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)


def _cam_reduce(onehot_cam, values):
    """Camera-side reduction as an MXU matmul: (O, C)^T @ (O, k) -> (C, k)."""
    return jnp.einsum(
        "oc,ok->ck", onehot_cam, values, precision=jax.lax.Precision.HIGHEST
    )


def build_operator(
    Jc, Jk, Jp, r, w, obs_cam, obs_point, obs_valid,
    cam_free, point_valid, lam, Hreg_k, num_cameras, num_points,
):
    """Whiten Jacobians, build damped point-block inverses + preconditioner.

    Returns (op: SchurOperator, rhs_c (C,6), rhs_k (4,), g_p (P,3)).
    cam_free: (C,) float — 1.0 for cameras whose pose is optimized.
    """
    sw = jnp.sqrt(w * obs_valid)[:, None]                 # (O, 1)
    free_o = cam_free[obs_cam][:, None]
    pv_o = point_valid[obs_point].astype(jnp.float32)[:, None]
    Jc = Jc * (sw * free_o)[..., None]
    Jk = Jk * sw[..., None]
    Jp = Jp * (sw * pv_o)[..., None]
    rw = r * sw

    onehot_cam = jax.nn.one_hot(obs_cam, num_cameras, dtype=jnp.float32)

    # Point blocks V and damped inverses.
    V = _seg_sum_pt(jnp.einsum("oci,ocj->oij", Jp, Jp), obs_point, num_points)
    diagV = jnp.diagonal(V, axis1=-2, axis2=-1)
    Vd = V + (lam * diagV + _EPS)[..., None] * jnp.eye(3)
    Vinv = jnp.linalg.inv(Vd)
    Vinv = jnp.where(point_valid[:, None, None], Vinv, 0.0)

    # Camera blocks (for damping diagonal + preconditioner).
    U = _cam_reduce(onehot_cam, jnp.einsum("oci,ocj->oij", Jc, Jc).reshape(-1, 36)).reshape(
        num_cameras, 6, 6
    )
    diagU = jnp.diagonal(U, axis1=-2, axis2=-1)           # (C, 6)
    lam_diag_c = lam * diagU
    unit_c = (jnp.sum(diagU, axis=-1) <= _EPS).astype(jnp.float32)

    Uk = jnp.einsum("oci,ocj->ij", Jk, Jk) + Hreg_k
    diagUk = jnp.diagonal(Uk)
    lam_diag_k = lam * diagUk + _EPS

    # Preconditioner: inverse of the damped diagonal blocks.
    Ud = U + (lam_diag_c[..., None] * jnp.eye(6)) + unit_c[:, None, None] * jnp.eye(6)
    Mc = jnp.linalg.inv(Ud + _EPS * jnp.eye(6))
    Mk = jnp.linalg.inv(Uk + jnp.diag(lam_diag_k) + _EPS * jnp.eye(4))

    # Gradients (rhs of the normal equations is -g; we solve S x = rhs).
    g_c = _cam_reduce(onehot_cam, jnp.einsum("oci,oc->oi", Jc, rw))
    g_k = jnp.einsum("oci,oc->i", Jk, rw)
    g_p = _seg_sum_pt(jnp.einsum("oci,oc->oi", Jp, rw), obs_point, num_points)

    # rhs_reduced = -g_c + W Vinv g_p   (and the k analogue).
    h_p = jnp.einsum("pij,pj->pi", Vinv, g_p)             # (P, 3)
    y_o = jnp.einsum("oci,oi->oc", Jp, h_p[obs_point])    # (O, 2)
    rhs_c = -g_c + _cam_reduce(onehot_cam, jnp.einsum("oci,oc->oi", Jc, y_o))
    rhs_k = -g_k + jnp.einsum("oci,oc->i", Jk, y_o)

    op = SchurOperator(
        Jc=Jc, Jk=Jk, Jp=Jp, obs_cam=obs_cam, obs_point=obs_point,
        onehot_cam=onehot_cam,
        Vinv=Vinv, lam_diag_c=lam_diag_c, lam_diag_k=lam_diag_k,
        unit_c=unit_c, Hreg_k=Hreg_k, Mc=Mc, Mk=Mk,
    )
    return op, rhs_c, rhs_k, g_p


def schur_matvec(op: SchurOperator, xc, xk):
    """Apply S = B^T B + lam*diag - W Vinv W^T to x = (cams (C,6), intr (4,)).

    One point-side reduction + one fused camera-side reduction:
    S x = B^T (B x - E V^-1 E^T (B x)) + damping.
    """
    P = op.Vinv.shape[0]
    a = jnp.einsum("oci,oi->oc", op.Jc, xc[op.obs_cam]) + jnp.einsum(
        "oci,i->oc", op.Jk, xk
    )                                                      # (O, 2) = B x
    # W^T x then V^-1 then W.
    u_p = _seg_sum_pt(jnp.einsum("oci,oc->oi", op.Jp, a), op.obs_point, P)
    v_p = jnp.einsum("pij,pj->pi", op.Vinv, u_p)
    z = jnp.einsum("oci,oi->oc", op.Jp, v_p[op.obs_point])  # (O, 2)

    d = a - z
    Sx_c = _cam_reduce(op.onehot_cam, jnp.einsum("oci,oc->oi", op.Jc, d))
    Sx_k = jnp.einsum("oci,oc->i", op.Jk, d)

    Sx_c = Sx_c + op.lam_diag_c * xc + op.unit_c[:, None] * xc
    Sx_k = Sx_k + op.lam_diag_k * xk + op.Hreg_k @ xk
    return Sx_c, Sx_k


def pcg_solve(op: SchurOperator, rhs_c, rhs_k, iters: int, tol: float):
    """Block-Jacobi preconditioned CG on the reduced system."""

    def precond(rc, rk):
        return jnp.einsum("cij,cj->ci", op.Mc, rc), op.Mk @ rk

    def dot(ac, ak, bc, bk):
        return jnp.sum(ac * bc) + jnp.sum(ak * bk)

    xc = jnp.zeros_like(rhs_c)
    xk = jnp.zeros_like(rhs_k)
    rc, rk = rhs_c, rhs_k
    zc, zk = precond(rc, rk)
    pc, pk = zc, zk
    rz = dot(rc, rk, zc, zk)
    rhs_norm = jnp.sqrt(dot(rhs_c, rhs_k, rhs_c, rhs_k))

    # Early-exit CG: a while_loop actually stops at convergence — a frozen
    # fori_loop still pays for its matvecs (the dominant BA cost).
    def cond(state):
        i, xc, xk, rc, rk, pc, pk, rz = state
        return (i < iters) & (
            jnp.sqrt(dot(rc, rk, rc, rk)) > tol * rhs_norm
        )

    def body(state):
        i, xc, xk, rc, rk, pc, pk, rz = state
        Apc, Apk = schur_matvec(op, pc, pk)
        pAp = dot(pc, pk, Apc, Apk)
        alpha = jnp.where(pAp > _EPS, rz / pAp, 0.0)
        xc = xc + alpha * pc
        xk = xk + alpha * pk
        rc = rc - alpha * Apc
        rk = rk - alpha * Apk
        zc, zk = precond(rc, rk)
        rz_new = dot(rc, rk, zc, zk)
        beta = jnp.where(rz > _EPS, rz_new / rz, 0.0)
        pc = zc + beta * pc
        pk = zk + beta * pk
        return i + 1, xc, xk, rc, rk, pc, pk, rz_new

    state = (jnp.int32(0), xc, xk, rc, rk, pc, pk, rz)
    _, xc, xk, *_ = jax.lax.while_loop(cond, body, state)
    return xc, xk


def dense_schur_solve(op: SchurOperator, rhs_c, rhs_k, chunk: int = 128):
    """Materialize S column-by-column (batched matvecs against the identity)
    and solve by Cholesky. For small camera counts the exact solve gives
    full-accuracy LM steps in ONE fused program, where PCG runs cg_iters
    sequential latency-bound matvecs; the engine picks this path when
    num_cameras <= BAConfig.use_dense_schur_below.

    S is symmetric positive definite: LM damping covers free cameras and
    `unit_c` pins parameterless ones, so cho_solve is safe.
    """
    C = rhs_c.shape[0]
    n = 6 * C + 4

    def apply_flat(x):
        xc = x[: 6 * C].reshape(C, 6)
        xk = x[6 * C:]
        Sc, Sk = schur_matvec(op, xc, xk)
        return jnp.concatenate([Sc.reshape(-1), Sk])

    pad = (-n) % chunk
    basis = jnp.eye(n, dtype=rhs_c.dtype)
    if pad:
        basis = jnp.concatenate([basis, jnp.zeros((pad, n), rhs_c.dtype)])
    # Chunked vmap bounds the (n_chunk, O, 2) matvec intermediates.
    cols = jax.lax.map(jax.vmap(apply_flat), basis.reshape(-1, chunk, n))
    S = cols.reshape(-1, n)[:n]
    rhs = jnp.concatenate([rhs_c.reshape(-1), rhs_k])
    x = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S + _EPS * jnp.eye(n, dtype=S.dtype)), rhs
    )
    return x[: 6 * C].reshape(C, 6), x[6 * C:]


def back_substitute(op: SchurOperator, g_p, xc, xk):
    """Recover the point step: dp = Vinv (-g_p - W^T dx_cam)."""
    P = op.Vinv.shape[0]
    a = jnp.einsum("oci,oi->oc", op.Jc, xc[op.obs_cam]) + jnp.einsum(
        "oci,i->oc", op.Jk, xk
    )
    u_p = _seg_sum_pt(jnp.einsum("oci,oc->oi", op.Jp, a), op.obs_point, P)
    return jnp.einsum("pij,pj->pi", op.Vinv, -g_p - u_p)
