"""Perspective-n-Point: batched DLT solver + RANSAC + Gauss-Newton polish.

Replaces cv2.solvePnPRansac(SOLVEPNP_ITERATIVE, 1000 iters, 8 px, >= 15
inliers) (ref sfm_reconstruction.py:232-261) with a vmapped fixed-budget
pipeline: 6-point DLT hypotheses in normalized camera coordinates, masked
pixel-error scoring, argmax consensus, then a few Gauss-Newton iterations on
the inlier set (the analogue of OpenCV's iterative refinement), all with
static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.geometry.projection import project
from sfm_tpu.geometry.rotations import rodrigues, rotation_to_rvec
from sfm_tpu.estimators.ransac import ransac_sample_indices, ransac_select
from sfm_tpu.utils.precision import f32_matmuls
from sfm_tpu.utils.linalg import smallest_eigvec

_EPS = 1e-12


@f32_matmuls
def pnp_dlt(pts3d, pts2d_norm, weights=None, null_fallback: bool = True):
    """Linear PnP from >= 6 correspondences in *normalized* camera coords.

    pts3d: (N, 3) world points; pts2d_norm: (N, 2) points premultiplied by
    K^-1; weights: (N,) soft row selector. Solves for P = [R | t] up to scale
    by DLT, then projects onto SO(3) x R^3 with the depth-sign disambiguated
    so the weighted points land in front of the camera. Returns (R, t).
    """
    pts3d = jnp.asarray(pts3d)
    x = pts2d_norm[..., 0:1]
    y = pts2d_norm[..., 1:2]
    X1 = jnp.concatenate([pts3d, jnp.ones_like(pts3d[..., :1])], axis=-1)  # (N, 4)
    zeros = jnp.zeros_like(X1)
    # Two rows per correspondence: [X 0 -xX], [0 X -yX] (12 unknowns).
    r0 = jnp.concatenate([X1, zeros, -x * X1], axis=-1)
    r1 = jnp.concatenate([zeros, X1, -y * X1], axis=-1)
    A = jnp.concatenate([r0, r1], axis=-2)  # (2N, 12)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=-1)
        A = A * w[..., None]
    # Row normalization for f32 conditioning.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), _EPS)

    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    p = smallest_eigvec(AtA, fallback=null_fallback)
    P = p.reshape(p.shape[:-1] + (3, 4))

    if weights is None:
        weights = jnp.ones(pts3d.shape[:-1], dtype=pts3d.dtype)

    def decompose(Pm):
        """Project [M | p4] onto SO(3) x R^3 and report weighted mean depth.

        SVD-free (TPU: batched 3x3 SVDs over thousands of RANSAC hypotheses
        are a wall-clock AND remote-compile trap): the orthogonal polar
        factor comes from Newton-Schulz iteration, the proper-rotation flip
        for det<0 is P(I - 2vv^T) with v the smallest right singular vector
        (= the SVD recipe U diag(1,1,-1) V^T exactly), and the nuclear norm
        for the scale is trace(P^T M) = sum of singular values.
        """
        M = Pm[..., :3]
        nrm = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True))
        X = M / jnp.maximum(nrm, _EPS)  # sigma_max <= 1: NS converges
        for _ in range(12):
            X = 1.5 * X - 0.5 * jnp.einsum("...ij,...kj,...kl->...il", X, X, X)
        nuclear = jnp.einsum("...ij,...ij->...", X, M)  # trace(P^T M)
        det = jnp.linalg.det(X)
        v = smallest_eigvec(jnp.einsum("...ji,...jk->...ik", M, M))  # (.., 3)
        Pv = jnp.einsum("...ij,...j->...i", X, v)
        R_flip = X - 2.0 * Pv[..., :, None] * v[..., None, :]
        R = jnp.where((det < 0)[..., None, None], R_flip, X)
        scale = 3.0 / jnp.maximum(nuclear, _EPS)
        t = Pm[..., 3] * scale[..., None]
        z = jnp.einsum("...ij,...nj->...ni", R, pts3d)[..., 2] + t[..., 2][..., None]
        mean_z = jnp.sum(z * weights, axis=-1) / jnp.maximum(jnp.sum(weights, axis=-1), _EPS)
        return R, t, mean_z

    # The DLT solution has projective sign ambiguity; pick the sign that puts
    # the (weighted) points in front of the camera.
    R_p, t_p, z_p = decompose(P)
    R_n, t_n, z_n = decompose(-P)
    front = z_p >= z_n
    R = jnp.where(front[..., None, None], R_p, R_n)
    t = jnp.where(front[..., None], t_p, t_n)
    return R, t


def _quartic_roots_dk(c4, c3, c2, c1, c0, iters: int = 30):
    """All four roots of c4 z^4 + ... + c0 via Durand-Kerner — unrolled
    complex fixed-point iteration, no eigensolver (TPU-compile-friendly and
    vmappable over RANSAC hypotheses). Non-converged/degenerate inputs yield
    junk roots that downstream validity masks reject."""
    scale = jnp.where(jnp.abs(c4) > 1e-12, c4, jnp.where(c4 >= 0, 1e-12, -1e-12))
    a3, a2, a1, a0 = c3 / scale, c2 / scale, c1 / scale, c0 / scale
    seed = jnp.asarray(0.4 + 0.9j, jnp.complex64) ** jnp.arange(4)
    z = seed * (1.0 + jnp.abs(a0)) ** 0.25  # radius ~ magnitude of roots

    def p(x):
        return (((x + a3) * x + a2) * x + a1) * x + a0

    for _ in range(iters):
        diff = z[:, None] - z[None, :] + jnp.eye(4, dtype=z.dtype)
        denom = jnp.prod(diff, axis=1)
        z = z - p(z) / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
    return z


def _p3p_candidates(s3, s2n):
    """Grunert's P3P: 3 world points + 3 normalized image coords ->
    up to 4 candidate poses. Returns (Rs (4,3,3), ts (4,3), ok (4,)).

    Quartic in v = d3/d1 (Haralick et al., "Review and analysis of solutions
    of the three point perspective pose estimation problem", IJCV 1994);
    absolute orientation from the 3 camera-frame points via orthonormal
    triads (no SVD). Every failure mode (complex/negative roots, degenerate
    triangles, zero denominators) masks the candidate instead of branching.
    """
    f = jnp.concatenate([s2n, jnp.ones_like(s2n[..., :1])], -1)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), _EPS)
    P1, P2, P3 = s3[0], s3[1], s3[2]
    f1, f2, f3 = f[0], f[1], f[2]
    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.maximum(jnp.sum((P1 - P3) ** 2), _EPS)
    c2 = jnp.sum((P1 - P2) ** 2)
    cos_a = f2 @ f3
    cos_b = f1 @ f3
    cos_c = f1 @ f2
    q = (a2 - c2) / b2
    A4 = (q - 1.0) ** 2 - 4.0 * c2 / b2 * cos_a**2
    A3 = 4.0 * (q * (1.0 - q) * cos_b
                - (1.0 - (a2 + c2) / b2) * cos_a * cos_c
                + 2.0 * c2 / b2 * cos_a**2 * cos_b)
    A2 = 2.0 * (q**2 - 1.0 + 2.0 * q**2 * cos_b**2
                + 2.0 * (b2 - c2) / b2 * cos_a**2
                - 4.0 * (a2 + c2) / b2 * cos_a * cos_b * cos_c
                + 2.0 * (b2 - a2) / b2 * cos_c**2)
    A1 = 4.0 * (-q * (1.0 + q) * cos_b
                + 2.0 * a2 / b2 * cos_c**2 * cos_b
                - (1.0 - (a2 + c2) / b2) * cos_a * cos_c)
    A0 = (1.0 + q) ** 2 - 4.0 * a2 / b2 * cos_c**2

    roots = _quartic_roots_dk(A4, A3, A2, A1, A0)          # (4,) complex
    v = jnp.real(roots)
    root_ok = (jnp.abs(jnp.imag(roots)) < 1e-4 * (1.0 + jnp.abs(v))) & (v > _EPS)

    num = (-1.0 + q) * v * v - 2.0 * q * cos_b * v + 1.0 + q
    den = 2.0 * (cos_c - v * cos_a)
    u = num / jnp.where(jnp.abs(den) > 1e-9, den, 1e-9)
    s = 1.0 + v * v - 2.0 * v * cos_b
    ok = root_ok & (u > _EPS) & (s > _EPS) & (jnp.abs(den) > 1e-9)
    d1 = jnp.sqrt(b2 / jnp.maximum(s, _EPS))               # (4,)
    Pc = jnp.stack([
        d1[:, None] * f1[None, :],
        (u * d1)[:, None] * f2[None, :],
        (v * d1)[:, None] * f3[None, :],
    ], axis=1)                                             # (4, 3, 3)

    def triad(Q):
        e1 = Q[..., 1, :] - Q[..., 0, :]
        e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), _EPS)
        e2 = Q[..., 2, :] - Q[..., 0, :]
        e2 = e2 - jnp.sum(e2 * e1, axis=-1, keepdims=True) * e1
        n2 = jnp.linalg.norm(e2, axis=-1, keepdims=True)
        e2 = e2 / jnp.maximum(n2, _EPS)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1), n2[..., 0] > 1e-9

    Tw, w_ok = triad(s3)                                   # (3, 3)
    Tc, c_ok = triad(Pc)                                   # (4, 3, 3)
    Rs = jnp.einsum("kij,lj->kil", Tc, Tw)                 # Tc @ Tw^T
    ts = Pc[:, 0, :] - jnp.einsum("kij,j->ki", Rs, P1)
    ok = ok & c_ok & w_ok & jnp.isfinite(Rs).all(axis=(-2, -1)) & jnp.isfinite(ts).all(axis=-1)
    Rs = jnp.where(ok[:, None, None], Rs, jnp.eye(3, dtype=Rs.dtype))
    ts = jnp.where(ok[:, None], ts, 0.0)
    return Rs, ts, ok


def _gn_step(rvec, t, pts3d, pts2d, K, w):
    """One damped Gauss-Newton step on masked reprojection residuals."""

    def residual(params):
        rv, tt = params[:3], params[3:]
        proj, _ = project(pts3d, rodrigues(rv), tt, K)
        return ((proj - pts2d) * w[:, None]).reshape(-1)

    params = jnp.concatenate([rvec, t])
    J = jax.jacfwd(residual)(params)  # (2N, 6)
    r = residual(params)
    JtJ = J.T @ J + 1e-6 * jnp.eye(6, dtype=J.dtype)
    delta = jnp.linalg.solve(JtJ, J.T @ r)
    return params - delta


@partial(jax.jit, static_argnames=("iters",))
def refine_pose_gn(R, t, pts3d, pts2d, K, weights, iters: int = 10):
    """Gauss-Newton refinement of (R, t) on weighted reprojection error."""
    rvec = rotation_to_rvec(R)

    def body(_, params):
        return _gn_step(params[:3], params[3:], pts3d, pts2d, K, weights)

    params = jax.lax.fori_loop(0, iters, body, jnp.concatenate([rvec, t]))
    return rodrigues(params[:3]), params[3:]


def _gn_sample_step(rvec, t, s3, s2, K):
    """One Gauss-Newton step on a fixed minimal sample (per-hypothesis polish)."""

    def residual(params):
        proj, _ = project(s3, rodrigues(params[:3]), params[3:], K)
        return (proj - s2).reshape(-1)

    params = jnp.concatenate([rvec, t])
    J = jax.jacfwd(residual)(params)
    r = residual(params)
    JtJ = J.T @ J + 1e-4 * jnp.eye(6, dtype=J.dtype)
    delta = jnp.linalg.solve(JtJ, J.T @ r)
    return params - delta


@partial(jax.jit, static_argnames=("iters", "refine_iters", "sample_size"))
def pnp_ransac_batch(
    keys,
    pts3d,
    pts2d,
    valid,
    K,
    min_inliers,
    iters: int = 1024,
    threshold: float = 8.0,
    refine_iters: int = 10,
    sample_size: int = 8,
):
    """`pnp_ransac` vmapped over a leading candidate axis — ONE dispatch.

    keys: (B,) PRNG keys; pts3d: (B, N, 3); pts2d: (B, N, 2); valid: (B, N);
    K: (3, 3) shared; min_inliers: (B,) per-candidate consensus gates.
    The incremental loop is tunnel-latency-bound (~90 ms per device round
    trip); registering the whole candidate slate per dispatch removes the
    per-candidate trips that dominated the round-1 reconstruction wall-clock.
    """
    return jax.vmap(
        lambda k_, p3, p2, v, mi: pnp_ransac(
            k_, p3, p2, v, K,
            iters=iters, threshold=threshold, min_inliers=mi,
            refine_iters=refine_iters, sample_size=sample_size,
        )
    )(keys, pts3d, pts2d, valid, min_inliers)


@partial(jax.jit, static_argnames=("iters", "refine_iters", "sample_size"))
def pnp_ransac(
    key,
    pts3d,
    pts2d,
    valid,
    K,
    iters: int = 1024,
    threshold: float = 8.0,
    min_inliers: int = 15,
    refine_iters: int = 10,
    sample_size: int = 8,
):
    """Robust camera registration from padded 2D-3D correspondences.

    pts3d: (N, 3); pts2d: (N, 2) pixels; valid: (N,) bool; K: (3, 3).
    Returns dict with R (3,3), t (3,), inliers (N,), num_inliers, ok.
    ``ok`` enforces the reference's gates: >= ``min_inliers`` consensus
    (ref PNP_MIN_INLIERS = 15, sfm_reconstruction.py:18, :250).

    Design note: the linear DLT minimal solver is noise-sensitive for
    shallow/small scenes (measured ~90 px median error on real bunny
    registrations), so *every hypothesis* gets two Gauss-Newton polish steps
    on its own sample before scoring — a vmapped per-hypothesis local
    optimization that costs microseconds on the MXU and makes fixed-budget
    RANSAC match OpenCV's adaptive LO-RANSAC quality.
    """
    pts3d = jnp.asarray(pts3d, jnp.float32)
    pts2d = jnp.asarray(pts2d, jnp.float32)
    valid = jnp.asarray(valid, bool)
    K = jnp.asarray(K, jnp.float32)

    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones_like(pts2d[..., :1])
    pn = (jnp.concatenate([pts2d, ones], axis=-1) @ Kinv.T)[..., :2]

    # PnP budgets are filled front-first -> prefix sampling (no sort).
    idx = ransac_sample_indices(key, valid, iters, sample_size, prefix=True)
    s3 = pts3d[idx]   # (iters, S, 3)
    s2n = pn[idx]     # (iters, S, 2)
    s2 = pts2d[idx]
    if sample_size == 3:
        # Minimal P3P: each sample yields up to 4 exact candidate poses
        # (flattened into the hypothesis axis; invalid candidates score
        # zero). No polish — the pose interpolates its sample exactly, and
        # the P(all-inlier) advantage of 3-point samples (rho^3 vs rho^6)
        # is what makes low-ratio rescue registrations tractable.
        Rs, ts, cand_ok = jax.vmap(_p3p_candidates)(s3, s2n)
        Rs = Rs.reshape(-1, 3, 3)
        ts = ts.reshape(-1, 3)
        cand_ok = cand_ok.reshape(-1)
    else:
        # Hypothesis solves skip the Cholesky-fallback tier (degenerate
        # minimal samples just score no consensus).
        Rs, ts = jax.vmap(lambda a, b: pnp_dlt(a, b, null_fallback=False))(s3, s2n)

        # Per-hypothesis polish: 2 GN steps on the minimal sample.
        def polish(R0, t0, s3_h, s2_h):
            params = _gn_sample_step(rotation_to_rvec(R0), t0, s3_h, s2_h, K)
            params = _gn_sample_step(params[:3], params[3:], s3_h, s2_h, K)
            return rodrigues(params[:3]), params[3:]

        Rs, ts = jax.vmap(polish)(Rs, ts, s3, s2)
        cand_ok = None

    proj, depth = jax.vmap(project, in_axes=(None, 0, 0, None))(pts3d, Rs, ts, K)
    errors = jnp.linalg.norm(proj - pts2d[None], axis=-1)
    errors = jnp.where(depth > 0, errors, jnp.inf)  # behind-camera = outlier
    if cand_ok is not None:
        errors = jnp.where(cand_ok[:, None], errors, jnp.inf)
    best_h, best_inliers, _ = ransac_select(errors, valid, threshold)

    # Polish on the consensus set (init from the winning hypothesis), then
    # re-derive inliers and refit once more (LO-RANSAC inner loop).
    R0, t0 = Rs[best_h], ts[best_h]
    w = best_inliers.astype(jnp.float32)
    R, t = refine_pose_gn(R0, t0, pts3d, pts2d, K, w, iters=refine_iters)
    proj_1, depth_1 = project(pts3d, R, t, K)
    err_1 = jnp.linalg.norm(proj_1 - pts2d, axis=-1)
    w2 = ((err_1 < threshold) & (depth_1 > 0) & valid).astype(jnp.float32)
    R, t = refine_pose_gn(R, t, pts3d, pts2d, K, w2, iters=refine_iters)

    proj_f, depth_f = project(pts3d, R, t, K)
    err_f = jnp.linalg.norm(proj_f - pts2d, axis=-1)
    inliers = (err_f < threshold) & (depth_f > 0) & valid
    num = jnp.sum(inliers).astype(jnp.int32)
    ok = num >= min_inliers

    # Contract: outputs are always finite, even for degenerate input (all
    # rows invalid / coincident points) — callers gate on ``ok``, but a NaN
    # must never leak into downstream state.
    finite = jnp.isfinite(R).all() & jnp.isfinite(t).all()
    R = jnp.where(finite, R, jnp.eye(3, dtype=R.dtype))
    t = jnp.where(finite, t, 0.0)
    return {
        "R": R,
        "rvec": rotation_to_rvec(R),  # in-jit: eager conversion on the host
                                      # loop costs ~1.5 s/call over the
                                      # remote-TPU tunnel (per-op dispatch)
        "t": t,
        "inliers": inliers & finite,
        "num_inliers": jnp.where(finite, num, 0),
        "errors": jnp.where(jnp.isfinite(err_f), err_f, jnp.inf),
        "ok": ok & finite,
    }
