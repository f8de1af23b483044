"""Bundle adjustment tests: synthetic scenes with known ground truth.

Strategy (SURVEY.md section 4 implication): perturb a perfect scene, run LM,
and require the reprojection error to collapse back to the noise floor.
"""
import numpy as np
import jax.numpy as jnp

from sfm_tpu.config import BAConfig
from sfm_tpu.ba import BAProblem, run_ba
from sfm_tpu.ba.problem import build_problem
from sfm_tpu.geometry import project, rodrigues, rotation_to_rvec


def make_scene(rng, n_cams=6, n_pts=120, noise_px=0.0):
    """Cameras on an arc looking at a point cloud near the origin."""
    from scipy.spatial.transform import Rotation

    pts = rng.uniform(low=[-1, -1, -1], high=[1, 1, 1], size=(n_pts, 3)).astype(np.float32)
    intr = np.array([1200.0, 1200.0, 512.0, 384.0], np.float32)
    K = np.array([[1200, 0, 512], [0, 1200, 384], [0, 0, 1]], np.float32)

    rvecs, tvecs = [], []
    for c in range(n_cams):
        ang = (c - n_cams / 2) * 0.15
        R = Rotation.from_euler("y", ang).as_matrix().astype(np.float32)
        # camera center on a circle of radius 6 looking at origin
        center = np.array([6 * np.sin(ang), 0.3 * c, -6 * np.cos(ang)], np.float32)
        t = -R @ center
        rvecs.append(np.asarray(rotation_to_rvec(R)))
        tvecs.append(t)
    rvecs = np.stack(rvecs)
    tvecs = np.stack(tvecs)

    obs_cam, obs_point, obs_xy = [], [], []
    for c in range(n_cams):
        R = np.asarray(rodrigues(rvecs[c]))
        proj, depth = project(pts, R, tvecs[c], K)
        proj = np.asarray(proj)
        vis = (np.asarray(depth) > 0) & (proj[:, 0] > 0) & (proj[:, 0] < 1024) & (proj[:, 1] > 0) & (proj[:, 1] < 768)
        for p in np.nonzero(vis)[0]:
            obs_cam.append(c)
            obs_point.append(p)
            obs_xy.append(proj[p] + rng.normal(scale=noise_px, size=2))
    return {
        "rvec": rvecs, "tvec": tvecs, "intr": intr, "points": pts,
        "obs_cam": np.array(obs_cam, np.int32),
        "obs_point": np.array(obs_point, np.int32),
        "obs_xy": np.array(obs_xy, np.float32),
    }


def problem_from_scene(s, rvec=None, tvec=None, points=None, intr=None, **kw):
    n_c = s["rvec"].shape[0]
    n_p = s["points"].shape[0]
    n_o = s["obs_cam"].shape[0]
    return build_problem(
        rvec=s["rvec"] if rvec is None else rvec,
        tvec=s["tvec"] if tvec is None else tvec,
        cam_valid=np.ones(n_c, bool),
        intr=s["intr"] if intr is None else intr,
        points=s["points"] if points is None else points,
        point_valid=np.ones(n_p, bool),
        obs_cam=s["obs_cam"], obs_point=s["obs_point"], obs_xy=s["obs_xy"],
        obs_valid=np.ones(n_o, bool),
        **kw,
    )


def mean_reproj_error(prob):
    from sfm_tpu.ba.residuals import residuals_and_jacobians

    r, *_ = residuals_and_jacobians(
        (prob.rvec, prob.tvec, prob.intr, prob.points,
         prob.obs_cam, prob.obs_point, prob.obs_xy)
    )
    err = np.linalg.norm(np.asarray(r), axis=1)
    v = np.asarray(prob.obs_valid)
    return err[v].mean()


CFG = BAConfig(max_iterations=25, cg_iters=60)


class TestBA:
    def test_perfect_scene_stays_put(self, rng):
        s = make_scene(rng)
        prob = problem_from_scene(s)
        out, stats = run_ba(prob, CFG, optimize_intrinsics=False)
        assert mean_reproj_error(out) < 1e-2

    def test_recovers_from_perturbation(self, rng):
        s = make_scene(rng, noise_px=0.0)
        rvec = s["rvec"] + rng.normal(scale=0.01, size=s["rvec"].shape).astype(np.float32)
        tvec = s["tvec"] + rng.normal(scale=0.05, size=s["tvec"].shape).astype(np.float32)
        pts = s["points"] + rng.normal(scale=0.02, size=s["points"].shape).astype(np.float32)
        # Keep camera 0 at ground truth (it is the gauge anchor).
        rvec[0], tvec[0] = s["rvec"][0], s["tvec"][0]
        prob = problem_from_scene(s, rvec=rvec, tvec=tvec, points=pts)
        before = mean_reproj_error(prob)
        out, stats = run_ba(prob, CFG, optimize_intrinsics=False)
        after = mean_reproj_error(out)
        assert before > 5.0
        assert after < 0.05
        assert int(stats["accepted_steps"]) >= 3

    def test_noise_floor(self, rng):
        s = make_scene(rng, noise_px=0.5)
        rvec = s["rvec"] + rng.normal(scale=0.005, size=s["rvec"].shape).astype(np.float32)
        rvec[0] = s["rvec"][0]
        prob = problem_from_scene(s, rvec=rvec)
        out, _ = run_ba(prob, CFG, optimize_intrinsics=False)
        # With 0.5 px observation noise, BA should land near that floor.
        assert mean_reproj_error(out) < 0.8

    def test_intrinsics_refinement(self, rng):
        """Intrinsics optimization must fit the data and enforce fx~fy.

        (Exact focal recovery is not guaranteed: with a shallow scene the
        f/depth projective ambiguity lets BA trade focal error against
        geometry — so the checks are the fit and the regularization contract.)
        """
        s = make_scene(rng)
        bad_intr = s["intr"] + np.array([60.0, -40.0, 8.0, -6.0], np.float32)
        prob = problem_from_scene(s, intr=bad_intr)
        before = mean_reproj_error(prob)
        out, _ = run_ba(prob, CFG, intr_ref=jnp.asarray(bad_intr), optimize_intrinsics=True)
        assert mean_reproj_error(out) < 0.5 < before
        assert abs(float(out.intr[0]) - float(out.intr[1])) < 10.0  # fx ~ fy

    def test_intrinsics_frozen_when_disabled(self, rng):
        s = make_scene(rng)
        bad_intr = s["intr"] + np.array([30.0, -30.0, 4.0, -4.0], np.float32)
        prob = problem_from_scene(s, intr=bad_intr)
        out, _ = run_ba(prob, CFG, optimize_intrinsics=False)
        np.testing.assert_array_equal(np.asarray(out.intr), bad_intr)

    def test_huber_robustness_to_outliers(self, rng):
        s = make_scene(rng, noise_px=0.3)
        # Corrupt 10% of observations grossly.
        n_o = len(s["obs_xy"])
        bad = rng.choice(n_o, n_o // 10, replace=False)
        s["obs_xy"][bad] += rng.uniform(50, 150, size=(len(bad), 2)).astype(np.float32)
        pts = s["points"] + rng.normal(scale=0.02, size=s["points"].shape).astype(np.float32)
        prob = problem_from_scene(s, points=pts)
        out, _ = run_ba(prob, CFG, optimize_intrinsics=False)
        err = mean_reproj_error(out)  # mean over ALL obs incl. outliers
        # Inlier median must be tight despite the corrupted 10%.
        from sfm_tpu.ba.residuals import residuals_and_jacobians

        r, *_ = residuals_and_jacobians(
            (out.rvec, out.tvec, out.intr, out.points,
             out.obs_cam, out.obs_point, out.obs_xy)
        )
        e = np.linalg.norm(np.asarray(r), axis=1)
        good = np.setdiff1d(np.arange(n_o), bad)
        assert np.median(e[good]) < 0.8

    def test_padding_invariance(self, rng):
        """Padded capacity must not change the solution."""
        s = make_scene(rng, n_cams=4, n_pts=60)
        rvec = s["rvec"] + rng.normal(scale=0.008, size=s["rvec"].shape).astype(np.float32)
        rvec[0] = s["rvec"][0]
        p1 = problem_from_scene(s, rvec=rvec)
        p2 = problem_from_scene(
            s, rvec=rvec, pad_cameras=16, pad_points=256,
            pad_obs=s["obs_cam"].shape[0] + 500,
        )
        o1, _ = run_ba(p1, CFG, optimize_intrinsics=False)
        o2, _ = run_ba(p2, CFG, optimize_intrinsics=False)
        np.testing.assert_allclose(
            np.asarray(o1.points), np.asarray(o2.points)[:60], atol=1e-3
        )
        assert abs(mean_reproj_error(o1) - mean_reproj_error(o2)) < 1e-3


class TestDenseSchur:
    def test_direct_assembly_matches_matvec_build(self):
        """dense_schur_direct (co-observation segment reduction) must produce
        the same LM step as the identity-matvec S build it replaces
        (round-2 verdict weak #4). Compared in f64 so the check is
        mathematical, not a race between two f32 summation orders."""
        import jax
        import jax.numpy as jnp
        from sfm_tpu.ba.residuals import residuals_and_jacobians, huber_weights
        from sfm_tpu.ba.schur import (
            linearize_system, damp_operator, dense_schur_solve,
            dense_schur_direct, coobs_pairs,
        )

        local_rng = np.random.default_rng(1234)
        s = make_scene(local_rng, n_cams=7, n_pts=90, noise_px=0.5)
        prob = problem_from_scene(
            s, rvec=s["rvec"] + local_rng.normal(
                scale=0.01, size=s["rvec"].shape).astype(np.float32)
        )
        r, Jc, Jk, Jp = residuals_and_jacobians(
            (prob.rvec, prob.tvec, prob.intr, prob.points,
             prob.obs_cam, prob.obs_point, prob.obs_xy)
        )
        w = huber_weights(r, 2.0)
        cam_free = (prob.cam_valid & ~prob.cam_fixed).astype(np.float64)
        with jax.enable_x64(True):
            f64 = lambda x: jnp.asarray(np.asarray(x), jnp.float64)
            lin = linearize_system(
                f64(Jc), f64(Jk), f64(Jp), f64(r), f64(w),
                prob.obs_cam, prob.obs_point,
                f64(prob.obs_valid.astype(np.float32)),
                jnp.asarray(cam_free), prob.point_valid,
                jnp.eye(4, dtype=jnp.float64) * 0.01,
                prob.num_cameras, prob.num_points,
            )
            op, rhs_c, rhs_k, _ = damp_operator(lin, jnp.float64(1e-3))
            xc1, xk1 = dense_schur_solve(op, rhs_c, rhs_k)
            perm, pvm = coobs_pairs(
                np.asarray(prob.obs_point), np.asarray(prob.obs_valid),
                v_bucket=4,
            )
            xc2, xk2 = dense_schur_direct(
                op, lin, rhs_c, rhs_k, jnp.asarray(perm), jnp.asarray(pvm),
            )
        np.testing.assert_allclose(np.asarray(xc1), np.asarray(xc2),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(xk1), np.asarray(xk2),
                                   rtol=1e-6, atol=1e-9)


class TestPerCameraIntrinsics:
    def test_recovers_two_different_focals(self, rng):
        """BAConfig.per_camera_intrinsics: the reference parameterizes 10
        params/camera (rvec, t, fx, fy, cx, cy — ref sfm_reconstruction.py
        :415-427) then averages K after solving (:532-538). Two cameras with
        different true focals must both be recovered."""
        from scipy.spatial.transform import Rotation
        from sfm_tpu.geometry import rotation_to_rvec, rodrigues, project

        fx_true = np.array([1140.0, 1140.0, 1140.0, 1270.0, 1270.0, 1270.0],
                           np.float32)
        n_cams, n_pts = len(fx_true), 160
        pts = rng.uniform(low=[-1, -1, -1], high=[1, 1, 1],
                          size=(n_pts, 3)).astype(np.float32)
        rvecs, tvecs = [], []
        obs_cam, obs_point, obs_xy = [], [], []
        for c in range(n_cams):
            ang = (c - n_cams / 2) * 0.15
            R = Rotation.from_euler("y", ang).as_matrix().astype(np.float32)
            center = np.array([6 * np.sin(ang), 0.3 * c, -6 * np.cos(ang)],
                              np.float32)
            t = -R @ center
            rvecs.append(np.asarray(rotation_to_rvec(R)))
            tvecs.append(t)
            K = np.array([[fx_true[c], 0, 512], [0, fx_true[c], 384],
                          [0, 0, 1]], np.float32)
            proj, depth = project(pts, R, t, K)
            proj = np.asarray(proj)
            vis = (np.asarray(depth) > 0) & (proj[:, 0] > 0) & (proj[:, 0] < 1024) \
                & (proj[:, 1] > 0) & (proj[:, 1] < 768)
            for p in np.nonzero(vis)[0]:
                obs_cam.append(c)
                obs_point.append(p)
                obs_xy.append(proj[p])
        prob = build_problem(
            rvec=np.stack(rvecs), tvec=np.stack(tvecs),
            cam_valid=np.ones(n_cams, bool),
            intr=np.array([1200.0, 1200.0, 512.0, 384.0], np.float32),
            points=pts, point_valid=np.ones(n_pts, bool),
            obs_cam=np.array(obs_cam, np.int32),
            obs_point=np.array(obs_point, np.int32),
            obs_xy=np.array(obs_xy, np.float32),
            obs_valid=np.ones(len(obs_cam), bool),
        )
        # The focal-depth trade-off makes one descent direction very
        # ill-conditioned: run the loop out instead of stopping at ftol, and
        # disable the fx anchor (it deliberately biases along exactly that
        # flat direction; the reference's weight-0.1 anchor does too).
        cfg = BAConfig(per_camera_intrinsics=True, max_iterations=400,
                       intrinsics_reg_weight=0.0, ftol=0.0)
        out, stats = run_ba(prob, cfg, optimize_intrinsics=True)
        intr_c = np.asarray(out.intr_c)
        np.testing.assert_allclose(intr_c[:, 0], fx_true, rtol=0.01)
        np.testing.assert_allclose(intr_c[:, 1], fx_true, rtol=0.01)
        # Shared K refreshed to the valid-camera mean (ref :532-538).
        np.testing.assert_allclose(
            np.asarray(out.intr), intr_c.mean(0), rtol=1e-5
        )
        # A shared-intrinsics solve CANNOT satisfy both halves: it lands
        # near the middle, away from either true focal.
        out_sh, _ = run_ba(prob, BAConfig(max_iterations=40),
                           optimize_intrinsics=True)
        fx_shared = float(np.asarray(out_sh.intr)[0])
        assert abs(fx_shared - 1140.0) > 30 and abs(fx_shared - 1270.0) > 30

    def test_pcg_matches_dense_with_regularization(self, rng):
        """In per-camera mode the intrinsics regularization Hessian lives in
        U as an addition the Jc products cannot reconstruct: the PCG matvec
        must apply it explicitly or it solves a DIFFERENT (under-regularized)
        system than the dense-direct path (regression: the matvec omitted
        U_extra while the preconditioner and rhs included it)."""
        from sfm_tpu.geometry import project, rodrigues

        n_cams, n_pts = 5, 200
        pts = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
        pts[:, 2] += 8.0
        rvec = 0.01 * rng.normal(size=(n_cams, 3)).astype(np.float32)
        tvec = np.concatenate(
            [rng.uniform(-1, 1, (n_cams, 2)), np.zeros((n_cams, 1))], 1
        ).astype(np.float32)
        K = np.array([[900, 0, 256], [0, 900, 256], [0, 0, 1]], np.float32)
        obs_cam = np.repeat(np.arange(n_cams, dtype=np.int32), n_pts)
        obs_point = np.tile(np.arange(n_pts, dtype=np.int32), n_cams)
        xy = []
        for c in range(n_cams):
            R = np.asarray(rodrigues(jnp.asarray(rvec[c])))
            p, _ = project(pts, R, tvec[c], K)
            xy.append(np.asarray(p))
        obs_xy = np.concatenate(xy) + rng.normal(
            scale=0.4, size=(len(obs_cam), 2)).astype(np.float32)
        prob = build_problem(
            rvec=rvec, tvec=tvec, cam_valid=np.ones(n_cams, bool),
            intr=np.array([900.0, 900.0, 256.0, 256.0], np.float32),
            points=pts, point_valid=np.ones(n_pts, bool),
            obs_cam=obs_cam, obs_point=obs_point, obs_xy=obs_xy,
            obs_valid=np.ones(len(obs_cam), bool),
        )
        base = dict(per_camera_intrinsics=True, intrinsics_reg_weight=5.0,
                    max_iterations=8, cg_iters=200, cg_tol=1e-10, ftol=0.0)
        _, s_pcg = run_ba(prob, BAConfig(use_dense_schur_below=0, **base),
                          optimize_intrinsics=True)
        _, s_dense = run_ba(prob, BAConfig(use_dense_schur_below=64, **base),
                            optimize_intrinsics=True)
        d, p = float(s_dense["final_cost"]), float(s_pcg["final_cost"])
        assert abs(d - p) <= 1e-3 * max(abs(d), abs(p)), (d, p)


class TestCoobsBucketing:
    def test_row_axis_bucketed(self):
        """coobs_pairs must return bucket-stable shapes as the point count
        grows, or the jitted dense-path BA program re-traces on nearly every
        incremental bundle_adjust call (30-70 s server compile each through
        the remote tunnel)."""
        from sfm_tpu.ba.schur import coobs_pairs

        def shape_for(n_points):
            obs_point = np.repeat(np.arange(n_points, dtype=np.int32), 3)
            obs_valid = np.ones(len(obs_point), bool)
            perm, valid = coobs_pairs(obs_point, obs_valid)
            return perm.shape

        # Growing G within one power-of-two bucket: same shape.
        assert shape_for(40) == shape_for(64)
        assert shape_for(65) == shape_for(128)
        assert shape_for(40) != shape_for(65)
        # Padded rows are dead (masked) slots.
        obs_point = np.repeat(np.arange(40, dtype=np.int32), 3)
        perm, valid = coobs_pairs(obs_point, np.ones(len(obs_point), bool))
        assert valid[:40].sum() == 120 and not valid[40:].any()


class TestBlockedBA:
    """Blocked (P, V) layout must agree with the flat-table LM."""

    def _to_blocked(self, s, rvec=None, V=8):
        from sfm_tpu.ba.blocked import build_blocked_problem

        n_c = s["rvec"].shape[0]
        n_p = s["points"].shape[0]
        obs_cam = np.zeros((n_p, V), np.int32)
        obs_xy = np.zeros((n_p, V, 2), np.float32)
        obs_valid = np.zeros((n_p, V), bool)
        fill = np.zeros(n_p, np.int32)
        for c, p, xy in zip(s["obs_cam"], s["obs_point"], s["obs_xy"]):
            k = fill[p]
            if k >= V:
                continue
            obs_cam[p, k] = c
            obs_xy[p, k] = xy
            obs_valid[p, k] = True
            fill[p] += 1
        return build_blocked_problem(
            rvec=s["rvec"] if rvec is None else rvec,
            tvec=s["tvec"], cam_valid=np.ones(n_c, bool), intr=s["intr"],
            points=s["points"], point_valid=np.ones(n_p, bool),
            obs_cam=obs_cam, obs_xy=obs_xy, obs_valid=obs_valid,
        )

    def test_matches_flat(self, rng):
        from sfm_tpu.ba.blocked import run_ba_blocked

        s = make_scene(rng, n_cams=5, n_pts=80)
        rvec = s["rvec"] + rng.normal(scale=0.008, size=s["rvec"].shape).astype(np.float32)
        rvec[0] = s["rvec"][0]

        flat = problem_from_scene(s, rvec=rvec)
        out_f, _ = run_ba(flat, CFG, optimize_intrinsics=False)

        blocked = self._to_blocked(s, rvec=rvec)
        out_b, stats_b = run_ba_blocked(blocked, CFG, optimize_intrinsics=False)

        e_f = mean_reproj_error(out_f)
        # Blocked result error via the flat evaluator on the same obs.
        flat_b = problem_from_scene(
            s, rvec=np.array(out_b.rvec), tvec=np.array(out_b.tvec),
            points=np.array(out_b.points),
        )
        e_b = mean_reproj_error(flat_b)
        assert e_f < 0.05 and e_b < 0.05

    def test_segment_sum_fallback_matches_onehot(self, rng, monkeypatch):
        """Past _ONEHOT_BUDGET_ELEMS the camera reduction switches from the
        dense one-hot matmul to segment_sum (the 4000-camera corridor OOM'd
        on a 21 GB one-hot). Both reductions must produce the same solve."""
        import sfm_tpu.ba.blocked as blocked_mod
        from sfm_tpu.ba.blocked import run_ba_blocked

        s = make_scene(rng, n_cams=5, n_pts=80)
        rvec = s["rvec"] + rng.normal(scale=0.008, size=s["rvec"].shape).astype(np.float32)
        rvec[0] = s["rvec"][0]
        b = self._to_blocked(s, rvec=rvec)
        o1, _ = run_ba_blocked(b, CFG, optimize_intrinsics=False)

        monkeypatch.setattr(blocked_mod, "_ONEHOT_BUDGET_ELEMS", 0)
        run_ba_blocked.clear_cache()  # constant is baked at trace time
        try:
            o2, _ = run_ba_blocked(b, CFG, optimize_intrinsics=False)
        finally:
            run_ba_blocked.clear_cache()  # don't leak scatter traces to other tests
        np.testing.assert_allclose(
            np.asarray(o1.points), np.asarray(o2.points), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(o1.rvec), np.asarray(o2.rvec), atol=1e-6
        )

    def test_flat_segment_sum_fallback_matches_onehot(self, rng, monkeypatch):
        import sfm_tpu.ba.schur as schur_mod
        from sfm_tpu.ba.lm import _run_ba_jit

        s = make_scene(rng, n_cams=5, n_pts=80)
        rvec = s["rvec"] + rng.normal(scale=0.008, size=s["rvec"].shape).astype(np.float32)
        rvec[0] = s["rvec"][0]
        flat = problem_from_scene(s, rvec=rvec)
        o1, _ = run_ba(flat, CFG, optimize_intrinsics=False)
        monkeypatch.setattr(schur_mod, "_ONEHOT_BUDGET_ELEMS", 0)
        _run_ba_jit.clear_cache()  # constant is baked at trace time
        try:
            o2, _ = run_ba(flat, CFG, optimize_intrinsics=False)
        finally:
            _run_ba_jit.clear_cache()
        np.testing.assert_allclose(
            np.asarray(o1.points), np.asarray(o2.points), atol=1e-4
        )

    def test_blocked_padding_ignored(self, rng):
        from sfm_tpu.ba.blocked import run_ba_blocked

        s = make_scene(rng, n_cams=4, n_pts=60)
        b1 = self._to_blocked(s, V=8)
        b2 = self._to_blocked(s, V=16)  # more padding, same data
        o1, _ = run_ba_blocked(b1, CFG, optimize_intrinsics=False)
        o2, _ = run_ba_blocked(b2, CFG, optimize_intrinsics=False)
        np.testing.assert_allclose(
            np.asarray(o1.points), np.asarray(o2.points), atol=1e-3
        )


class TestF64NormalEquations:
    """SURVEY.md section 7 hard-part #1: f32 normal equations square the
    Jacobian's condition number; on high-dynamic-range scenes LM stalls at an
    f32 rounding floor that the f64 island pushes through."""

    def _ill_conditioned_problem(self, n_cams=1000, n_pts=6000, obs_per_cam=40):
        """Uncentered far-away cloud + 100k-px focal + noiseless observations:
        the exact solution has cost ~0, so the convergence floor IS the
        arithmetic. (Measured at n_cams=100: f32 floors at ~2.4x the f64
        cost.)"""
        import jax.numpy as jnp
        from sfm_tpu.ba.problem import build_problem
        from sfm_tpu.ba.residuals import residuals_and_jacobians

        rng = np.random.default_rng(0)
        offset, depth, f = 20000.0, 8000.0, 100000.0
        pts = (rng.uniform(-1, 1, (n_pts, 3)) * np.array([20.0, 20.0, 5.0])
               + np.array([offset, offset, depth])).astype(np.float32)
        rvec = 0.001 * rng.normal(size=(n_cams, 3)).astype(np.float32)
        tvec = (0.5 * rng.normal(size=(n_cams, 3))).astype(np.float32)
        intr = np.array([f, f, 2000.0, 1500.0], np.float32)
        obs_cam = np.repeat(np.arange(n_cams, dtype=np.int32), obs_per_cam)
        obs_point = rng.integers(0, n_pts, n_cams * obs_per_cam).astype(np.int32)
        r0, *_ = residuals_and_jacobians(
            (jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(intr),
             jnp.asarray(pts), jnp.asarray(obs_cam), jnp.asarray(obs_point),
             jnp.zeros((len(obs_cam), 2), jnp.float32)))
        obs_xy = np.asarray(r0)  # exact: noiseless
        cam_fixed = np.zeros(n_cams, bool)
        cam_fixed[0] = True
        return build_problem(
            rvec=rvec + 0.0005 * rng.normal(size=rvec.shape).astype(np.float32),
            tvec=tvec + 0.02 * rng.normal(size=tvec.shape).astype(np.float32),
            points=pts + 0.05 * rng.normal(size=pts.shape).astype(np.float32),
            cam_valid=np.ones(n_cams, bool), intr=intr,
            point_valid=np.ones(n_pts, bool),
            obs_cam=obs_cam, obs_point=obs_point, obs_xy=obs_xy,
            obs_valid=np.ones(len(obs_cam), bool), cam_fixed=cam_fixed,
        )

    def test_f64_island_converges_past_f32_floor(self):
        from sfm_tpu.config import BAConfig

        prob = self._ill_conditioned_problem()
        base = dict(max_iterations=12, cg_iters=40, cg_tol=1e-10, ftol=0.0,
                    use_dense_schur_below=0)
        _, s32 = run_ba(prob, BAConfig(f64_normal_equations=False, **base),
                        optimize_intrinsics=False)
        _, s64 = run_ba(prob, BAConfig(f64_normal_equations=True, **base),
                        optimize_intrinsics=False)
        c32, c64 = float(s32["final_cost"]), float(s64["final_cost"])
        assert np.isfinite(c32) and np.isfinite(c64)
        # The f64 island must keep descending where f32 has hit its floor.
        assert c64 < 0.75 * c32, (c32, c64)
        assert float(s64["rms_px"]) < float(s32["rms_px"])


class TestChunkedJacobians:
    """residuals_and_jacobians chunks its vmapped-jacrev over observations
    past _JAC_CHUNK (the per-obs (2,3,3) temps tile-pad 57x on TPU and
    OOMed the chip at O=1.75M) — the chunked path must be exactly the
    direct path."""

    def test_chunked_equals_direct(self, monkeypatch):
        from sfm_tpu.ba import residuals as res_mod

        rng = np.random.default_rng(3)
        C, P, O = 7, 50, 1000
        rvec = 0.1 * rng.normal(size=(C, 3)).astype(np.float32)
        tvec = rng.normal(size=(C, 3)).astype(np.float32)
        intr = np.array([1200.0, 1190.0, 500.0, 380.0], np.float32)
        pts = rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 8]
        obs_cam = rng.integers(0, C, O).astype(np.int32)
        obs_point = rng.integers(0, P, O).astype(np.int32)
        obs_xy = rng.uniform(0, 1000, (O, 2)).astype(np.float32)
        args = tuple(jnp.asarray(a) for a in
                     (rvec, tvec, intr, pts, obs_cam, obs_point, obs_xy))
        direct = res_mod.residuals_and_jacobians(args)
        monkeypatch.setattr(res_mod, "_JAC_CHUNK", 192)  # not a divisor of O
        chunked = res_mod.residuals_and_jacobians(args)
        for d, c in zip(direct, chunked):
            # Not bitwise: chunking changes XLA fusion shapes, which changes
            # rounding in the last ulp or two.
            np.testing.assert_allclose(np.asarray(d), np.asarray(c),
                                       rtol=3e-5, atol=3e-3)

    def test_chunked_percam_equals_direct(self, monkeypatch):
        from sfm_tpu.ba import residuals as res_mod

        rng = np.random.default_rng(4)
        C, P, O = 5, 40, 700
        rvec = 0.1 * rng.normal(size=(C, 3)).astype(np.float32)
        tvec = rng.normal(size=(C, 3)).astype(np.float32)
        intr_c = np.tile(np.array([1200.0, 1190.0, 500.0, 380.0], np.float32),
                         (C, 1))
        pts = rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 8]
        obs_cam = rng.integers(0, C, O).astype(np.int32)
        obs_point = rng.integers(0, P, O).astype(np.int32)
        obs_xy = rng.uniform(0, 1000, (O, 2)).astype(np.float32)
        args = tuple(jnp.asarray(a) for a in
                     (rvec, tvec, intr_c, pts, obs_cam, obs_point, obs_xy))
        direct = res_mod.residuals_and_jacobians_percam(args)
        monkeypatch.setattr(res_mod, "_JAC_CHUNK", 256)
        chunked = res_mod.residuals_and_jacobians_percam(args)
        for d, c in zip(direct, chunked):
            np.testing.assert_allclose(np.asarray(d), np.asarray(c),
                                       rtol=3e-5, atol=3e-3)
