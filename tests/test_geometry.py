"""Unit tests for the geometry core, against closed-form cases, scipy, and the
bunny calib ground truth (which the reference never used — SURVEY.md section 4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfm_tpu.geometry import (
    rodrigues,
    rotation_to_rvec,
    quaternion_from_matrix,
    matrix_from_quaternion,
    project,
    camera_matrix,
    normalize_points,
    eight_point,
    symmetric_epipolar_distance,
    sampson_distance,
    essential_from_fundamental,
    decompose_essential,
    recover_pose,
    triangulate_two_view,
    triangulate_multiview,
)


def random_rotation(rng, n=None):
    from scipy.spatial.transform import Rotation

    if n is None:
        return Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    return Rotation.random(n, random_state=int(rng.integers(1 << 30))).as_matrix()


class TestRotations:
    def test_rodrigues_identity(self):
        R = rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_rodrigues_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation

        rvecs = rng.normal(size=(64, 3)).astype(np.float32)
        ours = np.asarray(rodrigues(rvecs))
        ref = Rotation.from_rotvec(rvecs).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_rvec_roundtrip(self, rng):
        rvecs = rng.normal(size=(128, 3)).astype(np.float32)
        # include tiny and near-pi magnitudes
        rvecs[0] = 0.0
        rvecs[1] = [1e-7, 0, 0]
        rvecs[2] = np.array([np.pi - 1e-4, 0, 0])
        back = np.asarray(rotation_to_rvec(rodrigues(rvecs)))
        R1 = np.asarray(rodrigues(back))
        R0 = np.asarray(rodrigues(rvecs))
        # f32 limit: near theta = pi the diagonal axis extraction is sqrt(eps).
        np.testing.assert_allclose(R1, R0, atol=1e-3)

    def test_rodrigues_differentiable_at_zero(self):
        J = jax.jacfwd(lambda r: rodrigues(r))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(J)))
        # dR/dr at identity is the skew generator basis.
        np.testing.assert_allclose(np.asarray(J)[:, :, 0], np.array([[0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]]), atol=1e-5)

    def test_quaternion_roundtrip(self, rng):
        Rs = random_rotation(rng, 64).astype(np.float32)
        q = quaternion_from_matrix(Rs)
        back = np.asarray(matrix_from_quaternion(q))
        np.testing.assert_allclose(back, Rs, atol=1e-5)

    def test_quaternion_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation

        Rs = random_rotation(rng, 32)
        ours = np.asarray(quaternion_from_matrix(Rs.astype(np.float32)))  # (w,x,y,z)
        ref = Rotation.from_matrix(Rs).as_quat()  # (x,y,z,w)
        ref = np.concatenate([ref[:, 3:4], ref[:, :3]], axis=1)
        ref = ref * np.where(ref[:, :1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestProjection:
    def test_project_against_bunny_calib(self, bunny_calib):
        P, K, R, t = bunny_calib[0]
        X = np.array([[0.1, 0.2, 0.3], [-0.05, 0.6, 0.21]], dtype=np.float64)
        Xh = np.concatenate([X, np.ones((2, 1))], axis=1)
        ref = (P @ Xh.T).T
        ref = ref[:, :2] / ref[:, 2:3]
        ours, depth = project(X.astype(np.float32), R.astype(np.float32), t.astype(np.float32), K.astype(np.float32))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=0.2)

    def test_camera_matrix(self):
        K = camera_matrix(1228.0, 1228.0, 512.0, 384.0)
        np.testing.assert_allclose(K, [[1228, 0, 512], [0, 1228, 384], [0, 0, 1]])


def synthetic_two_view(rng, n=100, noise=0.0):
    """Ground-truth two-view scene: K, (R, t), world points and pixel obs."""
    K = np.array([[1228.0, 0, 512], [0, 1228.0, 384], [0, 0, 1]], dtype=np.float64)
    R = random_rotation(rng)
    # Keep rotation small so points stay in front of both cameras.
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
    t = np.array([1.0, 0.2, 0.1]) + rng.normal(size=3) * 0.05
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    x1 = (K @ X.T).T
    x1 = x1[:, :2] / x1[:, 2:3]
    Xc2 = X @ R.T + t
    x2 = (K @ Xc2.T).T
    x2 = x2[:, :2] / x2[:, 2:3]
    if noise:
        x1 = x1 + rng.normal(size=x1.shape) * noise
        x2 = x2 + rng.normal(size=x2.shape) * noise
    return K, R, t, X, x1, x2


class TestEpipolar:
    def test_eight_point_recovers_f(self, rng):
        K, R, t, X, x1, x2 = synthetic_two_view(rng, n=64)
        F = np.asarray(eight_point(x1.astype(np.float32), x2.astype(np.float32)))
        d = np.asarray(symmetric_epipolar_distance(F, x1.astype(np.float32), x2.astype(np.float32)))
        assert d.mean() < 0.1, d.mean()

    def test_eight_point_weighted_ignores_outliers(self, rng):
        K, R, t, X, x1, x2 = synthetic_two_view(rng, n=64)
        x1o = x1.copy()
        x1o[:10] += rng.uniform(50, 100, size=(10, 2))  # corrupt 10 points
        w = np.ones(64, np.float32)
        w[:10] = 0.0
        F = np.asarray(eight_point(x1o.astype(np.float32), x2.astype(np.float32), w))
        d = np.asarray(symmetric_epipolar_distance(F, x1.astype(np.float32), x2.astype(np.float32)))
        assert d[10:].mean() < 0.1

    def test_symmetric_distance_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        K, R, t, X, x1, x2 = synthetic_two_view(rng, n=64, noise=1.0)
        F, _ = cv2.findFundamentalMat(x1.astype(np.float32), x2.astype(np.float32), cv2.FM_8POINT)
        lines1 = cv2.computeCorrespondEpilines(x2.reshape(-1, 1, 2).astype(np.float32), 2, F).reshape(-1, 3)
        lines2 = cv2.computeCorrespondEpilines(x1.reshape(-1, 1, 2).astype(np.float32), 1, F).reshape(-1, 3)
        e1 = np.abs(np.sum(x1 * lines1[:, :2], axis=1) + lines1[:, 2]) / np.linalg.norm(lines1[:, :2], axis=1)
        e2 = np.abs(np.sum(x2 * lines2[:, :2], axis=1) + lines2[:, 2]) / np.linalg.norm(lines2[:, :2], axis=1)
        ref = (e1 + e2) / 2
        ours = np.asarray(symmetric_epipolar_distance(F.astype(np.float32), x1.astype(np.float32), x2.astype(np.float32)))
        np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-2)

    def test_recover_pose(self, rng):
        K, R, t, X, x1, x2 = synthetic_two_view(rng, n=64)
        E = np.asarray(essential_from_fundamental(
            eight_point(x1.astype(np.float32), x2.astype(np.float32)), K.astype(np.float32)))
        n_good, R_est, t_est, mask = recover_pose(E, x1.astype(np.float32), x2.astype(np.float32), K.astype(np.float32))
        assert int(n_good) > 60
        np.testing.assert_allclose(np.asarray(R_est), R, atol=2e-2)
        t_dir = t / np.linalg.norm(t)
        np.testing.assert_allclose(np.asarray(t_est), t_dir, atol=2e-2)

    def test_sampson_zero_on_perfect(self, rng):
        K, R, t, X, x1, x2 = synthetic_two_view(rng, n=32)
        F = eight_point(x1.astype(np.float32), x2.astype(np.float32))
        s = np.asarray(sampson_distance(F, x1.astype(np.float32), x2.astype(np.float32)))
        assert s.mean() < 0.05

    def test_normalize_points(self, rng):
        pts = rng.uniform(0, 1024, size=(100, 2)).astype(np.float32)
        pn, T = normalize_points(pts)
        np.testing.assert_allclose(np.asarray(pn).mean(axis=0), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(pn), axis=1).mean(), np.sqrt(2), rtol=1e-3)
        # T applied to homogeneous points reproduces pn
        ph = np.concatenate([pts, np.ones((100, 1), np.float32)], axis=1)
        np.testing.assert_allclose((np.asarray(T) @ ph.T).T[:, :2], np.asarray(pn), atol=1e-3)


class TestTriangulation:
    def test_two_view_exact(self, rng):
        K, R, t, X, x1, x2 = synthetic_two_view(rng, n=64)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t[:, None]])
        Xe = np.asarray(triangulate_two_view(P1.astype(np.float32), P2.astype(np.float32),
                                             x1.astype(np.float32), x2.astype(np.float32)))
        np.testing.assert_allclose(Xe, X, rtol=1e-2, atol=2e-2)

    def test_multiview_with_mask(self, rng, bunny_calib):
        # Use 6 real bunny cameras; one view marked invalid with garbage obs.
        ids = list(bunny_calib.keys())[:6]
        Ps = np.stack([bunny_calib[i][0] for i in ids])
        X = np.array([0.05, 0.1, 0.2, 1.0])
        obs = (Ps @ X).reshape(6, 3)
        obs = obs[:, :2] / obs[:, 2:3]
        obs_bad = obs.copy()
        obs_bad[3] = [9999.0, 9999.0]
        valid = np.array([1, 1, 1, 0, 1, 1], dtype=bool)
        Xe = np.asarray(triangulate_multiview(Ps.astype(np.float32), obs_bad.astype(np.float32), valid))
        np.testing.assert_allclose(Xe, X[:3], atol=1e-3)

    def test_two_view_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        K, R, t, X, x1, x2 = synthetic_two_view(rng, n=32, noise=0.5)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t[:, None]])
        ref4 = cv2.triangulatePoints(P1, P2, x1.T.astype(np.float64), x2.T.astype(np.float64))
        ref = (ref4[:3] / ref4[3]).T
        ours = np.asarray(triangulate_two_view(P1.astype(np.float32), P2.astype(np.float32),
                                               x1.astype(np.float32), x2.astype(np.float32)))
        np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-2)


class TestCalibIO:
    def test_decompose_projection_roundtrip(self, bunny_calib):
        for i, (P, K, R, t) in list(bunny_calib.items())[:8]:
            # K upper triangular with positive diagonal, R orthonormal
            assert K[1, 0] == pytest.approx(0, abs=1e-6)
            assert np.all(np.diag(K) > 0)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)
            P_rec = K @ np.hstack([R, t[:, None]])
            np.testing.assert_allclose(P_rec / np.linalg.norm(P_rec), P / np.linalg.norm(P), atol=1e-6)


class TestDegenerateInputs:
    """Degenerate inputs must yield finite values (masked lanes downstream),
    never NaN-poison (verify-skill probe list)."""

    def test_eight_point_all_zero_weights(self):
        import jax.numpy as jnp
        pts = np.random.default_rng(0).uniform(0, 512, (16, 2)).astype(np.float32)
        F = eight_point(jnp.asarray(pts), jnp.asarray(pts + 1.0),
                        weights=jnp.zeros(16, jnp.float32))
        assert np.isfinite(np.asarray(F)).all()

    def test_triangulate_identical_points(self):
        import jax.numpy as jnp
        P = jnp.asarray(np.array([[500.0, 0, 256, 0], [0, 500.0, 256, 0],
                                  [0, 0, 1, 0]], np.float32))
        pts = jnp.full((4, 2), 256.0)
        X = triangulate_two_view(P, P, pts, pts)  # zero baseline
        assert np.isfinite(np.asarray(X)).all()

    def test_multiview_fewer_than_two_views(self):
        import jax.numpy as jnp
        from sfm_tpu.geometry.triangulation import triangulate_multiview
        Ps = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1)))
        pts = jnp.zeros((3, 2), jnp.float32)
        valid = jnp.asarray(np.array([True, False, False]))
        X = triangulate_multiview(Ps, pts, valid)
        assert np.isfinite(np.asarray(X)).all()

    def test_recover_pose_zero_essential(self):
        import jax.numpy as jnp
        K = jnp.asarray(np.array([[500.0, 0, 256], [0, 500, 256], [0, 0, 1]], np.float32))
        pts = np.random.default_rng(1).uniform(0, 512, (12, 2)).astype(np.float32)
        n, R, t, mask = recover_pose(jnp.zeros((3, 3), jnp.float32),
                                     jnp.asarray(pts), jnp.asarray(pts), K)
        assert np.isfinite(np.asarray(R)).all()
        assert np.isfinite(np.asarray(t)).all()
