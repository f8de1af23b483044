"""Global SfM initialization: rotation/translation averaging + end-to-end.

A beyond-reference capability (the reference only grows incrementally from a
two-view seed, ref sfm_reconstruction.py:61-155, :633-709); tested against
synthetic ground truth the way SURVEY.md section 4 prescribes for every
geometry stage.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from sfm_tpu.config import (
    SfMConfig, MatchConfig, VerifyConfig, PnPConfig, BAConfig, GlobalInitConfig,
)
from sfm_tpu.matching import all_pairs_sweep
from sfm_tpu.reconstruction import StructureFromMotion
from sfm_tpu.reconstruction.global_init import (
    nearest_rotation,
    rotation_averaging,
    translation_averaging,
    global_poses,
)

from test_reconstruction import make_multiview


def random_rotations(rng, n):
    from scipy.spatial.transform import Rotation

    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


def rot_angle_deg(A, B):
    """Geodesic angle between rotation matrices (degrees)."""
    dR = A @ np.swapaxes(B, -1, -2)
    tr = np.trace(dR, axis1=-2, axis2=-1)
    return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))


def ring_pairs(rng, n, extra=12):
    """Connected measurement graph: ring + random chords."""
    pairs = [(i, (i + 1) % n) for i in range(n)]
    while len(pairs) < n + extra:
        i, j = rng.integers(0, n, 2)
        if i != j and (min(i, j), max(i, j)) not in pairs:
            pairs.append((min(i, j), max(i, j)))
    return np.array([(min(i, j), max(i, j)) for i, j in pairs], np.int32)


class TestNearestRotation:
    def test_projects_to_so3(self, rng):
        A = rng.normal(size=(16, 3, 3)).astype(np.float32)
        R = np.asarray(nearest_rotation(jnp.asarray(A)))
        eye = np.einsum("nab,ncb->nac", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)
        assert np.all(np.linalg.det(R) > 0.9)

    def test_near_rotation_is_fixed_point(self, rng):
        R_gt = random_rotations(rng, 8)
        R = np.asarray(nearest_rotation(jnp.asarray(R_gt + 0.01)))
        assert rot_angle_deg(R, R_gt).max() < 2.0

    def test_negative_det_input(self, rng):
        R_gt = random_rotations(rng, 4)
        flipped = R_gt.copy()
        flipped[:, :, 2] *= -1  # det -1
        R = np.asarray(nearest_rotation(jnp.asarray(flipped)))
        assert np.all(np.linalg.det(R) > 0.9)


class TestRotationAveraging:
    def test_exact_measurements(self, rng):
        n = 12
        R_gt = random_rotations(rng, n)
        pairs = ring_pairs(rng, n)
        R_rel = np.stack([R_gt[j] @ R_gt[i].T for i, j in pairs])
        w = np.ones(len(pairs), np.float32)
        R_est = rotation_averaging(pairs, R_rel, w, n)
        # Gauge-align and compare.
        errs = [
            rot_angle_deg(R_est[i] @ R_est[0].T, R_gt[i] @ R_gt[0].T)
            for i in range(1, n)
        ]
        assert max(errs) < 0.5, errs

    def test_noise_and_outliers(self, rng):
        from scipy.spatial.transform import Rotation

        n = 14
        R_gt = random_rotations(rng, n)
        pairs = ring_pairs(rng, n, extra=24)
        noise = Rotation.from_rotvec(
            rng.normal(scale=np.deg2rad(2.0), size=(len(pairs), 3))
        ).as_matrix().astype(np.float32)
        R_rel = np.stack(
            [noise[p] @ R_gt[j] @ R_gt[i].T for p, (i, j) in enumerate(pairs)]
        )
        # Two gross outlier measurements: the Huber IRLS must contain them.
        R_rel[3] = random_rotations(rng, 1)[0]
        R_rel[7] = random_rotations(rng, 1)[0]
        w = np.ones(len(pairs), np.float32)
        R_est = rotation_averaging(pairs, R_rel, w, n)
        errs = [
            rot_angle_deg(R_est[i] @ R_est[0].T, R_gt[i] @ R_gt[0].T)
            for i in range(1, n)
        ]
        assert np.mean(errs) < 2.5, errs
        assert max(errs) < 6.0, errs


class TestTreeInit:
    """Spanning-tree seeding: required on large-diameter (chain) graphs."""

    def _chain_scene(self, rng, n=240, window=4):
        """Corridor in miniature. Convergence regimes (probed at 0.3 deg
        edge noise): with window 4 the identity-start spectral solve holds
        ~0.8 deg at n=240 but diverges to ~10 deg at n=1000, while the
        tree-seeded solve stays at the random-walk floor (~1.7 deg);
        at the real corridor's window 12 both converge even at n=1000."""
        from scipy.spatial.transform import Rotation

        # Gentle yaw drift along a line — a corridor in miniature.
        yaw = np.cumsum(rng.normal(scale=0.02, size=n))
        R_gt = Rotation.from_euler("y", yaw[:, None]).as_matrix().astype(np.float32)
        C_gt = np.stack([np.arange(n, dtype=np.float32),
                         0.1 * np.sin(np.arange(n) * 0.2),
                         np.zeros(n, np.float32)], 1)
        pairs = np.array([(i, j) for i in range(n)
                          for j in range(i + 1, min(i + 1 + window, n))],
                         np.int32)
        noise = Rotation.from_rotvec(
            rng.normal(scale=np.deg2rad(0.3), size=(len(pairs), 3))
        ).as_matrix().astype(np.float32)
        R_rel = np.stack([noise[p] @ R_gt[j] @ R_gt[i].T
                          for p, (i, j) in enumerate(pairs)])
        w = np.ones(len(pairs), np.float32)
        return R_gt, C_gt, pairs, R_rel, w

    def test_forest_covers_connected_graph(self, rng):
        from sfm_tpu.reconstruction.global_init import spanning_forest

        _, _, pairs, _, w = self._chain_scene(rng, n=60)
        child, parent, edge, flip = spanning_forest(pairs, w, 60)
        assert len(child) == 59                  # one tree, 60 nodes
        assert set(child) | set(parent) == set(range(60))
        assert len(set(child)) == 59             # each node initialized once
        # Every edge index refers to the right endpoint set.
        for c, p, e, f in zip(child[:10], parent[:10], edge[:10], flip):
            a, b = pairs[e]
            assert {a, b} == {c, p}

    def test_chain_rotations_converge_only_with_tree_init(self, rng):
        from sfm_tpu.reconstruction.global_init import (
            spanning_forest, tree_init_rotations)

        # n=1000 window=4: diameter ~250 graph-hops — past what the
        # identity-start spectral solve can propagate in its budget.
        R_gt, _, pairs, R_rel, w = self._chain_scene(rng, n=1000, window=4)
        n = len(R_gt)
        forest = spanning_forest(pairs, w, n)
        R0 = tree_init_rotations(forest, R_rel, n)
        R_tree = rotation_averaging(pairs, R_rel, w, n, init=R0)
        R_zero = rotation_averaging(pairs, R_rel, w, n)

        def med_err(R_est):
            errs = [rot_angle_deg(R_est[i] @ R_est[0].T, R_gt[i] @ R_gt[0].T)
                    for i in range(1, n)]
            return float(np.median(errs))

        # Physics floor: 0.3 deg/edge noise random-walks to ~2 deg over the
        # ~500-edge tree paths; the averaging must stay at that floor, not
        # the chain-diameter divergence of the zero start (~10 deg measured).
        assert med_err(R_tree) < 3.0, med_err(R_tree)
        # If this ever starts passing, the zero start converges on large
        # diameters too and the tree init is no longer load-bearing.
        assert med_err(R_zero) > 2.0 * med_err(R_tree)

    def test_chain_centers_converge_with_tree_init(self, rng):
        from sfm_tpu.reconstruction.global_init import (
            spanning_forest, tree_init_centers)

        R_gt, C_gt, pairs, R_rel, w = self._chain_scene(rng)
        n = len(R_gt)
        # Exact directions from GT geometry (isolates the translation stage).
        t_rel = np.stack([
            -R_gt[j] @ (C_gt[j] - C_gt[i]) for i, j in pairs
        ]).astype(np.float32)
        t_rel /= np.linalg.norm(t_rel, axis=1, keepdims=True)
        forest = spanning_forest(pairs, w, n)
        C0 = tree_init_centers(forest, R_gt, pairs, t_rel, n)
        C = translation_averaging(pairs, R_gt, t_rel, w, n, init=C0)
        # Similarity-align and compare (gauge: scale+rotation+shift free).
        from sfm_tpu.io.calib import umeyama

        s, Q, T = umeyama(C, C_gt)
        err = np.linalg.norm((s * C @ Q.T + T) - C_gt, axis=1)
        extent = np.linalg.norm(C_gt - C_gt.mean(0), axis=1).mean()
        assert np.median(err) < 0.02 * extent, (np.median(err), extent)


class TestTranslationAveraging:
    def test_recovers_centers(self, rng):
        n = 10
        R_gt = random_rotations(rng, n)
        C_gt = rng.normal(size=(n, 3)).astype(np.float32) * 3.0
        pairs = ring_pairs(rng, n, extra=16)
        # t_ij = R_j (C_i - C_j), unit-normalized like recover_pose outputs.
        t_rel = np.stack([R_gt[j] @ (C_gt[i] - C_gt[j]) for i, j in pairs])
        t_rel /= np.linalg.norm(t_rel, axis=-1, keepdims=True)
        w = np.ones(len(pairs), np.float32)
        C = translation_averaging(pairs, R_gt, t_rel, w, n)
        # Compare up to similarity (centroid + scale).
        A = C - C.mean(0)
        B = C_gt - C_gt.mean(0)
        scale = np.sum(A * B) / max(np.sum(A * A), 1e-12)
        resid = np.linalg.norm(scale * A - B, axis=-1)
        assert resid.max() < 0.05 * np.linalg.norm(B, axis=-1).mean(), resid


class TestGlobalReconstruction:
    @pytest.fixture(scope="class")
    def scene_and_table(self):
        rng = np.random.default_rng(11)
        scene = make_multiview(rng)
        cfg = SfMConfig(
            matching=MatchConfig(max_matches=256),
            verify=VerifyConfig(ransac_iters=512),
        )
        table = all_pairs_sweep(scene["xy"], scene["desc"], scene["valid"], cfg, chunk_size=8)
        return scene, table

    def test_global_poses_match_gt(self, scene_and_table):
        scene, table = scene_and_table
        rvec, tvec, placed = global_poses(table, scene["K"], 8)
        assert placed.sum() == 8
        from sfm_tpu.geometry import rodrigues

        R_est = np.asarray(rodrigues(jnp.asarray(rvec)))
        errs = [
            rot_angle_deg(R_est[i] @ R_est[0].T, scene["R"][i] @ scene["R"][0].T)
            for i in range(1, 8)
        ]
        assert max(errs) < 3.0, errs

    def test_end_to_end(self, scene_and_table):
        scene, table = scene_and_table
        cfg = SfMConfig(
            pnp=PnPConfig(ransac_iters=512),
            ba=BAConfig(max_iterations=15, cg_iters=40, optimize_intrinsics=False),
            global_init=GlobalInitConfig(enabled=True),
        )
        sfm = StructureFromMotion(table, scene["xy"], cfg)
        res = sfm.run_global_reconstruction()
        assert len(res.image_ids) == 8
        assert res.stats["mean_reprojection_error"] < 1.0
        assert res.stats["num_points"] > 100
        # Consistency self-diagnostic: a clean synthetic graph must agree
        # with its own pair rotations; bunny's hostile graph measures ~24%
        # of edges >10 deg off any rigid model.
        assert res.stats["global_pair_residual_deg"] < 2.0
        assert res.stats["global_pair_outlier_frac"] < 0.05
        for k, img in enumerate(res.image_ids):
            if k == 0:
                R0_est, R0_gt = res.rotations[0], scene["R"][res.image_ids[0]]
                continue
            rel_est = res.rotations[k] @ R0_est.T
            rel_gt = scene["R"][img] @ R0_gt.T
            assert rot_angle_deg(rel_est, rel_gt) < 2.0


class TestEntryPointRouting:
    def test_run_reconstruction_routes_to_global(self, monkeypatch, rng):
        """config.global_init.enabled means global through EVERY entry point
        — run_reconstruction must not silently fall back to incremental."""
        from sfm_tpu.matching.sweep import PairTable

        n, K = 3, 4
        P = 3
        table = PairTable(
            pairs=np.array([[0, 1], [0, 2], [1, 2]], np.int32),
            accept=np.ones(P, bool),
            num_matches=np.full(P, 4, np.int32),
            num_inliers=np.full(P, 4, np.int32),
            inlier_ratio=np.ones(P, np.float32),
            reprojection_error=np.zeros(P, np.float32),
            well_distributed=np.ones(P, bool),
            F=np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)),
            xy1=np.zeros((P, 4, 2), np.float32),
            xy2=np.zeros((P, 4, 2), np.float32),
            idx1=np.tile(np.arange(4, dtype=np.int32), (P, 1)),
            idx2=np.tile(np.arange(4, dtype=np.int32), (P, 1)),
            match_valid=np.ones((P, 4), bool),
            inliers=np.ones((P, 4), bool),
        )
        xy = rng.uniform(0, 100, (n, K, 2)).astype(np.float32)
        cfg = SfMConfig(global_init=GlobalInitConfig(enabled=True))
        sfm = StructureFromMotion(table, xy, cfg)
        called = {}

        class _Res:
            stats = {"global_pair_outlier_frac": 0.0}

        def fake_global(self):
            called["global"] = True
            return _Res()

        monkeypatch.setattr(StructureFromMotion, "run_global_reconstruction",
                            fake_global)
        assert isinstance(sfm.run_reconstruction(), _Res)
        assert called.get("global")

    def test_sparse_graph_precheck_routes_incremental(self, monkeypatch, rng):
        """A pair graph with fewer edges than cameras cannot be connected;
        one-shot averaging on it returns confidently-wrong poses (pixel-200
        ORB, measured: 118 edges / 200 cams -> 162 deg median GT error).
        The router must use the incremental engine instead."""
        from sfm_tpu.matching.sweep import PairTable

        n, K, P = 5, 4, 3  # 3 edges < 5 cameras
        table = PairTable(
            pairs=np.array([[0, 1], [1, 2], [2, 3]], np.int32),
            accept=np.ones(P, bool),
            num_matches=np.full(P, 4, np.int32),
            num_inliers=np.full(P, 4, np.int32),
            inlier_ratio=np.ones(P, np.float32),
            reprojection_error=np.zeros(P, np.float32),
            well_distributed=np.ones(P, bool),
            F=np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)),
            xy1=np.zeros((P, 4, 2), np.float32),
            xy2=np.zeros((P, 4, 2), np.float32),
            idx1=np.tile(np.arange(4, dtype=np.int32), (P, 1)),
            idx2=np.tile(np.arange(4, dtype=np.int32), (P, 1)),
            match_valid=np.ones((P, 4), bool),
            inliers=np.ones((P, 4), bool),
        )
        xy = rng.uniform(0, 100, (n, K, 2)).astype(np.float32)
        cfg = SfMConfig(global_init=GlobalInitConfig(enabled=True))
        sfm = StructureFromMotion(table, xy, cfg)

        def fail_global(self):
            raise AssertionError("global path must not run on a sparse graph")

        monkeypatch.setattr(StructureFromMotion, "run_global_reconstruction",
                            fail_global)
        # The incremental run on this degenerate table may register few or
        # no cameras — the contract under test is routing, not quality.
        try:
            sfm.run_reconstruction()
        except AssertionError:
            raise
        except Exception:
            pass

    def test_inconsistent_global_model_falls_back(self, monkeypatch, rng):
        """When the one-shot global model disagrees with > fallback_outlier
        _frac of its own pair measurements, the router must discard it,
        reset state, and rerun incrementally."""
        from sfm_tpu.matching.sweep import PairTable

        n, K = 3, 4
        P = 3
        table = PairTable(
            pairs=np.array([[0, 1], [0, 2], [1, 2]], np.int32),
            accept=np.ones(P, bool),
            num_matches=np.full(P, 4, np.int32),
            num_inliers=np.full(P, 4, np.int32),
            inlier_ratio=np.ones(P, np.float32),
            reprojection_error=np.zeros(P, np.float32),
            well_distributed=np.ones(P, bool),
            F=np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)),
            xy1=np.zeros((P, 4, 2), np.float32),
            xy2=np.zeros((P, 4, 2), np.float32),
            idx1=np.tile(np.arange(4, dtype=np.int32), (P, 1)),
            idx2=np.tile(np.arange(4, dtype=np.int32), (P, 1)),
            match_valid=np.ones((P, 4), bool),
            inliers=np.ones((P, 4), bool),
        )
        xy = rng.uniform(0, 100, (n, K, 2)).astype(np.float32)
        cfg = SfMConfig(global_init=GlobalInitConfig(enabled=True))
        sfm = StructureFromMotion(table, xy, cfg)
        seen = {}

        class _Bad:
            stats = {"global_pair_outlier_frac": 0.9}

        def fake_global(self):
            seen["global"] = True
            self.registered[:] = True  # garbage state the reset must clear
            self.reg_order = [0, 1, 2]
            return _Bad()

        monkeypatch.setattr(StructureFromMotion, "run_global_reconstruction",
                            fake_global)
        try:
            res = sfm.run_reconstruction()
        except Exception:
            res = None  # degenerate table: incremental may fail — fine
        assert seen.get("global")
        assert not isinstance(res, _Bad)  # the garbage model was NOT returned


class TestPairRotationResiduals:
    def test_zero_for_exact_and_large_for_corrupt(self, rng):
        from scipy.spatial.transform import Rotation
        from sfm_tpu.geometry import rotation_to_rvec
        from sfm_tpu.reconstruction.global_init import pair_rotation_residuals
        import jax.numpy as jnp

        N = 10
        R_abs = Rotation.random(N, random_state=rng).as_matrix().astype(np.float32)
        pairs = np.array([(i, j) for i in range(N) for j in range(i + 1, N)],
                         np.int32)[:20]
        R_rel = np.einsum("pab,pcb->pac", R_abs[pairs[:, 1]], R_abs[pairs[:, 0]])
        rvec = np.asarray(rotation_to_rvec(jnp.asarray(R_abs)))
        res = pair_rotation_residuals(rvec, pairs, R_rel)
        assert res.max() < 0.1
        # Corrupt half the edges by 30 degrees.
        bad = np.arange(0, 20, 2)
        spin = Rotation.from_rotvec(np.radians(30) * np.eye(3)[0]).as_matrix()
        R_rel[bad] = np.einsum("ab,pbc->pac", spin, R_rel[bad])
        res = pair_rotation_residuals(rvec, pairs, R_rel)
        assert np.all(res[bad] > 25.0) and np.all(res[np.arange(1, 20, 2)] < 0.1)
