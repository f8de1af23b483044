"""Golden regression: reconstruct from the reference's *shipped* stage-1
artifacts (bunny_data/matching_results.csv + pair files) — the strongest
parity check available, since it consumes the exact inputs the reference's
own reconstruction consumed (SURVEY.md section 4, fixture #1)."""
import numpy as np
import pytest

from sfm_tpu.io.artifacts import load_pair_artifacts
from sfm_tpu.config import SfMConfig, BAConfig, PnPConfig
from sfm_tpu.reconstruction import StructureFromMotion


@pytest.fixture(scope="module")
def ref_artifacts(bunny_dir):
    return load_pair_artifacts(bunny_dir)


class TestLoadArtifacts:
    def test_csv_parsed(self, ref_artifacts):
        table, xy, n = ref_artifacts
        assert table.num_pairs == 148  # BASELINE.md row 3
        assert n == 36
        assert table.accept.all()
        # BASELINE.md: mean inliers 66.3, mean ratio 0.866.
        assert abs(table.num_inliers.mean() - 66.3) < 1.0
        assert abs(table.inlier_ratio.mean() - 0.866) < 0.01

    def test_keypoints_interned(self, ref_artifacts):
        table, xy, n = ref_artifacts
        # Shared keypoints across pairs must intern to the same id: a pair's
        # idx1 coords must round-trip through the xy table.
        p = 0
        i = table.pairs[p][0]
        m = table.match_valid[p]
        np.testing.assert_allclose(
            xy[i][table.idx1[p][m]], table.xy1[p][m], atol=2e-3
        )


class TestReconstructFromReferenceArtifacts:
    def test_full_reconstruction(self, ref_artifacts):
        table, xy, n = ref_artifacts
        cfg = SfMConfig(
            pnp=PnPConfig(ransac_iters=1024),
            ba=BAConfig(max_iterations=15, cg_iters=40),
        )
        sfm = StructureFromMotion(table, xy, cfg)
        res = sfm.run_reconstruction()
        s = res.stats
        # Reference shipped output: 35/36 cameras, 2555 2-view points.
        assert s["num_cameras"] >= 33
        assert s["num_points"] >= 900
        assert s["mean_reprojection_error"] < 0.6
        assert s["mean_track_length"] > 3.0  # beats the reference's 2.0


class TestGlobalFromReferenceArtifacts:
    def test_global_poses_place_connected_cameras(self, ref_artifacts):
        """Global averaging on the reference's shipped pair artifacts.

        Scope note (measured): the shipped 148-pair graph contains many
        false-consensus pairs — per-pair pose error vs the calib/ ground
        truth grows with view distance (median 4.3 deg at adjacent views,
        20-60 deg beyond), and the subgraph of cycle-consistent edges is
        DISCONNECTED (6 components at a 20-deg cycle gate). Global
        averaging therefore cannot recover accurate absolute poses from
        these artifacts (incremental SfM survives them because PnP
        validates each camera against the triangulated model instead of
        against single pairs). This test pins the machinery contract:
        every pair-connected camera is placed, poses are finite, and the
        relative-pose stage + cycle weighting run end-to-end on real
        artifact data. Accuracy is asserted on graphs that support it
        (tests/test_global_init.py; the frontend's own bunny graph
        averages to ~7 deg median and reconstructs 36/36 at 0.28 px).
        """
        from sfm_tpu.reconstruction.global_init import global_poses

        table, xy, n = ref_artifacts
        K = np.array(
            [[1228.0, 0, 512], [0, 1228.0, 384], [0, 0, 1]], np.float32
        )
        rvec, tvec, placed = global_poses(table, K, n)
        assert placed.sum() >= 35  # image 0 has no pair in the shipped CSV
        assert np.isfinite(rvec).all() and np.isfinite(tvec).all()
