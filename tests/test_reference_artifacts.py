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
