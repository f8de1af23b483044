"""Utility-layer tests: chunked transfers, observability, linalg, rescue."""
import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.utils.transfer import device_get_chunked
from sfm_tpu.utils.linalg import smallest_eigvec
from sfm_tpu.utils.observability import Metrics, stage


class TestTransfer:
    def test_chunked_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(1000, 700)).astype(np.float32))  # 2.8 MB
        got = device_get_chunked(x, chunk_bytes=1 << 18)
        np.testing.assert_array_equal(got, np.asarray(x))

    def test_pytree_and_small_leaves(self, rng):
        tree = {
            "big": jnp.asarray(rng.normal(size=(512, 600)).astype(np.float32)),
            "small": jnp.arange(5),
            "scalar": jnp.float32(3.0),
        }
        got = device_get_chunked(tree, chunk_bytes=1 << 16)
        np.testing.assert_array_equal(got["big"], np.asarray(tree["big"]))
        np.testing.assert_array_equal(got["small"], [0, 1, 2, 3, 4])
        assert got["scalar"] == 3.0


class TestLinalg:
    def test_smallest_eigvec_batch(self, rng):
        A = rng.normal(size=(64, 12, 12)).astype(np.float32)
        AtA = np.einsum("bij,bkj->bik", A, A)  # PSD
        v = np.asarray(smallest_eigvec(jnp.asarray(AtA)))
        for b in range(0, 64, 7):
            w, V = np.linalg.eigh(AtA[b].astype(np.float64))
            assert abs(abs(v[b] @ V[:, 0]) - 1.0) < 1e-3

    def test_singular_matrix(self):
        # Exactly singular: null vector must be found, no NaNs.
        u = np.array([1.0, -2.0, 0.5, 3.0], np.float32)
        B = np.eye(4, dtype=np.float32) - np.outer(u, u) / (u @ u)
        A = B.T @ B  # null space = span(u)
        v = np.asarray(smallest_eigvec(jnp.asarray(A)))
        assert np.isfinite(v).all()
        assert abs(abs(v @ u) / np.linalg.norm(u) - 1.0) < 1e-3


class TestObservability:
    def test_metrics_and_stage(self):
        m = Metrics()
        with stage("unit-test-stage", metrics=m):
            pass
        m.log("custom", 42, unit="things")
        totals = m.totals()
        assert "stage/unit-test-stage" in totals
        assert totals["custom"] == 42

    def test_metrics_save(self, tmp_path):
        m = Metrics()
        m.log("a", 1.5)
        m.save(tmp_path / "m.json")
        import json

        rec = json.loads((tmp_path / "m.json").read_text())
        assert rec[0]["name"] == "a"


class TestRescue:
    def test_rescue_readmits_best_pair(self):
        from sfm_tpu.matching.sweep import PairTable, rescue_disconnected

        P, M = 3, 8
        pairs = np.array([[0, 1], [1, 2], [0, 2]], np.int32)
        accept = np.array([False, True, False])
        num_inliers = np.array([10, 50, 9], np.int32)
        table = PairTable(
            pairs=pairs, accept=accept,
            num_matches=np.array([20, 60, 20], np.int32),
            num_inliers=num_inliers,
            inlier_ratio=np.array([0.5, 0.8, 0.45], np.float32),
            reprojection_error=np.zeros(P, np.float32),
            well_distributed=np.ones(P, bool),
            F=np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)),
            xy1=np.zeros((P, M, 2), np.float32),
            xy2=np.zeros((P, M, 2), np.float32),
            idx1=np.zeros((P, M), np.int32),
            idx2=np.zeros((P, M), np.int32),
            match_valid=np.ones((P, M), bool),
            inliers=np.ones((P, M), bool),
        )
        # Image 0 has no accepted pair -> its best sub-gate pair (0,1; 10 inl)
        # must be re-admitted. accept is a READ-ONLY array here (as when the
        # table holds np.asarray views of device buffers — regression: the
        # in-place rescue crashed with 'assignment destination is read-only'
        # on the first real scene that needed it).
        table.accept.flags.writeable = False
        n = rescue_disconnected(table, 3)
        assert n == 1
        assert table.accept[0]
        assert not table.accept[2]

    def test_rescue_noop_when_connected(self):
        from sfm_tpu.matching.sweep import PairTable, rescue_disconnected

        pairs = np.array([[0, 1]], np.int32)
        table = PairTable(
            pairs=pairs, accept=np.array([True]),
            num_matches=np.array([60], np.int32),
            num_inliers=np.array([50], np.int32),
            inlier_ratio=np.array([0.8], np.float32),
            reprojection_error=np.zeros(1, np.float32),
            well_distributed=np.ones(1, bool),
            F=np.tile(np.eye(3, dtype=np.float32), (1, 1, 1)),
            xy1=np.zeros((1, 4, 2), np.float32),
            xy2=np.zeros((1, 4, 2), np.float32),
            idx1=np.zeros((1, 4), np.int32),
            idx2=np.zeros((1, 4), np.int32),
            match_valid=np.ones((1, 4), bool),
            inliers=np.ones((1, 4), bool),
        )
        assert rescue_disconnected(table, 2) == 0
