"""Matching core + verification tests on synthetic descriptors/geometry."""
import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.matching import match_descriptors, verify_pair, all_pairs_sweep
from sfm_tpu.config import SfMConfig, MatchConfig, VerifyConfig


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def make_descriptors(rng, n_common=80, n_only=40, d=128, noise=0.05):
    """Two descriptor sets sharing n_common noisy-duplicated vectors."""
    common = unit(rng.normal(size=(n_common, d))).astype(np.float32)
    a_only = unit(rng.normal(size=(n_only, d))).astype(np.float32)
    b_only = unit(rng.normal(size=(n_only, d))).astype(np.float32)
    d1 = np.concatenate([common, a_only])
    d2 = np.concatenate([unit(common + noise * rng.normal(size=common.shape)).astype(np.float32), b_only])
    # Shuffle set 2 and remember the permutation.
    perm = rng.permutation(len(d2))
    return d1, d2[perm].astype(np.float32), perm


class TestMatchDescriptors:
    def test_recovers_correspondences(self, rng):
        d1, d2, perm = make_descriptors(rng)
        inv = np.argsort(perm)
        v1 = np.ones(len(d1), bool)
        v2 = np.ones(len(d2), bool)
        m = match_descriptors(d1, v1, d2, v2, max_matches=256)
        mv = np.asarray(m["valid"])
        i1 = np.asarray(m["idx1"])[mv]
        i2 = np.asarray(m["idx2"])[mv]
        # All matched pairs must be true correspondences (common[i] -> perm pos).
        correct = sum(1 for a, b in zip(i1, i2) if a < 80 and inv[a] == b)
        assert mv.sum() >= 80 * 0.85
        assert correct / mv.sum() > 0.95

    def test_invalid_rows_never_match(self, rng):
        d1, d2, _ = make_descriptors(rng)
        v1 = np.ones(len(d1), bool)
        v1[:50] = False
        v2 = np.ones(len(d2), bool)
        v2[60:] = False
        m = match_descriptors(d1, v1, d2, v2, max_matches=256)
        mv = np.asarray(m["valid"])
        assert not np.isin(np.asarray(m["idx1"])[mv], np.arange(50)).any()
        assert (np.asarray(m["idx2"])[mv] < 60).all()

    def test_ratio_test_rejects_ambiguous(self, rng):
        # Duplicate every set-2 descriptor: second NN is as close as the first,
        # and the query is noisy so neither duplicate is an exact hit.
        base = unit(rng.normal(size=(40, 128))).astype(np.float32)
        query = unit(base + 0.05 * rng.normal(size=base.shape)).astype(np.float32)
        d2 = np.concatenate([base, unit(base + 1e-3 * rng.normal(size=base.shape))])
        m = match_descriptors(
            query, np.ones(40, bool), d2.astype(np.float32), np.ones(80, bool),
            max_matches=64,
        )
        assert np.asarray(m["valid"]).sum() == 0


class TestVerifyPair:
    def _synth(self, rng, n=150, outlier_frac=0.2):
        from tests.test_estimators import synth_two_view

        return synth_two_view(rng, n=n, noise=0.3, outlier_frac=outlier_frac)

    def test_accepts_good_pair(self, rng):
        _, p1, p2, *_ = self._synth(rng)
        valid = np.ones(len(p1), bool)
        out = verify_pair(jax.random.key(0), p1, p2, valid, ransac_iters=1024)
        assert bool(out["accept"])
        assert float(out["reprojection_error"]) < 1.0
        assert bool(out["well_distributed"])

    def test_rejects_random_noise(self, rng):
        p1 = rng.uniform(0, 1024, size=(100, 2)).astype(np.float32)
        p2 = rng.uniform(0, 1024, size=(100, 2)).astype(np.float32)
        valid = np.ones(100, bool)
        out = verify_pair(jax.random.key(1), p1, p2, valid, ransac_iters=512)
        assert not bool(out["accept"])

    def test_rejects_concentrated_points(self, rng):
        # Geometrically perfect but spatially degenerate (spread < 20 px).
        from tests.test_estimators import synth_two_view

        pts3d, p1, p2, *_ = synth_two_view(rng, n=120)
        p1c = p1 * 0.01 + 500.0  # squash spread
        p2c = p2 * 0.01 + 300.0
        valid = np.ones(120, bool)
        out = verify_pair(jax.random.key(2), p1c.astype(np.float32), p2c.astype(np.float32), valid, ransac_iters=256)
        assert not bool(out["well_distributed"])
        assert not bool(out["accept"])


class TestAllPairsSweep:
    def test_sweep_finds_connected_pairs(self, rng):
        """4 images with descriptors: (0,1) and (2,3) share content."""
        from tests.test_estimators import synth_two_view

        K, D = 128, 32
        _, p1, p2, *_ = synth_two_view(rng, n=K, noise=0.2)
        common = unit(rng.normal(size=(K, D))).astype(np.float32)
        rand2 = unit(rng.normal(size=(K, D))).astype(np.float32)
        xy = np.zeros((4, K, 2), np.float32)
        desc = np.zeros((4, K, D), np.float32)
        xy[0], xy[1] = p1, p2
        desc[0] = common
        desc[1] = unit(common + 0.03 * rng.normal(size=common.shape))
        xy[2], xy[3] = p1, p2
        desc[2] = rand2
        desc[3] = unit(rand2 + 0.03 * rng.normal(size=rand2.shape))
        valid = np.ones((4, K), bool)

        cfg = SfMConfig(
            matching=MatchConfig(max_matches=128),
            verify=VerifyConfig(ransac_iters=512),
        )
        table = all_pairs_sweep(xy, desc, valid, cfg, chunk_size=4)
        assert table.num_pairs == 6
        acc = {tuple(table.pairs[p]) for p in table.accepted()}
        assert (0, 1) in acc
        assert (2, 3) in acc
        assert (0, 2) not in acc and (1, 3) not in acc
        recs = table.to_records()
        assert all(r["num_inliers"] >= 15 for r in recs)
