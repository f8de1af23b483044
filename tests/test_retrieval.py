"""Retrieval-based candidate-pair preselection (matching/retrieval.py).

The contract under test: on a scene with local visibility, retrieval keeps
every pair the full exhaustive sweep would accept (recall 1.0) while
discarding a large fraction of the candidates, and the sweep restricted to
the kept candidates reproduces the exhaustive sweep's accepted-pair set.
"""
import numpy as np
import pytest

from sfm_tpu.config import SfMConfig, RetrievalConfig, VerifyConfig, MatchConfig
from sfm_tpu.matching import all_pairs_sweep
from sfm_tpu.matching.retrieval import (
    retrieval_enabled,
    retrieval_scores,
    select_candidate_pairs,
    select_pairs_from_scores,
)
from sfm_tpu.matching.sweep import candidate_pairs


def corridor_features(rng, n_cams=30, n_pts=900, K=160, D=64, window=5.0,
                      noise=0.03):
    """Tiny corridor scene: camera c sees only points within ``window`` of
    its station, so true overlap is local — the regime retrieval targets."""
    L = n_cams * 1.0
    px = np.sort(rng.uniform(0, L, n_pts))
    pyz = rng.uniform(-1, 1, (n_pts, 2))
    desc_gt = rng.normal(size=(n_pts, D))
    desc_gt /= np.linalg.norm(desc_gt, axis=1, keepdims=True)

    xy = np.zeros((n_cams, K, 2), np.float32)
    desc = np.zeros((n_cams, K, D), np.float32)
    valid = np.zeros((n_cams, K), bool)
    for c in range(n_cams):
        x0 = c * (L / n_cams)
        vis = np.nonzero(np.abs(px - x0) < window)[0]
        rng.shuffle(vis)
        vis = vis[:K]
        k = len(vis)
        # Projection proxy: perspective-ish mapping of (dx, y, z) to pixels.
        dx = px[vis] - x0
        depth = 4.0 + pyz[vis, 1]
        xy[c, :k, 0] = 512 + 200 * dx / depth + rng.normal(scale=0.3, size=k)
        xy[c, :k, 1] = 384 + 200 * pyz[vis, 0] / depth + rng.normal(scale=0.3, size=k)
        d = desc_gt[vis] + noise * rng.normal(size=(k, D))
        desc[c, :k] = d / np.linalg.norm(d, axis=1, keepdims=True)
        valid[c, :k] = True
    return xy, desc, valid


@pytest.fixture(scope="module")
def corridor():
    rng = np.random.default_rng(7)
    return corridor_features(rng)


@pytest.fixture(scope="module")
def sweep_cfg():
    return SfMConfig(
        matching=MatchConfig(max_matches=256),
        verify=VerifyConfig(ransac_iters=128),
    )


class TestScores:
    def test_overlapping_pairs_outscore_disjoint(self, corridor):
        xy, desc, valid = corridor
        pairs = np.array([[0, 1], [0, 29]], np.int32)  # adjacent vs far
        s = retrieval_scores(desc, valid, pairs, RetrievalConfig(subsample=64))
        assert s[0] > 20
        assert s[1] < 5

    def test_subsample_knob_consumed(self, corridor):
        xy, desc, valid = corridor
        pairs = np.array([[0, 1]], np.int32)
        s_small = retrieval_scores(desc, valid, pairs, RetrievalConfig(subsample=32))
        s_big = retrieval_scores(desc, valid, pairs, RetrievalConfig(subsample=128))
        assert s_big[0] > s_small[0]

    def test_ratio_threshold_knob_consumed(self):
        # Handcrafted case where best/second-best distance ratio is ~0.8:
        # image B carries a near-duplicate of A's descriptor, so the match
        # passes Lowe at 0.95 but fails at 0.5. (The corridor scene's
        # descriptors are too clean to discriminate — every true match
        # saturates both thresholds.)
        def unit(v):
            v = np.asarray(v, np.float32)
            return v / np.linalg.norm(v)

        a = unit([1.0, 0.0, 0.0, 0.0])
        b1 = unit([1.0, 0.35, 0.0, 0.0])   # best: dist^2 ~ 0.115
        b2 = unit([1.0, -0.40, 0.0, 0.0])  # second: dist^2 ~ 0.148
        desc = np.zeros((2, 2, 4), np.float32)
        valid = np.zeros((2, 2), bool)
        desc[0, 0] = a
        valid[0, 0] = True
        desc[1, 0] = b1
        desc[1, 1] = b2
        valid[1] = True
        pairs = np.array([[0, 1]], np.int32)
        strict = retrieval_scores(desc, valid, pairs,
                                  RetrievalConfig(ratio_threshold=0.5))
        loose = retrieval_scores(desc, valid, pairs,
                                 RetrievalConfig(ratio_threshold=0.95))
        assert strict[0] == 0
        assert loose[0] == 1

    def test_chunking_invariant(self, corridor):
        xy, desc, valid = corridor
        pairs = candidate_pairs(10)
        a = retrieval_scores(desc, valid, pairs, RetrievalConfig(chunk_size=7))
        b = retrieval_scores(desc, valid, pairs, RetrievalConfig(chunk_size=64))
        np.testing.assert_array_equal(a, b)


class TestSelection:
    def test_top_k_floor_guarantees_incident_pairs(self):
        # Even with an unreachable min_score, every image keeps its top-k.
        n = 12
        pairs = candidate_pairs(n)
        rng = np.random.default_rng(0)
        scores = rng.integers(0, 50, len(pairs))
        keep = select_pairs_from_scores(scores, pairs, n, min_score=10**9, top_k=3)
        deg = np.zeros(n, int)
        for i, j in pairs[keep]:
            deg[i] += 1
            deg[j] += 1
        assert (deg >= 3).all()

    def test_top_k_picks_highest_scoring(self):
        n = 5
        pairs = candidate_pairs(n)  # 10 pairs
        scores = np.arange(len(pairs))
        keep = select_pairs_from_scores(scores, pairs, n, min_score=10**9, top_k=1)
        # Image 4's best pair is (3,4) (score 9, the global max) — must be kept.
        kept = {tuple(p) for p in pairs[keep]}
        assert (3, 4) in kept

    def test_min_score_monotone(self, corridor):
        xy, desc, valid = corridor
        n = xy.shape[0]
        _, lo = select_candidate_pairs(desc, valid, n, RetrievalConfig(min_score=4, top_k=0))
        _, hi = select_candidate_pairs(desc, valid, n, RetrievalConfig(min_score=30, top_k=0))
        assert hi["kept"] < lo["kept"]

    def test_sequential_mode(self):
        from sfm_tpu.matching.retrieval import sequential_pairs

        pairs = sequential_pairs(6, 2)
        expect = {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4),
                  (3, 4), (3, 5), (4, 5)}
        assert {tuple(p) for p in pairs} == expect
        kept, st = select_candidate_pairs(
            None, None, 6, RetrievalConfig(mode="sequential", sequential_window=2))
        assert {tuple(p) for p in kept} == expect
        assert st["kept"] == 9

    def test_mode_logic(self):
        assert retrieval_enabled(RetrievalConfig(mode="on"), 2)
        assert not retrieval_enabled(RetrievalConfig(mode="off"), 10**6)
        assert retrieval_enabled(RetrievalConfig(mode="auto", auto_min_images=100), 100)
        assert not retrieval_enabled(RetrievalConfig(mode="auto", auto_min_images=100), 99)


class TestEndToEnd:
    def test_full_recall_at_large_cut(self, corridor, sweep_cfg):
        """Retrieval must keep every exhaustively-accepted pair while
        cutting most of the candidate list, and the restricted sweep must
        accept exactly the same pair set."""
        xy, desc, valid = corridor
        n = xy.shape[0]
        full = all_pairs_sweep(xy, desc, valid, sweep_cfg)
        accepted_full = {tuple(full.pairs[p]) for p in full.accepted()}
        assert len(accepted_full) > 30  # scene sanity: local overlap exists

        kept, stats = select_candidate_pairs(desc, valid, n, RetrievalConfig())
        kept_set = {tuple(p) for p in kept}
        missed = accepted_full - kept_set
        assert not missed, f"retrieval dropped verified pairs: {sorted(missed)[:5]}"
        assert stats["keep_frac"] < 0.6  # corridor-30 is small; at 1000 it's ~5%

        sub = all_pairs_sweep(xy, desc, valid, sweep_cfg, pairs=kept)
        accepted_sub = {tuple(sub.pairs[p]) for p in sub.accepted()}
        assert accepted_sub == accepted_full

    def test_config_roundtrip_carries_retrieval(self):
        cfg = SfMConfig(retrieval=RetrievalConfig(mode="on", subsample=128))
        back = SfMConfig.from_json(cfg.to_json())
        assert back.retrieval == cfg.retrieval


class TestAdaptiveThreshold:
    """Per-image calibrated selection (select_pairs_adaptive): can only
    RELAX the fixed min_score, so the fixed rule's keep set is always a
    subset; under wholesale score depression (realistic descriptor noise)
    it recovers the true neighbors the fixed bar drops."""

    def test_superset_of_fixed_rule(self, corridor):
        from sfm_tpu.matching.retrieval import select_pairs_adaptive

        _, desc, valid = corridor
        n = desc.shape[0]
        pairs = candidate_pairs(n)
        cfg = RetrievalConfig()
        scores = retrieval_scores(desc, valid, pairs, cfg)
        fixed = select_pairs_from_scores(scores, pairs, n, cfg.min_score, cfg.top_k)
        adaptive, thr = select_pairs_adaptive(scores, pairs, n, cfg)
        assert (adaptive | fixed == adaptive).all()
        assert cfg.min_score_floor <= thr <= cfg.min_score

    def test_recovers_depressed_scores(self):
        """Simulate the noisy regime directly in score space: true neighbor
        pairs score 4-6 (below the fixed min_score=8), junk scores 0-1.
        The fixed rule keeps only the top_k floor; adaptive keeps ALL true
        neighbors because each image's bar calibrates to ~0.5 * s_k."""
        from sfm_tpu.matching.retrieval import select_pairs_adaptive

        rng = np.random.default_rng(0)
        n = 40
        pairs = candidate_pairs(n)
        d = np.abs(pairs[:, 0] - pairs[:, 1])
        true = d <= 6
        scores = np.where(true, rng.integers(4, 7, len(pairs)),
                          rng.integers(0, 2, len(pairs))).astype(np.int32)
        cfg = RetrievalConfig(top_k=3)  # floor alone cannot cover 6 neighbors
        fixed = select_pairs_from_scores(scores, pairs, n, cfg.min_score, cfg.top_k)
        adaptive, thr = select_pairs_adaptive(scores, pairs, n, cfg)
        fixed_recall = fixed[true].mean()
        adaptive_recall = adaptive[true].mean()
        assert fixed_recall < 0.8          # the failure mode being fixed
        assert adaptive_recall == 1.0, adaptive_recall
        # ... without devolving into keep-everything:
        assert adaptive[~true].mean() < 0.1

    def test_clean_scene_keeps_selectivity(self, corridor):
        """On the idealized scene the adaptive rule must not blow up the
        kept fraction (bars clamp at min_score; junk sits below the floor)."""
        _, desc, valid = corridor
        n = desc.shape[0]
        kept_f, stats_f = select_candidate_pairs(
            desc, valid, n, RetrievalConfig(adaptive=False))
        kept_a, stats_a = select_candidate_pairs(
            desc, valid, n, RetrievalConfig(adaptive=True))
        assert stats_a["kept"] >= stats_f["kept"]
        assert stats_a["keep_frac"] <= 1.6 * max(stats_f["keep_frac"], 0.01)
