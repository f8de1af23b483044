"""View-selection graph tests (C9/C10 parity + bug fixes)."""
import numpy as np
import pytest

from sfm_tpu.graph import SfMGraphSelector


def line_graph_records(n=6, inliers=50):
    """0-1-2-...-(n-1) chain."""
    return [
        {
            "image1": i,
            "image2": i + 1,
            "num_matches": inliers + 10,
            "num_inliers": inliers,
            "inlier_ratio": 0.8,
            "reprojection_error": 0.5,
        }
        for i in range(n - 1)
    ]


class TestCentrality:
    def test_degree(self):
        g = SfMGraphSelector(line_graph_records(5))
        deg = g.degree_centrality()
        np.testing.assert_allclose(deg, np.array([1, 2, 2, 2, 1]) / 4.0)

    def test_betweenness_matches_networkx(self):
        nx = pytest.importorskip("networkx")
        rng = np.random.default_rng(3)
        recs = []
        G = nx.Graph()
        for _ in range(25):
            i, j = rng.integers(0, 12, 2)
            if i == j:
                continue
            recs.append(
                {"image1": int(i), "image2": int(j), "num_matches": 30,
                 "num_inliers": 20, "inlier_ratio": 0.7, "reprojection_error": 1.0}
            )
            G.add_edge(int(i), int(j))
        g = SfMGraphSelector(recs)
        ours = g.betweenness_centrality()
        ref = nx.betweenness_centrality(G)
        for k, node in enumerate(g.nodes):
            assert abs(ours[k] - ref[node]) < 1e-9

    def test_vectorized_betweenness_matches_networkx(self):
        """The all-sources matrix form (used above 200 nodes) must agree
        with networkx to machine precision."""
        nx = pytest.importorskip("networkx")
        rng = np.random.default_rng(7)
        recs, G = [], nx.Graph()
        for _ in range(160):
            i, j = rng.integers(0, 40, 2)
            if i == j:
                continue
            recs.append(
                {"image1": int(i), "image2": int(j), "num_matches": 30,
                 "num_inliers": 20, "inlier_ratio": 0.7, "reprojection_error": 1.0}
            )
            G.add_edge(int(i), int(j))
        g = SfMGraphSelector(recs)
        vec = g._betweenness_vectorized()
        loop = g.betweenness_centrality()  # n<200 -> Brandes loop
        ref = nx.betweenness_centrality(G)
        for k, node in enumerate(g.nodes):
            assert abs(vec[k] - ref[node]) < 1e-12
            assert abs(loop[k] - vec[k]) < 1e-12

    def test_importance_highest_in_middle(self):
        g = SfMGraphSelector(line_graph_records(7))
        imp = g.compute_node_importance()
        center = imp[3]
        assert center == max(imp.values())


class TestNextBestView:
    def test_only_connected_candidates(self):
        g = SfMGraphSelector(line_graph_records(6))
        ranked = g.find_next_best_images([0, 1])
        ids = [r[0] for r in ranked]
        assert 2 in ids
        assert 4 not in ids and 5 not in ids  # not adjacent to {0,1}

    def test_visibility_varies_with_candidate(self):
        """The reference's visibility term was constant (bug); ours must
        prefer a candidate whose connectivity is mostly into the build."""
        recs = line_graph_records(4)
        # Node 9: strongly connected to constructed 0 AND to outside 8.
        recs += [
            {"image1": 0, "image2": 9, "num_matches": 60, "num_inliers": 50,
             "inlier_ratio": 0.8, "reprojection_error": 0.5},
            {"image1": 8, "image2": 9, "num_matches": 60, "num_inliers": 50,
             "inlier_ratio": 0.8, "reprojection_error": 0.5},
            # Node 7: same single strong link to constructed 0, nothing else.
            {"image1": 0, "image2": 7, "num_matches": 60, "num_inliers": 50,
             "inlier_ratio": 0.8, "reprojection_error": 0.5},
        ]
        g = SfMGraphSelector(recs)
        c7 = g.score_components(7, [0])
        c9 = g.score_components(9, [0])
        # 7's connectivity is entirely into the build; half of 9's looks away.
        assert c7["visibility"] == 1.0
        assert c9["visibility"] == 0.5
        # Unlinked candidate has no score at all.
        assert g.score_components(8, [0]) is None

    def test_seed_pair_is_strongest_edge(self):
        recs = line_graph_records(5, inliers=40)
        recs[2]["num_inliers"] = 99
        g = SfMGraphSelector(recs)
        assert g.find_best_seed_pair() == (2, 3)


class TestCsvParsing:
    def test_from_csv_reference_format(self, tmp_path):
        csv = tmp_path / "matching_results.csv"
        csv.write_text(
            "image1,image2,num_matches,num_inliers,inlier_ratio,reprojection_error,well_distributed\n"
            "0001.ppm,0003.ppm,80,70,0.875,0.4,True\n"
            "0003.ppm,0005.ppm,60,50,0.833,0.6,True\n"
        )
        g = SfMGraphSelector.from_csv(csv)
        assert g.nodes == [1, 3, 5]
        assert g.edge(1, 3)["num_inliers"] == 70


class TestVectorizedNBV:
    def test_matches_score_components(self):
        """find_next_best_images (vectorized) must rank exactly as the
        per-candidate score_components breakdown."""
        rng = np.random.default_rng(9)
        recs = []
        for _ in range(120):
            i, j = rng.integers(0, 30, 2)
            if i == j:
                continue
            recs.append(
                {"image1": int(i), "image2": int(j),
                 "num_matches": int(rng.integers(20, 90)),
                 "num_inliers": int(rng.integers(10, 80)),
                 "inlier_ratio": float(rng.uniform(0.3, 0.95)),
                 "reprojection_error": float(rng.uniform(0.2, 1.5))}
            )
        g = SfMGraphSelector(recs)
        constructed = [int(n) for n in g.nodes[:7]]
        ranked = g.find_next_best_images(constructed, top_k=100)
        assert ranked, "no candidates found"
        for node, score in ranked:
            comps = g.score_components(node, constructed)
            assert comps is not None
            assert abs(score - comps["score"]) < 1e-6
        # Candidates not linked to the build never appear.
        linked = {n for n, _ in ranked}
        for node in g.nodes:
            if node in constructed or node in linked:
                continue
            assert g.score_components(node, constructed) is None
