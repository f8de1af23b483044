"""FAST+ORB-class binary frontend (features/binary.py).

Oracle strategy mirrors the SIFT-path tests: a brute-force numpy FAST
implementation pins the vectorized arc test; geometric transforms with exact
pixel mappings (90-degree rotation) pin descriptor steering; the ratio
mapping for the shared matcher is pinned against hand-computed Hamming
distances.
"""
import dataclasses

import numpy as np
import pytest

from sfm_tpu.config import (
    FeatureConfig, MatchConfig, SfMConfig, effective_match_config,
)
from sfm_tpu.features import binary
from sfm_tpu.features import detect_and_describe


def _rng(seed=0):
    return np.random.default_rng(seed)


def _fast_oracle(img, t):
    """Brute-force FAST-9/16: for each interior pixel, check 9 contiguous
    ring samples all > c+t or all < c-t (circular)."""
    h, w = img.shape
    out = np.zeros((h, w), bool)
    ring = binary._RING
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            vals = np.array([img[y + dy, x + dx] for dy, dx in ring])
            for m in (vals > c + t, vals < c - t):
                mm = np.concatenate([m, m])
                run, best = 0, 0
                for b in mm:
                    run = run + 1 if b else 0
                    best = max(best, run)
                if best >= 9:
                    out[y, x] = True
    return out


class TestFast:
    def test_score_is_qualifying_polaritys_sum(self):
        """The NMS/top-k ranking score must come from the polarity whose arc
        test PASSED — a dark-arc corner with strongly bright non-arc samples
        must not be ranked by the bright sum (review finding)."""
        import jax.numpy as jnp

        img = _rng(5).random((40, 48)).astype(np.float32)
        t = 0.12
        score = np.asarray(binary.fast_scores(jnp.asarray(img), t))
        ring = binary._RING
        for y, x in np.argwhere(score > 0)[:50]:
            if not (3 <= y < 37 and 3 <= x < 45):
                continue
            c = img[y, x]
            vals = np.array([img[y + dy, x + dx] for dy, dx in ring])
            want = 0.0
            for m, s in ((vals > c + t, (vals - c - t)),
                         (vals < c - t, (c - vals - t))):
                mm = np.concatenate([m, m])
                run = best = 0
                for b in mm[:24]:
                    run = run + 1 if b else 0
                    best = max(best, run)
                if best >= 9:
                    want = max(want, s[m].sum())
            np.testing.assert_allclose(score[y, x], want, rtol=1e-5)

    def test_arc_test_matches_bruteforce(self):
        import jax.numpy as jnp

        img = _rng(3).random((40, 48)).astype(np.float32)
        t = 0.12
        score = np.asarray(binary.fast_scores(jnp.asarray(img), t))
        got = score > 0
        want = _fast_oracle(img, t)
        # fast_scores wraps at borders (rolls); compare interior only.
        sl = (slice(3, -3), slice(3, -3))
        np.testing.assert_array_equal(got[sl], want[sl])

    def test_square_corners_detected(self):
        img = np.zeros((120, 160), np.float32)
        img[40:80, 50:110] = 1.0
        f = detect_and_describe(img, config=FeatureConfig(kind="orb", orb_levels=1))
        v = np.asarray(f.valid)
        assert v.sum() == 4
        got = {tuple(p) for p in np.asarray(f.xy)[v].astype(int).tolist()}
        assert got == {(50, 40), (109, 40), (50, 79), (109, 79)}

    def test_flat_image_yields_nothing(self):
        img = np.full((100, 100), 0.3, np.float32)
        f = detect_and_describe(img, config=FeatureConfig(kind="orb"))
        assert np.asarray(f.valid).sum() == 0

    def test_mask_gates_keypoints(self):
        img = np.zeros((120, 160), np.float32)
        img[40:80, 50:110] = 1.0
        mask = np.zeros((120, 160), bool)
        mask[:, :80] = True  # keep only the two left corners
        f = detect_and_describe(img, mask=mask, config=FeatureConfig(kind="orb", orb_levels=1))
        v = np.asarray(f.valid)
        assert v.sum() == 2
        assert (np.asarray(f.xy)[v][:, 0] < 80).all()


def _texture(h=200, w=240, seed=7):
    """Blurred noise: dense FAST corners with meaningful BRIEF structure."""
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(_rng(seed).random((h, w)), 1.5)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


class TestDescriptor:
    def test_unit_norm_and_width(self):
        f = detect_and_describe(_texture(), config=FeatureConfig(kind="orb"))
        v = np.asarray(f.valid)
        d = np.asarray(f.desc)[v].astype(np.float64)
        assert d.shape[1] == binary.N_BITS
        np.testing.assert_allclose((d ** 2).sum(1), 1.0, atol=1e-6)
        assert set(np.unique(np.abs(d))) == {1.0 / 16.0}

    def test_rotation_steering(self):
        """Descriptors survive a 90-degree image rotation.

        (x, y) -> (y, W-1-x) maps pixels exactly, so FAST corners correspond
        1:1 and only the steering has to compensate. 90 deg falls BETWEEN
        12-degree steering bins (7.5 bins), so a few bits flip from the
        <=6-degree quantization — corresponding Hamming must still sit far
        below the 128-bit chance floor for unrelated descriptors.
        """
        img = _texture()
        h, w = img.shape
        img2 = np.rot90(img)  # img2[y', x'] with x'=y, y'=w-1-x
        cfg = FeatureConfig(kind="orb", orb_levels=1)
        f1 = detect_and_describe(img, config=cfg)
        f2 = detect_and_describe(img2, config=cfg)
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        xy1 = np.asarray(f1.xy)[v1]
        xy2 = np.asarray(f2.xy)[v2]
        d1 = np.asarray(f1.desc)[v1].astype(np.float64)
        d2 = np.asarray(f2.desc)[v2].astype(np.float64)
        mapped = np.stack([xy1[:, 1], w - 1 - xy1[:, 0]], 1)  # into img2 coords
        # Greedy nearest-coordinate correspondence (exact map -> dist 0).
        dist = np.abs(mapped[:, None, :] - xy2[None, :, :]).sum(-1)
        j = dist.argmin(1)
        ok = dist[np.arange(len(mapped)), j] < 0.5
        assert ok.sum() >= 30
        sim = (d1[ok] * d2[j[ok]]).sum(1)
        hamm = (1.0 - sim) * (binary.N_BITS / 2.0)
        rand = (1.0 - (d1[ok] * np.roll(d2[j[ok]], 7, axis=0)).sum(1)) * 128.0
        assert np.median(hamm) < 60, np.median(hamm)
        assert np.median(rand) > 100  # unrelated pairs sit at the chance floor
        assert np.median(hamm) < 0.5 * np.median(rand)

    def test_numpy_oracle_recomputes_descriptor(self):
        """Recompute every step (moments, bin, steered sampling, compares)
        in plain numpy from the same blurred image and demand bit-identical
        descriptors — pins the whole sampling path. The BRIEF comparisons run
        in bf16 on device (sign-exact given bf16-rounded operands —
        binary.py), so the oracle rounds the blurred patch through bfloat16
        before comparing."""
        import jax.numpy as jnp
        import ml_dtypes

        from sfm_tpu.features.pyramid import gaussian_blur_mm

        img = _texture(160, 180, seed=9)
        cfg = FeatureConfig(kind="orb", orb_levels=1)
        f = detect_and_describe(img, config=cfg)
        v = np.asarray(f.valid)
        xy = np.asarray(f.xy)[v].astype(int)
        desc = np.asarray(f.desc)[v]
        blur = np.asarray(gaussian_blur_mm(jnp.asarray(img), 2.0))
        blur = blur.astype(ml_dtypes.bfloat16).astype(np.float32)
        H = binary.HALF
        P = binary.PATCH
        for k in range(min(20, len(xy))):
            x, y = xy[k]
            bp64 = blur[y - H:y + H + 1, x - H:x + H + 1].astype(np.float64)
            m10 = (bp64.ravel() * binary._IC_WX).sum()
            m01 = (bp64.ravel() * binary._IC_WY).sum()
            ang = np.arctan2(m01, m10)
            b = int(np.round(ang * binary.N_ANGLE_BINS / (2 * np.pi))) % binary.N_ANGLE_BINS
            bp = blur[y - H:y + H + 1, x - H:x + H + 1].ravel()
            bits = bp[binary._STEER1[b]] < bp[binary._STEER2[b]]
            want = (bits.astype(np.float32) * 2 - 1) / 16.0
            np.testing.assert_allclose(desc[k], want.astype(np.float16))


class TestMatcherContract:
    def test_effective_ratio_maps_hamming_to_squared_l2(self):
        cfg = SfMConfig(features=FeatureConfig(kind="orb"),
                        matching=MatchConfig(ratio_threshold=0.75))
        mc = effective_match_config(cfg)
        assert mc.ratio_threshold == pytest.approx(0.75 ** 0.5)
        # sift passes through untouched
        assert effective_match_config(SfMConfig()).ratio_threshold == 0.75

    def test_effective_retrieval_ratio_maps_too(self):
        from sfm_tpu.config import effective_retrieval_config

        cfg = SfMConfig(features=FeatureConfig(kind="orb"))
        assert effective_retrieval_config(cfg).ratio_threshold == pytest.approx(
            cfg.retrieval.ratio_threshold ** 0.5
        )
        assert (effective_retrieval_config(SfMConfig()).ratio_threshold
                == SfMConfig().retrieval.ratio_threshold)

    def test_kind_is_validated_at_construction(self):
        """from_dict / direct construction must reject unknown kinds instead
        of silently running the SIFT path (review finding)."""
        with pytest.raises(ValueError, match="kind"):
            FeatureConfig(kind="ORB")
        with pytest.raises(ValueError, match="kind"):
            SfMConfig.from_dict({"features": {"kind": "brisk"}})

    def test_guided_ratio_maps_for_orb(self):
        from sfm_tpu.config import PnPConfig, effective_guided_ratio

        cfg = SfMConfig(features=FeatureConfig(kind="orb"),
                        pnp=PnPConfig(guided_ratio=0.9))
        assert effective_guided_ratio(cfg) == pytest.approx(0.9 ** 0.5)
        assert effective_guided_ratio(SfMConfig()) == SfMConfig().pnp.guided_ratio

    def test_sharded_retrieval_maps_kind(self, rng):
        """The sharded retrieval twin must apply the same ratio mapping as
        the single-device path when told the features are binary (review
        finding: the parallel path silently scored at Hamming ratio r^2)."""
        import jax

        from tests.test_reconstruction import make_multiview
        from sfm_tpu.config import RetrievalConfig
        from sfm_tpu.matching.retrieval import retrieval_scores
        from sfm_tpu.parallel import make_mesh, sharded_retrieval_scores
        from sfm_tpu.matching.sweep import candidate_pairs

        assert len(jax.devices()) >= 8
        scene = _binarize_scene(
            make_multiview(rng, n_cams=6, n_pts=150, K_budget=64, D=64)
        )
        rcfg = RetrievalConfig(ratio_threshold=0.75)
        pairs = candidate_pairs(6)
        mapped = dataclasses.replace(rcfg, ratio_threshold=0.75 ** 0.5)
        want = retrieval_scores(scene["desc"], scene["valid"], pairs, mapped)
        got = sharded_retrieval_scores(
            scene["desc"], scene["valid"], pairs, make_mesh(8), rcfg,
            feature_kind="orb",
        )
        np.testing.assert_array_equal(np.asarray(want), got)
        # Unmapped (default sift kind) scores differ on this scene — the
        # mapping is load-bearing, not a no-op.
        raw = sharded_retrieval_scores(
            scene["desc"], scene["valid"], pairs, make_mesh(8), rcfg,
        )
        assert raw.sum() < got.sum()

    def test_ratio_semantics_on_constructed_hammings(self):
        """Construct h_best=60, h_second=70: Hamming ratio 0.857 — rejected
        by the reference contract (0.75) only if the matcher receives the
        MAPPED threshold; h_second=90 (ratio 0.67) must pass."""
        from sfm_tpu.matching import match_descriptors

        rng = _rng(11)
        D = binary.N_BITS

        def enc(bits):
            return ((bits.astype(np.float32) * 2 - 1) / 16.0)

        base = rng.random(D) < 0.5
        q = enc(base)[None]

        def flip(bits, k, seed):
            r = np.random.default_rng(seed)
            idx = r.choice(D, size=k, replace=False)
            out = bits.copy()
            out[idx] = ~out[idx]
            return out

        for h2, expect in ((90, True), (70, False)):
            cand = np.stack([enc(flip(base, 60, 1)), enc(flip(base, h2, 2))])
            m = match_descriptors(
                q, np.ones(1, bool), cand, np.ones(2, bool),
                ratio_threshold=0.75 ** 0.5, max_matches=4, mutual_check=False,
            )
            assert bool(np.asarray(m["valid"])[0]) is expect, h2


def _binarize_scene(scene):
    """Sign-binarize a make_multiview scene's float descriptors into the ORB
    wire encoding (±1/sqrt(D) unit vectors): correlated floats stay
    correlated bit patterns, invalid rows stay zero."""
    d = scene["desc"]
    D = d.shape[-1]
    b = np.where(d >= 0, 1.0, -1.0).astype(np.float32) / np.sqrt(D)
    b[~scene["valid"]] = 0.0
    out = dict(scene)
    out["desc"] = b
    return out


class TestSweepIntegration:
    """The sweep must consume the kind-aware EFFECTIVE match config —
    a sweep built from an orb SfMConfig behaves exactly like one built from
    a sift config whose ratio was hand-mapped to sqrt(r), and differently
    from one that forgot the mapping (sweep.py:_sweep_chunk_fn)."""

    def test_sweep_applies_ratio_mapping(self, rng):
        from tests.test_reconstruction import make_multiview
        from sfm_tpu.config import VerifyConfig
        from sfm_tpu.matching import all_pairs_sweep

        scene = _binarize_scene(
            make_multiview(rng, n_cams=6, n_pts=200, K_budget=128, D=64)
        )
        base = dict(matching=MatchConfig(ratio_threshold=0.75, max_matches=128),
                    verify=VerifyConfig(ransac_iters=256))
        cfg_orb = SfMConfig(features=FeatureConfig(kind="orb"), **base)
        cfg_manual = SfMConfig(
            matching=dataclasses.replace(base["matching"],
                                         ratio_threshold=0.75 ** 0.5),
            verify=base["verify"],
        )
        cfg_unmapped = SfMConfig(**base)
        args = (scene["xy"], scene["desc"], scene["valid"])
        t_orb = all_pairs_sweep(*args, cfg_orb, chunk_size=8)
        t_manual = all_pairs_sweep(*args, cfg_manual, chunk_size=8)
        t_raw = all_pairs_sweep(*args, cfg_unmapped, chunk_size=8)
        np.testing.assert_array_equal(t_orb.accept, t_manual.accept)
        np.testing.assert_array_equal(t_orb.num_matches, t_manual.num_matches)
        # The unmapped config tests sqL2_1 < 0.75^2 * sqL2_2 — i.e. Hamming
        # ratio 0.5625, strictly stricter: fewer matches overall.
        assert t_raw.num_matches.sum() < t_orb.num_matches.sum()

    def test_ring_and_sharded_sweeps_agree_on_binary(self, rng):
        import jax

        from tests.test_reconstruction import make_multiview
        from sfm_tpu.config import VerifyConfig
        from sfm_tpu.matching import all_pairs_sweep
        from sfm_tpu.parallel import make_mesh, sharded_all_pairs_sweep
        from sfm_tpu.parallel.ring import ring_all_pairs_sweep

        assert len(jax.devices()) >= 8
        mesh = make_mesh(8)
        scene = _binarize_scene(
            make_multiview(rng, n_cams=8, n_pts=200, K_budget=128, D=64)
        )
        cfg = SfMConfig(
            features=FeatureConfig(kind="orb"),
            matching=MatchConfig(ratio_threshold=0.75, max_matches=128),
            verify=VerifyConfig(ransac_iters=256),
        )
        args = (scene["xy"], scene["desc"], scene["valid"])
        flat = all_pairs_sweep(*args, cfg, chunk_size=8)
        ring = ring_all_pairs_sweep(*args, mesh, cfg)
        shard = sharded_all_pairs_sweep(*args, mesh, cfg, pairs_per_device=2)
        np.testing.assert_array_equal(flat.accept, ring.accept)
        np.testing.assert_array_equal(flat.num_matches, ring.num_matches)
        np.testing.assert_array_equal(flat.accept, shard.accept)
        np.testing.assert_array_equal(flat.num_matches, shard.num_matches)


class TestKnobs:
    def test_fast_threshold_consumed(self):
        img = _texture()
        lo = detect_and_describe(img, config=FeatureConfig(
            kind="orb", fast_threshold=8.0))
        hi = detect_and_describe(img, config=FeatureConfig(
            kind="orb", fast_threshold=60.0))
        assert np.asarray(lo.valid).sum() > np.asarray(hi.valid).sum()

    def test_kind_switches_descriptor_class(self):
        img = _texture()
        orb = detect_and_describe(img, config=FeatureConfig(kind="orb"))
        sift = detect_and_describe(img, config=FeatureConfig())
        assert orb.desc.shape[1] == 256 and orb.desc.dtype == np.float16
        assert sift.desc.shape[1] == 128

    def test_mask_dilate_consumed_by_orb_path(self):
        img = np.zeros((120, 160), np.float32)
        img[40:80, 50:110] = 1.0
        mask = np.zeros((120, 160), bool)
        mask[:, :49] = True  # corners at x=50 sit JUST outside
        f0 = detect_and_describe(img, mask=mask, config=FeatureConfig(
            kind="orb", orb_levels=1))
        f2 = detect_and_describe(img, mask=mask, config=FeatureConfig(
            kind="orb", mask_dilate=2, orb_levels=1))
        assert np.asarray(f0.valid).sum() == 0
        assert np.asarray(f2.valid).sum() == 2


class TestMultiScale:
    """Binary-path pyramid (FeatureConfig.orb_levels > 1): merged fixed-K
    table stays response-ordered; descriptors bridge a scale change that
    single-scale binary cannot (the bunny-image-0 failure mode)."""

    def test_budgets_superset_and_decrease(self):
        """Level 0 keeps the full base budget (splitting it starved the
        pairwise sweep — binary._level_budgets docstring); upper levels add
        progressively smaller extras."""
        b = binary._level_budgets(2048, 3, 1.35)
        assert b[0] == 2048
        assert b[0] > b[1] > b[2] > 0
        assert all(x % 8 == 0 for x in b[1:])

    def test_merged_table_is_response_ordered(self):
        f = detect_and_describe(_texture(), config=FeatureConfig(
            kind="orb", orb_levels=3))
        v = np.asarray(f.valid)
        r = np.asarray(f.response)[v]
        assert (np.diff(r) <= 1e-6).all()
        assert v.sum() > 0

    def test_scale_bridging_match(self):
        """Detect on a texture and on its 1.5x-downscaled version; mutual
        ratio matching must link them far above chance ONLY when the pyramid
        is on — the property that registers wide-baseline cameras."""
        import jax.numpy as jnp
        from sfm_tpu.matching.core import _match_descriptors
        from sfm_tpu.config import map_ratio_for_kind

        img = _texture(240, 300, seed=11)
        h, w = img.shape
        import jax

        small = np.asarray(jax.image.resize(
            jnp.asarray(img), (int(h / 1.5), int(w / 1.5)), "linear"))

        def n_matches(levels):
            cfg = FeatureConfig(kind="orb", orb_levels=levels)
            f1 = detect_and_describe(img, config=cfg)
            f2 = detect_and_describe(small.astype(np.float32), config=cfg)
            r = map_ratio_for_kind(0.75, "orb")
            out = _match_descriptors(
                jnp.asarray(f1.desc, jnp.float32), jnp.asarray(f1.valid),
                jnp.asarray(f2.desc, jnp.float32), jnp.asarray(f2.valid),
                max_matches=512, ratio_threshold=r)
            m = np.asarray(out["valid"])
            # count valid matches with geometric consistency: mapped coords
            xy1 = np.asarray(f1.xy)[np.asarray(out["idx1"])[m]]
            xy2 = np.asarray(f2.xy)[np.asarray(out["idx2"])[m]]
            err = np.abs(xy1 / 1.5 - xy2).max(1)
            return int((err < 3.0).sum())

        n1 = n_matches(1)
        n3 = n_matches(3)
        assert n3 >= max(2 * n1, 20), (n1, n3)
