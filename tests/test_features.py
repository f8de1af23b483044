"""Feature frontend tests on small synthetic images (fast on the CPU mesh).

Real-image quality is covered by the bunny integration test
(test_pipeline_bunny.py); here we pin the structural invariants: blobs are
detected where placed, descriptors are unit-norm, matching survives rotation,
and the mask gate drops keypoints outside the silhouette.
"""
import numpy as np
import jax.numpy as jnp

from sfm_tpu.config import FeatureConfig
from sfm_tpu.features import detect_and_describe

# upsample off: the -1 octave keypoints sit at scales where the synthetic
# warps' bilinear resampling artifacts dominate the descriptor, which is not
# what these invariance tests probe.
CFG = FeatureConfig(
    max_keypoints=256, num_octaves=3, contrast_threshold=0.01,
    upsample_first_octave=False,
)


def blob_image(rng, size=128, n_blobs=12, seed_positions=None):
    """Gaussian blobs on a plain background — ideal DoG targets."""
    img = np.zeros((size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    if seed_positions is None:
        # Jittered grid keeps blobs well-separated (overlap shifts extrema).
        grid = int(np.ceil(np.sqrt(n_blobs)))
        step = (size - 40) / max(grid - 1, 1)
        cells = [(20 + i * step, 20 + j * step) for i in range(grid) for j in range(grid)]
        seed_positions = np.asarray(cells[:n_blobs]) + rng.uniform(-4, 4, size=(n_blobs, 2))
    for k, (cx, cy) in enumerate(seed_positions):
        # sigma_b >= 3: the LoG extremum sits at sigma_b/sqrt(2), which must
        # land inside the pyramid's interior layers (>= sigma0 = 1.6).
        s = 3.0 + 1.5 * (k % 3)
        img += (0.4 + 0.05 * (k % 5)) * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    return np.clip(img, 0, 1), np.asarray(seed_positions)


class TestExtremaSeparable:
    """The separable strict 26-neighbor test must equal the pairwise oracle."""

    def test_exact_equality_random(self, rng):
        from sfm_tpu.features.detect import (
            dog_extrema_scores, _dog_extrema_scores_ref)

        dog = jnp.asarray(rng.normal(scale=0.02, size=(5, 48, 64)).astype(np.float32))
        got = dog_extrema_scores(dog, 0.006, 10.0)["score"]
        want = _dog_extrema_scores_ref(dog, 0.006, 10.0)["score"]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_exact_equality_with_plateaus(self, rng):
        # Engineered exact ties (a plateau of equal values): the strict test
        # must reject BOTH plateau pixels, identically in both paths.
        from sfm_tpu.features.detect import (
            dog_extrema_scores, _dog_extrema_scores_ref)

        d = rng.normal(scale=0.02, size=(5, 40, 40)).astype(np.float32)
        d[2, 16, 16] = d[2, 16, 17] = 0.5       # same-row tie
        d[2, 24, 24] = d[3, 24, 24] = -0.5      # cross-layer tie
        d[1, 8, 8] = 0.7                        # genuine strict extremum
        d[1, 7:10, 7:10] = np.minimum(d[1, 7:10, 7:10], 0.1)
        d[1, 8, 8] = 0.7
        d[0, 7:10, 7:10] = np.minimum(d[0, 7:10, 7:10], 0.1)
        d[2, 7:10, 7:10] = np.minimum(d[2, 7:10, 7:10], 0.1)
        dog = jnp.asarray(d)
        got = np.asarray(dog_extrema_scores(dog, 0.006, 10.0)["score"])
        want = np.asarray(_dog_extrema_scores_ref(dog, 0.006, 10.0)["score"])
        np.testing.assert_array_equal(got, want)
        assert got[0, 8, 8] == np.float32(0.7)   # the strict extremum survives
        assert got[1, 16, 16] == 0 and got[1, 16, 17] == 0  # ties rejected


class TestDetection:
    def test_blobs_detected(self, rng):
        img, pos = blob_image(rng)
        f = detect_and_describe(img, config=CFG)
        v = np.asarray(f.valid)
        assert v.sum() >= 8
        xy = np.asarray(f.xy)[v]
        # Every blob center should have a detection within 3 px.
        d = np.linalg.norm(pos[:, None, :] - xy[None, :, :], axis=-1).min(axis=1)
        assert (d < 3.0).mean() > 0.7

    def test_descriptors_unit_norm(self, rng):
        img, _ = blob_image(rng)
        f = detect_and_describe(img, config=CFG)
        v = np.asarray(f.valid)
        norms = np.linalg.norm(np.asarray(f.desc)[v], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # Invalid rows are zeroed.
        assert np.abs(np.asarray(f.desc)[~v]).max() == 0

    def test_blank_image_no_keypoints(self):
        img = np.full((128, 128), 0.5, np.float32)
        f = detect_and_describe(img, config=CFG)
        assert np.asarray(f.valid).sum() == 0

    def test_mask_gate(self, rng):
        img, pos = blob_image(rng)
        mask = np.zeros_like(img, dtype=bool)
        mask[:, :64] = True  # keep only the left half
        f = detect_and_describe(img, mask=mask, config=CFG)
        v = np.asarray(f.valid)
        if v.sum():
            assert (np.asarray(f.xy)[v][:, 0] <= 64.5).all()
        f_nomask = detect_and_describe(img, config=CFG)
        assert np.asarray(f_nomask.valid).sum() >= v.sum()


class TestMatchingInvariance:
    def test_translated_image_matches(self, rng):
        from sfm_tpu.matching import match_descriptors

        img, _ = blob_image(rng, size=160, n_blobs=16)
        shift = 10
        img2 = np.roll(img, (shift, -shift), axis=(0, 1))
        f1 = detect_and_describe(img, config=CFG)
        f2 = detect_and_describe(img2, config=CFG)
        m = match_descriptors(f1.desc, f1.valid, f2.desc, f2.valid, max_matches=128)
        mv = np.asarray(m["valid"])
        assert mv.sum() >= 8
        xy1 = np.asarray(f1.xy)[np.asarray(m["idx1"])[mv]]
        xy2 = np.asarray(f2.xy)[np.asarray(m["idx2"])[mv]]
        dxy = xy2 - xy1
        # Matches should agree with the known translation.
        err = np.linalg.norm(dxy - np.array([-shift, shift]), axis=1)
        assert np.median(err) < 1.5

    def test_rotated_image_matches(self, rng):
        from sfm_tpu.matching import match_descriptors
        from scipy.ndimage import rotate

        img, _ = blob_image(rng, size=160, n_blobs=16)
        img2 = rotate(img, 30.0, reshape=False, order=1).astype(np.float32)
        f1 = detect_and_describe(img, config=CFG)
        f2 = detect_and_describe(img2, config=CFG)
        m = match_descriptors(f1.desc, f1.valid, f2.desc, f2.valid, max_matches=128)
        mv = np.asarray(m["valid"])
        assert mv.sum() >= 6
        # Verify matches map through the known rotation about the center.
        c = (160 - 1) / 2.0
        th = np.deg2rad(30.0)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        xy1 = np.asarray(f1.xy)[np.asarray(m["idx1"])[mv]]
        xy2 = np.asarray(f2.xy)[np.asarray(m["idx2"])[mv]]
        pred = (xy1 - c) @ R + c  # scipy rotates CCW in array coords
        err = np.linalg.norm(pred - xy2, axis=1)
        assert np.median(err) < 3.0


class TestBatchedDetection:
    def test_batch_matches_single(self, rng):
        from sfm_tpu.features import detect_and_describe_batch

        imgs = np.stack([blob_image(rng, size=96, n_blobs=6)[0] for _ in range(5)])
        fb = detect_and_describe_batch(imgs, config=CFG, batch_size=2)
        assert fb.xy.shape[0] == 5
        for i in range(5):
            fs = detect_and_describe(imgs[i], config=CFG)
            np.testing.assert_array_equal(np.asarray(fb.valid[i]), np.asarray(fs.valid))
            v = np.asarray(fs.valid)
            np.testing.assert_allclose(
                np.asarray(fb.xy[i])[v], np.asarray(fs.xy)[v], atol=1e-4
            )

    def test_batch_with_masks(self, rng):
        from sfm_tpu.features import detect_and_describe_batch

        imgs = np.stack([blob_image(rng, size=96, n_blobs=6)[0] for _ in range(3)])
        masks = np.zeros((3, 96, 96), bool)
        masks[:, :, :48] = True
        fb = detect_and_describe_batch(imgs, masks, config=CFG)
        for i in range(3):
            v = np.asarray(fb.valid[i])
            if v.sum():
                assert (np.asarray(fb.xy[i])[v][:, 0] <= 48.5).all()
