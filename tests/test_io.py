"""I/O tests: PNM decode (numpy + native parity), calib parsing, robustness."""
import numpy as np
import pytest

from sfm_tpu.io.images import load_image, load_image_gray, load_mask, _read_pnm


def write_ppm(path, arr):
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(arr.astype(np.uint8).tobytes())


def write_pgm(path, arr):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(arr.astype(np.uint8).tobytes())


class TestPnmDecode:
    def test_roundtrip_p6(self, tmp_path, rng):
        arr = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
        p = tmp_path / "x.ppm"
        write_ppm(p, arr)
        np.testing.assert_array_equal(load_image(p), arr)

    def test_roundtrip_p5(self, tmp_path, rng):
        arr = rng.integers(0, 255, (10, 12), dtype=np.uint8)
        p = tmp_path / "x.pgm"
        write_pgm(p, arr)
        np.testing.assert_array_equal(load_image(p), arr)

    def test_comments_in_header(self, tmp_path):
        p = tmp_path / "c.pgm"
        data = b"P5\n# a comment\n4 2\n# more\n255\n" + bytes(8)
        p.write_bytes(data)
        assert load_image(p).shape == (2, 4)

    def test_truncated_rejected(self, tmp_path):
        p = tmp_path / "t.ppm"
        p.write_bytes(b"P6\n100 100\n255\n\x00\x01")
        with pytest.raises(Exception):
            arr = _read_pnm(p)
            assert arr.size == 100 * 100 * 3  # must not silently mis-shape

    def test_junk_rejected(self, tmp_path):
        p = tmp_path / "j.ppm"
        p.write_bytes(b"not an image at all")
        with pytest.raises(ValueError):
            _read_pnm(p)

    def test_mask_semantics(self, tmp_path):
        # Reference semantics: object is DARK -> True after inversion.
        arr = np.full((8, 8), 255, np.uint8)
        arr[2:6, 2:6] = 0
        p = tmp_path / "m.pgm"
        write_pgm(p, arr)
        m = load_mask(p)
        assert m[4, 4] and not m[0, 0]


class TestNativeParity:
    @pytest.fixture(scope="class")
    def lib(self):
        from sfm_tpu.io.native import get_lib

        lib = get_lib()
        if lib is None:
            pytest.skip("native loader unavailable (no g++)")
        return lib

    def test_gray_parity(self, lib, tmp_path, rng):
        from sfm_tpu.io.native import load_gray_batch

        arrs = [rng.integers(0, 255, (12, 16, 3), dtype=np.uint8) for _ in range(4)]
        paths = []
        for k, a in enumerate(arrs):
            p = tmp_path / f"{k}.ppm"
            write_ppm(p, a)
            paths.append(p)
        got = load_gray_batch(paths, 12, 16)
        want = np.stack([load_image_gray(p) for p in paths])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mask_parity_interior(self, lib, tmp_path, rng):
        from sfm_tpu.io.native import load_mask_batch

        arr = np.full((20, 20), 255, np.uint8)
        arr[5:15, 5:15] = 0
        p = tmp_path / "m.pgm"
        write_pgm(p, arr)
        got = load_mask_batch([p], 20, 20)[0]
        want = load_mask(p)
        # Border-pixel erosion conventions differ; interior must agree.
        np.testing.assert_array_equal(got[1:-1, 1:-1], want[1:-1, 1:-1])

    def test_probe(self, lib, tmp_path, rng):
        from sfm_tpu.io.native import probe

        p = tmp_path / "p.ppm"
        write_ppm(p, rng.integers(0, 255, (6, 9, 3), dtype=np.uint8))
        assert probe(p) == (6, 9, 3)

    def test_native_failure_reported(self, lib, tmp_path):
        from sfm_tpu.io.native import load_gray_batch

        p = tmp_path / "bad.ppm"
        p.write_bytes(b"garbage")
        with pytest.raises(ValueError):
            load_gray_batch([p], 4, 4)


class TestCalib:
    def test_bunny_calib_decomposition(self, bunny_calib):
        """Every bunny P must decompose into a plausible K [R | t]."""
        for img, (P, K, R, t) in bunny_calib.items():
            assert abs(np.linalg.det(R) - 1) < 1e-6
            assert 1000 < K[0, 0] < 1600
            assert abs(K[0, 1]) < 1.0  # no skew
            # Recompose: K [R|t] ~ P (up to scale).
            P2 = K @ np.concatenate([R, t[:, None]], axis=1)
            scale = P[0, 0] / P2[0, 0]
            np.testing.assert_allclose(P2 * scale, P, rtol=1e-4, atol=1e-3)
