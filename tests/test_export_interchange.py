"""Bundler .out / VisualSFM .nvm exporters: parse-back + geometric checks.

Both formats change conventions vs our world->cam OpenCV-like model
(Bundler: -z look, y-up, center-origin y-up pixels; NVM: camera CENTER +
center-origin pixels), so the tests don't just diff text — they re-project
the 3-D points through the PARSED camera model and require the stored
measurements back, which catches any axis/sign/center mistake.
"""
import numpy as np
import pytest

from sfm_tpu.io.export import SfMExporter
from sfm_tpu.reconstruction.incremental import ReconstructionResult


def _rot(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


@pytest.fixture(scope="module")
def scene():
    """Synthetic consistent scene: fx == fy (both formats carry one focal),
    observations are exact projections."""
    rng = np.random.default_rng(7)
    n_img, n_pts, V = 5, 40, 3
    f, cx, cy = 900.0, 320.0, 240.0
    Rs = np.stack([_rot(rng.normal(size=3), 0.2 * k) for k in range(n_img)])
    # cameras ring around origin, looking roughly at the cloud near z=+4
    ts = rng.normal(scale=0.3, size=(n_img, 3)) + np.array([0, 0, 0.5])
    pts = rng.normal(scale=1.0, size=(n_pts, 3)) + np.array([0, 0, 4.0])

    obs_img = np.full((n_pts, V), -1, np.int32)
    obs_xy = np.zeros((n_pts, V, 2), np.float64)
    for m in range(n_pts):
        views = rng.choice(n_img, 2, replace=False)
        for v, img in enumerate(views):
            pc = Rs[img] @ pts[m] + ts[img]
            obs_img[m, v] = img
            obs_xy[m, v] = (f * pc[0] / pc[2] + cx, f * pc[1] / pc[2] + cy)
    res = ReconstructionResult(
        image_ids=np.arange(n_img),
        rotations=Rs.astype(np.float64),
        translations=ts.astype(np.float64),
        intrinsics=np.array([f, f, cx, cy]),
        points3d=pts,
        track_ids=np.arange(n_pts),
        obs_img=obs_img,
        obs_xy=obs_xy,
        stats={},
    )
    return SfMExporter(result=res, image_size=(640, 480)), pts, (f, cx, cy)


class TestBundler:
    def test_roundtrip_and_reprojection(self, scene, tmp_path):
        exp, pts, (f, cx, cy) = scene
        exp.export_bundler(tmp_path / "bundle.out", tmp_path / "list.txt")

        lines = (tmp_path / "bundle.out").read_text().splitlines()
        assert lines[0].startswith("# Bundle file v0.3")
        n_cams, n_pts = (int(x) for x in lines[1].split())
        assert n_cams == 5 and n_pts == len(pts)

        # parse cameras: 5 lines each (f k1 k2, 3 R rows, t)
        cams = []
        at = 2
        for _ in range(n_cams):
            fk = [float(x) for x in lines[at].split()]
            assert fk[0] == pytest.approx(f) and fk[1] == 0 and fk[2] == 0
            R = np.array([[float(x) for x in lines[at + 1 + r].split()]
                          for r in range(3)])
            t = np.array([float(x) for x in lines[at + 4].split()])
            # rotation must stay orthonormal after the axis flip
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)
            cams.append((R, t))
            at += 5

        # parse points and re-project through the BUNDLER model:
        # P = R X + t (camera looks down -z), p = -P/Pz, pixel = f*p
        names = (tmp_path / "list.txt").read_text().splitlines()
        assert len(names) == n_cams and names[0] == "0000.ppm"
        checked = 0
        for _ in range(n_pts):
            X = np.array([float(x) for x in lines[at].split()])
            view = lines[at + 2].split()
            nv = int(view[0])
            for v in range(nv):
                ci = int(view[1 + 4 * v])
                mx = float(view[3 + 4 * v])
                my = float(view[4 + 4 * v])
                R, t = cams[ci]
                P = R @ X + t
                assert P[2] < 0, "bundler cameras must see points at z<0"
                assert mx == pytest.approx(-f * P[0] / P[2], abs=2e-2)
                assert my == pytest.approx(-f * P[1] / P[2], abs=2e-2)
                checked += 1
            at += 3
        assert checked >= 2 * n_pts - 1  # every track has 2 views


class TestNvm:
    def test_roundtrip_and_reprojection(self, scene, tmp_path):
        exp, pts, (f, cx, cy) = scene
        exp.export_nvm(tmp_path / "model.nvm")

        raw = [l for l in (tmp_path / "model.nvm").read_text().splitlines()
               if l.strip()]
        assert raw[0].startswith("NVM_V3")
        n_cams = int(raw[1])
        assert n_cams == 5
        cams = []
        for k in range(n_cams):
            tok = raw[2 + k].split()
            assert tok[0] == f"{k:04d}.ppm"
            assert float(tok[1]) == pytest.approx(f)
            qw, qx, qy, qz = (float(x) for x in tok[2:6])
            C = np.array([float(x) for x in tok[6:9]])
            assert float(tok[9]) == 0.0  # radial coeff: pinhole
            # quaternion (w,x,y,z) -> R, world->cam
            R = np.array([
                [1 - 2 * (qy**2 + qz**2), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
                [2 * (qx * qy + qw * qz), 1 - 2 * (qx**2 + qz**2), 2 * (qy * qz - qw * qx)],
                [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx**2 + qy**2)],
            ])
            t = -R @ C
            cams.append((R, t))

        n_pts = int(raw[2 + n_cams])
        assert n_pts == len(pts)
        checked = 0
        for m in range(n_pts):
            tok = raw[3 + n_cams + m].split()
            X = np.array([float(x) for x in tok[:3]])
            nv = int(tok[6])
            for v in range(nv):
                ci = int(tok[7 + 4 * v])
                mx = float(tok[9 + 4 * v])
                my = float(tok[10 + 4 * v])
                R, t = cams[ci]
                P = R @ X + t
                assert P[2] > 0
                # NVM measurements are center-origin, y down (our axes)
                assert mx == pytest.approx(f * P[0] / P[2], abs=2e-2)
                assert my == pytest.approx(f * P[1] / P[2], abs=2e-2)
                checked += 1
        assert checked >= 2 * n_pts - 1

    def test_export_all_includes_interchange(self, scene, tmp_path):
        exp, _, _ = scene
        exp.export_all(tmp_path)
        assert (tmp_path / "bundler" / "bundle.out").exists()
        assert (tmp_path / "bundler" / "list.txt").exists()
        assert (tmp_path / "model.nvm").exists()
