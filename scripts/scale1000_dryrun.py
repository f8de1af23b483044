"""1000-image scale harness on the 8-virtual-CPU mesh (BASELINE config #5
direction): ring-sharded sweep (features sharded, ppermute exchange) over
C(1000,2) = 499,500 pairs, then a full incremental reconstruction.

Feature budgets are kept tiny (K=64, D=16) — this validates that the sharded
programs, the track builder, the selector, and the engine complete and stay
correct at 1000 cameras, not single-chip throughput (scale_bench.py measures
that on the real TPU).

Usage: python scripts/scale1000_dryrun.py [n_cams]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sfm_tpu.config import (
    SfMConfig, MatchConfig, VerifyConfig, PnPConfig, BAConfig,
    TriangulationConfig, CameraConfig,
)

T0 = time.time()


def log(m):
    print("[%7.1fs] %s" % (time.time() - T0, m), flush=True)


def make_scene_fast(rng, n_cams, n_pts, K_budget=64, D=16, noise_px=0.4):
    """Vectorized variant of scale_bench.make_scene (the per-camera Python
    loop costs ~1 s/cam; at 1000 cams that alone would dominate)."""
    from scipy.spatial.transform import Rotation

    Kmat = CameraConfig().K().astype(np.float64)
    dirs = rng.normal(size=(n_pts, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = (dirs * rng.uniform(0.8, 1.2, (n_pts, 1)))
    desc_gt = rng.normal(size=(n_pts, D))
    desc_gt /= np.linalg.norm(desc_gt, axis=1, keepdims=True)

    ang = 2 * np.pi * np.arange(n_cams) / n_cams
    Rs = Rotation.from_euler(
        "zyx", np.stack([0.05 * np.sin(3 * ang), ang, 0.1 * np.ones(n_cams)], -1)
    ).as_matrix()
    centers = np.stack(
        [4.5 * np.sin(ang), 0.4 * np.sin(2 * ang), -4.5 * np.cos(ang)], -1)
    ts = -np.einsum("nij,nj->ni", Rs, centers)

    cam_pts = np.einsum("nij,pj->npi", Rs, pts) + ts[:, None, :]   # (N, P, 3)
    depth = cam_pts[..., 2]
    uv = cam_pts @ Kmat.T
    proj = uv[..., :2] / np.maximum(uv[..., 2:], 1e-9)
    facing = np.einsum("pj,nj->np", pts, centers / np.linalg.norm(centers, axis=1, keepdims=True)) > 0.2
    vis = (depth > 0) & facing & (proj[..., 0] > 10) & (proj[..., 0] < 1014) \
        & (proj[..., 1] > 10) & (proj[..., 1] < 758)

    xy = np.zeros((n_cams, K_budget, 2), np.float32)
    desc = np.zeros((n_cams, K_budget, D), np.float32)
    valid = np.zeros((n_cams, K_budget), bool)
    for c in range(n_cams):  # cheap: pure indexing
        idx = np.nonzero(vis[c])[0]
        rng.shuffle(idx)
        idx = idx[:K_budget]
        k = len(idx)
        xy[c, :k] = proj[c, idx] + rng.normal(scale=noise_px, size=(k, 2))
        d = desc_gt[idx] + 0.03 * rng.normal(size=(k, D))
        desc[c, :k] = d / np.linalg.norm(d, axis=1, keepdims=True)
        valid[c, :k] = True
    return xy, desc, valid


def main(n_cams=1000, n_pts=1500):
    from sfm_tpu.parallel import make_mesh, ring_all_pairs_sweep
    from sfm_tpu.reconstruction import StructureFromMotion

    rng = np.random.default_rng(0)
    xy, desc, valid = make_scene_fast(rng, n_cams, n_pts, K_budget=256)
    log("scene: %d cams, %d pts, kps/cam mean %.0f" % (n_cams, n_pts, valid.sum(1).mean()))

    cfg = SfMConfig(
        matching=MatchConfig(max_matches=128),
        verify=VerifyConfig(ransac_iters=32),
        pnp=PnPConfig(ransac_iters=256, budget=512, candidate_batch=16),
        ba=BAConfig(max_iterations=6, cg_iters=20, optimize_intrinsics=False,
                    frequency=50, prune_multiplier=3.0),
        triangulation=TriangulationConfig(cadence=4),
    )
    mesh = make_mesh(8)
    t0 = time.time()
    table = ring_all_pairs_sweep(xy, desc, valid, mesh, cfg, slots_per_chunk=16)
    t_sweep = time.time() - t0
    log("ring sweep (8-device mesh, features sharded): %.1fs for %d pairs "
        "(%.0f pairs/s), %d accepted" % (
            t_sweep, table.num_pairs, table.num_pairs / t_sweep,
            len(table.accepted())))

    t0 = time.time()
    sfm = StructureFromMotion(table, xy, cfg, desc=desc, feat_valid=valid)
    log("tracks: %.1fs (%d tracks, selector %d nodes)" % (
        time.time() - t0, sfm.tracks.num_tracks, len(sfm.selector.nodes)))

    t0 = time.time()
    res = sfm.run_reconstruction()
    s = res.stats
    log("reconstruction: %.1fs — cams=%d/%d pts=%d err=%.3f tracklen=%.2f" % (
        time.time() - t0, s["num_cameras"], n_cams, s["num_points"],
        s["mean_reprojection_error"], s["mean_track_length"]))
    log("stage_s: %s" % {k: round(v, 1) for k, v in s["stage_s"].items()})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
