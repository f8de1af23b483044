"""Scale harness: N-camera synthetic scene end-to-end (BASELINE.json config #4).

Generates a ring of N cameras around a textured point cloud with persistent
per-point descriptors, then runs the real pipeline: all-pairs sweep (C(N,2)
pairs) -> tracks -> incremental reconstruction with BA. Reports per-stage
wall-clock against the north-star target (<60 s for 100 images, <1 px).

Usage: python scripts/scale_bench.py [n_cams] [n_pts]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from sfm_tpu.config import (SfMConfig, MatchConfig, VerifyConfig, CameraConfig, BAConfig, TriangulationConfig)
from sfm_tpu.geometry import project, rotation_to_rvec
from sfm_tpu.matching import all_pairs_sweep
from sfm_tpu.reconstruction import StructureFromMotion

T0 = time.time()


def log(m):
    print("[%7.1fs] %s" % (time.time() - T0, m), flush=True)


def _cfg_tag(*objs):
    """Short stable fingerprint of (frozen-dataclass) config objects. Every
    disk cache of sweep output must be keyed on the config that produced it —
    a stale /tmp table silently measured under an older config is the same
    failure class as round-3's bench feature cache (VERDICT weak #1)."""
    import hashlib

    return hashlib.md5(repr(objs).encode()).hexdigest()[:10]


def make_scene_cached(rng, n_cams, n_pts, **kw):
    """Disk-cached make_scene: generation is a serial Python loop that costs
    ~1 s/camera — not what this harness measures."""
    import hashlib

    tag = hashlib.md5(repr((n_cams, n_pts, sorted(kw.items()))).encode()).hexdigest()[:10]
    cache = Path("/tmp/scale_scene_%s.npz" % tag)
    if cache.exists():
        z = np.load(cache)
        return z["xy"], z["desc"], z["valid"]
    xy, desc, valid = make_scene(rng, n_cams, n_pts, **kw)
    np.savez(cache, xy=xy, desc=desc, valid=valid)
    return xy, desc, valid


def make_scene(rng, n_cams=100, n_pts=5000, K_budget=1024, D=128, noise_px=0.4):
    from scipy.spatial.transform import Rotation

    cam = CameraConfig()
    Kmat = cam.K()
    # Point cloud on a rough sphere surface (structured like a real object).
    dirs = rng.normal(size=(n_pts, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = (dirs * rng.uniform(0.8, 1.2, (n_pts, 1))).astype(np.float32)
    desc_gt = rng.normal(size=(n_pts, D)).astype(np.float32)
    desc_gt /= np.linalg.norm(desc_gt, axis=1, keepdims=True)

    xy = np.zeros((n_cams, K_budget, 2), np.float32)
    desc = np.zeros((n_cams, K_budget, D), np.float32)
    valid = np.zeros((n_cams, K_budget), bool)
    for c in range(n_cams):
        ang = 2 * np.pi * c / n_cams
        R = Rotation.from_euler("zyx", [0.05 * np.sin(3 * ang), ang, 0.1]).as_matrix().astype(np.float32)
        center = np.array([4.5 * np.sin(ang), 0.4 * np.sin(2 * ang), -4.5 * np.cos(ang)], np.float32)
        t = -R @ center
        proj, depth = project(pts, R, t, Kmat)
        proj = np.asarray(proj)
        # Front-facing points only (surface visibility: normal toward camera).
        facing = (pts @ (center / np.linalg.norm(center))) > 0.2
        vis = np.nonzero(
            (np.asarray(depth) > 0) & facing
            & (proj[:, 0] > 10) & (proj[:, 0] < 1014)
            & (proj[:, 1] > 10) & (proj[:, 1] < 758)
        )[0]
        rng.shuffle(vis)
        vis = vis[:K_budget]
        n = len(vis)
        xy[c, :n] = proj[vis] + rng.normal(scale=noise_px, size=(n, 2))
        d = desc_gt[vis] + 0.03 * rng.normal(size=(n, D))
        desc[c, :n] = d / np.linalg.norm(d, axis=1, keepdims=True)
        valid[c, :n] = True
    return xy, desc, valid


def main(n_cams=100, n_pts=5000):
    rng = np.random.default_rng(0)
    xy, desc, valid = make_scene_cached(rng, n_cams, n_pts)
    log("scene: %d cams, %d pts, kps/cam mean %.0f" % (n_cams, n_pts, valid.sum(1).mean()))

    cfg = SfMConfig(
        matching=MatchConfig(max_matches=1024),
        verify=VerifyConfig(ransac_iters=1024),
        ba=BAConfig(max_iterations=15, cg_iters=40, optimize_intrinsics=False,
                    prune_multiplier=3.0, frequency=10),
        triangulation=TriangulationConfig(cadence=2),
    )
    # Two passes: the first pays one-time program compiles (and, on the
    # tunneled TPU, server-side compile whose cost is load-variable); the
    # second is the steady-state number a resident service sees.
    for rep in ("cold", "warm"):
        t0 = time.time()
        table = all_pairs_sweep(xy, desc, valid, cfg)
        t_sweep = time.time() - t0
        acc = table.accepted()
        log("%s sweep: %.1fs for %d pairs (%.0f pairs/s), %d accepted" % (
            rep, t_sweep, table.num_pairs, table.num_pairs / t_sweep, len(acc)))

        t0 = time.time()
        sfm = StructureFromMotion(table, xy, cfg)
        t_tracks = time.time() - t0
        t0 = time.time()
        res = sfm.run_reconstruction()
        t_rec = time.time() - t0
        s = res.stats
        log("%s reconstruction: %.1fs (tracks %.1fs) — cams=%d pts=%d err=%.3f tracklen=%.2f" % (
            rep, t_rec, t_tracks, s["num_cameras"], s["num_points"],
            s["mean_reprojection_error"], s["mean_track_length"]))
        log("%s stage_s: %s" % (rep, {k: round(v, 1) for k, v in s["stage_s"].items()}))
        log("%s TOTAL (sweep+tracks+recon): %.1fs  [north star: <60s, <1px]" % (
            rep, t_sweep + t_tracks + t_rec))
        if rep == "cold":
            import pickle
            with open("/tmp/scale_table.pkl", "wb") as f:
                pickle.dump({"table": table, "xy": xy,
                             "key": (n_cams, n_pts,
                                     _cfg_tag(cfg.matching, cfg.verify))}, f)


def sweep_only(n_cams, n_pts):
    """Matching-scale probe (config #5 direction): sweep throughput at N."""
    rng = np.random.default_rng(0)
    xy, desc, valid = make_scene_cached(rng, n_cams, n_pts)
    log("scene: %d cams (%d candidate pairs)" % (n_cams, n_cams * (n_cams - 1) // 2))
    cfg = SfMConfig()
    t0 = time.time()
    table = all_pairs_sweep(xy, desc, valid, cfg)
    dt = time.time() - t0
    log("sweep: %.1fs for %d pairs (%.0f pairs/s), %d accepted" % (
        dt, table.num_pairs, table.num_pairs / dt, len(table.accepted())))


def ring_sweep(n_cams, n_pts):
    """Ring-sharded sweep probe: features sharded (mesh of all local
    devices; 1 on a single chip), per-pair cost should stay flat with N."""
    from sfm_tpu.parallel import make_mesh, ring_all_pairs_sweep

    rng = np.random.default_rng(0)
    xy, desc, valid = make_scene_cached(rng, n_cams, n_pts)
    mesh = make_mesh()
    log("scene: %d cams (%d candidate pairs), mesh %d device(s)" % (
        n_cams, n_cams * (n_cams - 1) // 2, mesh.devices.size))
    cfg = SfMConfig()
    for rep in ("cold", "warm"):
        t0 = time.time()
        table = ring_all_pairs_sweep(xy, desc, valid, mesh, cfg,
                                     extract_artifacts=(rep == "warm"))
        dt = time.time() - t0
        log("%s ring sweep: %.1fs for %d pairs (%.0f pairs/s, %.2f ms/pair), %d accepted" % (
            rep, dt, table.num_pairs, table.num_pairs / dt,
            1e3 * dt / table.num_pairs, len(table.accepted())))


def make_scene_corridor(rng, n_cams=1000, n_pts=30000, K_budget=512, D=128,
                        noise_px=0.4, window=6.0, desc_noise=0.03,
                        repeat_frac=0.0, repeat_pool=64):
    """Trajectory scene with LOCAL visibility — the realistic sparse regime.

    Cameras travel along a corridor wall and only see points within
    ``window`` of their station, so pair overlap exists only between nearby
    cameras: at 1000 cameras the verified-pair graph is ~3-5% of the
    C(N,2) candidates (the ring scene's 80%-accept is pathological).
    Fully vectorized numpy (no per-camera device dispatches): generation is
    seconds, not ~1 s/camera like make_scene.

    Degradation knobs (round-4 verdict weak #2 — retrieval/gate tuning had
    only ever seen desc_noise=0.03 and zero repeated texture):
      desc_noise   PER-COMPONENT noise sigma on the D=128 unit descriptor;
                   total noise norm ~ sigma*sqrt(D), so same-point distance
                   ~ sigma*sqrt(2D) = 16*sigma. 0.03 -> 0.48 same-point
                   distance (clean SIFT regime); 0.06 -> 0.96 (hard);
                   0.09 -> 1.44 = the ~1.41 typical inter-point distance,
                   i.e. chance level — matching is impossible beyond it
      repeat_frac  fraction of points whose descriptor is drawn from a
                   small shared pool (repeated texture: windows, bricks) —
                   these points match ACROSS the scene, not just locally
    """
    cam = CameraConfig()
    Kmat = cam.K().astype(np.float64)
    L = n_cams * 0.5
    # Points on a rough corridor wall: x along the path, y vertical, z depth.
    pts = np.stack([
        rng.uniform(0, L, n_pts),
        rng.uniform(-2.0, 2.0, n_pts),
        rng.uniform(4.0, 7.0, n_pts),
    ], 1)
    desc_gt = rng.normal(size=(n_pts, D))
    desc_gt /= np.linalg.norm(desc_gt, axis=1, keepdims=True)
    if repeat_frac > 0:
        pool = rng.normal(size=(repeat_pool, D))
        pool /= np.linalg.norm(pool, axis=1, keepdims=True)
        rep = rng.random(n_pts) < repeat_frac
        desc_gt[rep] = pool[rng.integers(0, repeat_pool, int(rep.sum()))]

    # Camera c at x = c*L/n, z = 0, looking down +z at the wall, with a
    # gentle yaw wobble so rotations are non-trivial.
    xs = np.arange(n_cams) * (L / n_cams)
    yaw = 0.08 * np.sin(np.arange(n_cams) * 0.05)
    cy_, sy_ = np.cos(yaw), np.sin(yaw)
    Rs = np.zeros((n_cams, 3, 3))
    Rs[:, 0, 0] = cy_; Rs[:, 0, 2] = -sy_
    Rs[:, 1, 1] = 1.0
    Rs[:, 2, 0] = sy_; Rs[:, 2, 2] = cy_
    centers = np.stack([xs, 0.05 * np.sin(xs), np.zeros(n_cams)], 1)
    ts = -np.einsum("nab,nb->na", Rs, centers)

    xy = np.zeros((n_cams, K_budget, 2), np.float32)
    desc = np.zeros((n_cams, K_budget, D), np.float32)
    valid = np.zeros((n_cams, K_budget), bool)
    order = np.argsort(pts[:, 0], kind="stable")
    pts_s = pts[order]
    desc_s = desc_gt[order]
    px = pts_s[:, 0]
    for c in range(n_cams):
        lo, hi = np.searchsorted(px, [xs[c] - window, xs[c] + window])
        if hi - lo < 8:
            continue
        p = pts_s[lo:hi]
        Xc = p @ Rs[c].T + ts[c]
        uv = (Xc[:, :2] / Xc[:, 2:3]) * [Kmat[0, 0], Kmat[1, 1]] + [Kmat[0, 2], Kmat[1, 2]]
        vis = np.nonzero(
            (Xc[:, 2] > 0.5)
            & (uv[:, 0] > 10) & (uv[:, 0] < cam.width - 10)
            & (uv[:, 1] > 10) & (uv[:, 1] < cam.height - 10)
        )[0]
        rng.shuffle(vis)
        vis = vis[:K_budget]
        k = len(vis)
        xy[c, :k] = uv[vis] + rng.normal(scale=noise_px, size=(k, 2))
        d = desc_s[lo:hi][vis] + desc_noise * rng.normal(size=(k, D))
        desc[c, :k] = d / np.linalg.norm(d, axis=1, keepdims=True)
        valid[c, :k] = True
    return xy, desc, valid, Rs.astype(np.float32), ts.astype(np.float32)


def corridor(n_cams, n_pts, mode="global", use_retrieval=False,
             local_window=0):
    """1000-image-class single-chip end-to-end: sparse corridor scene ->
    flat sweep over all C(N,2) pairs -> reconstruction (``mode`` picks the
    GLOBAL averaging path or the INCREMENTAL engine — the round-4 north-star
    demands both at 1000 cameras). ``use_retrieval`` preselects candidate
    pairs by descriptor retrieval before the sweep (matching/retrieval.py)
    and reports recall against the cached exhaustive-sweep acceptance."""
    import pickle

    from sfm_tpu.config import GlobalInitConfig, RetrievalConfig
    from sfm_tpu.matching.retrieval import select_candidate_pairs

    rng = np.random.default_rng(0)
    t0 = time.time()
    xy, desc, valid, R_gt, t_gt = make_scene_corridor(rng, n_cams, n_pts)
    log("corridor scene: %d cams, %d pts, kps/cam mean %.0f (gen %.1fs)" % (
        n_cams, n_pts, valid.sum(1).mean(), time.time() - t0))
    # Global mode runs only ~3 BA solves: deeper per-solve iteration is the
    # right trade (A/B at 200 cams: 15 it -> 0.518 px, 30 it -> 0.450 px).
    # Incremental keeps periodic BA shallower (it runs O(N/frequency) solves).
    glob = mode == "global"
    # mode="polish": the incremental engine + pose-graph drift correction
    # (GlobalInitConfig.polish) — measures what the averaging polish buys an
    # incremental run on a drift-prone chain vs plain incremental and vs the
    # from-scratch global path.
    cfg = SfMConfig(
        matching=MatchConfig(max_matches=512),
        verify=VerifyConfig(ransac_iters=1024),
        ba=BAConfig(max_iterations=30 if glob else 15,
                    cg_iters=80 if glob else 40,
                    optimize_intrinsics=False, prune_multiplier=3.0,
                    frequency=7, local_window=local_window),
        triangulation=TriangulationConfig(cadence=2),
        global_init=GlobalInitConfig(enabled=glob, polish=(mode == "polish")),
    )
    rcfg = RetrievalConfig(mode="on") if use_retrieval else None
    # The tunnel's remote-compile path fails transiently under load; a flake
    # mid-reconstruction must not lose a completed 16-minute sweep. The cold
    # sweep result (with its recorded wall-clock) is cached on disk, keyed on
    # scene AND the match/verify/retrieval config that produced it;
    # reconstruction attempts retry once on JaxRuntimeError.
    tag = "_retr" if use_retrieval else ""
    sweep_cache = Path("/tmp/corridor_sweep_%d_%d%s_%s.pkl" % (
        n_cams, n_pts, tag, _cfg_tag(cfg.matching, cfg.verify, rcfg)))
    cold_from_cache = sweep_cache.exists()
    # SFM_CORRIDOR_REPS=1 runs the cold pass only: on the CPU backend a
    # 1000-camera incremental rep is hours, and the warm rep measures
    # compile amortization that CPU runs don't need evidence for.
    reps = ("cold", "warm")[: int(os.environ.get("SFM_CORRIDOR_REPS", "2"))]
    for rep in reps:
        if rep == "cold" and sweep_cache.exists():
            with open(sweep_cache, "rb") as f:
                blob = pickle.load(f)
            table, t_sweep = blob["table"], blob["t_sweep"]
            log("cold sweep: %.1fs for %d pairs (%.0f pairs/s) [cached from "
                "previous run]" % (t_sweep, table.num_pairs,
                                   table.num_pairs / t_sweep))
        else:
            t0 = time.time()
            pairs = None
            if use_retrieval:
                pairs, rstats = select_candidate_pairs(desc, valid, n_cams, rcfg)
                log("retrieval: kept %d of %d candidates (%.2f%%) in %.1fs" % (
                    rstats["kept"], rstats["candidates"],
                    100 * rstats["keep_frac"], rstats["seconds"]))
            table = all_pairs_sweep(xy, desc, valid, cfg, pairs=pairs)
            t_sweep = time.time() - t0
            if rep == "cold":
                with open(sweep_cache, "wb") as f:
                    pickle.dump({"table": table, "t_sweep": t_sweep}, f)
        if use_retrieval:
            full_cache = Path("/tmp/corridor_sweep_%d_%d_%s.pkl" % (
                n_cams, n_pts, _cfg_tag(cfg.matching, cfg.verify, None)))
            if full_cache.exists():
                with open(full_cache, "rb") as f:
                    full_tab = pickle.load(f)["table"]
                full_acc = {tuple(full_tab.pairs[p]) for p in full_tab.accepted()}
                got = {tuple(table.pairs[p]) for p in table.accepted()}
                log("retrieval recall vs exhaustive: %d/%d accepted pairs "
                    "(%.2f%%)" % (len(full_acc & got), len(full_acc),
                                  100 * len(full_acc & got) / max(len(full_acc), 1)))
        acc = table.accepted()
        # When the cold rep was served from disk, this process has compiled
        # nothing yet: the "warm" rep's sweep pays first-dispatch compile and
        # must not be reported under the warm label (it would inflate the
        # headline warm number with 1-2 min of server-side compilation).
        sweep_label = rep
        if rep == "warm" and cold_from_cache:
            sweep_label = "warm+compile (cold was disk-cached; first dispatch this process)"
        log("%s sweep: %.1fs for %d pairs (%.0f pairs/s), %d accepted (%.1f%%)" % (
            sweep_label, t_sweep, table.num_pairs, table.num_pairs / t_sweep,
            len(acc), 100.0 * len(acc) / table.num_pairs))
        t0 = time.time()
        for attempt in range(3):
            try:
                sfm = StructureFromMotion(table, xy, cfg)
                res = (sfm.run_global_reconstruction() if glob
                       else sfm.run_reconstruction())
                break
            except Exception as e:  # transient tunnel compile/dispatch flake
                if attempt == 2 or "JaxRuntimeError" not in type(e).__name__:
                    raise
                log("recon attempt %d failed (%s); retrying in 60s" % (
                    attempt + 1, str(e)[:120]))
                time.sleep(60)
        t_rec = time.time() - t0
        s = res.stats
        log("%s %s recon: %.1fs — cams=%d pts=%d err=%.3f tracklen=%.2f" % (
            rep, mode.upper(), t_rec, s["num_cameras"], s["num_points"],
            s["mean_reprojection_error"], s["mean_track_length"]))
        from sfm_tpu.io.calib import evaluate_poses

        ids = res.image_ids
        ev = evaluate_poses(res.rotations, res.translations,
                            R_gt[ids], t_gt[ids])
        log("%s GT accuracy: rot med %.3f deg (max %.2f), ATE %.4f "
            "(%.3f%% of scene)" % (rep, ev["rot_err_deg_median"],
                                   ev["rot_err_deg_max"], ev["ate"],
                                   100 * ev["ate_rel"]))
        log("%s stage_s: %s" % (rep, {k: round(v, 1) for k, v in s["stage_s"].items()}))
        log("%s TOTAL (sweep+recon): %.1fs%s" % (
            rep, t_sweep + t_rec,
            " [sweep leg includes first-dispatch compile]"
            if rep == "warm" and cold_from_cache else ""))


def global_full(n_cams, n_pts):
    """Sweep once (cached to disk), then cold+warm global reconstruction.

    Leaner than main()+global_recon for re-measuring the global path: no
    incremental runs just to produce the pair table.
    """
    import pickle

    rng = np.random.default_rng(0)
    xy, desc, valid = make_scene_cached(rng, n_cams, n_pts)
    log("scene: %d cams, %d pts" % (n_cams, n_pts))
    cfg = SfMConfig(matching=MatchConfig(max_matches=1024),
                    verify=VerifyConfig(ransac_iters=1024))
    # The cached table is only valid for the exact scene AND sweep config
    # that built it — camera count alone cannot distinguish a 512/5000-pt
    # table from the 512/20000-pt one the command line asked for.
    key = (n_cams, n_pts, _cfg_tag(cfg.matching, cfg.verify))
    cache = Path("/tmp/scale_table.pkl")
    if cache.exists():
        with open(cache, "rb") as f:
            blob = pickle.load(f)
        if blob.get("key") == key:
            log("pair table: cached")
        else:
            log("pair table: cache is for %s, want %s — rebuilding" % (
                blob.get("key"), key))
            cache.unlink()
    if not cache.exists():
        t0 = time.time()
        table = all_pairs_sweep(xy, desc, valid, cfg)
        log("sweep: %.1fs for %d pairs, %d accepted" % (
            time.time() - t0, table.num_pairs, len(table.accepted())))
        with open(cache, "wb") as f:
            pickle.dump({"table": table, "xy": xy, "key": key}, f)
    global_recon(n_cams, n_pts)


def global_recon(n_cams, n_pts):
    """Global-SfM reconstruction at scale: averaging init + a handful of
    global BAs instead of O(N) incremental register->BA rounds. Reuses the
    pair table main() saved to /tmp/scale_table.pkl (run main first)."""
    import pickle

    from sfm_tpu.config import GlobalInitConfig

    with open("/tmp/scale_table.pkl", "rb") as f:
        blob = pickle.load(f)
    table, xy = blob["table"], blob["xy"]
    assert xy.shape[0] == n_cams, (xy.shape, n_cams)
    if "key" in blob:  # tables written since the cache got config-keyed
        assert blob["key"][:2] == (n_cams, n_pts), (blob["key"], n_cams, n_pts)
    cfg = SfMConfig(
        ba=BAConfig(max_iterations=30, cg_iters=80, optimize_intrinsics=False,
                    prune_multiplier=3.0),
        global_init=GlobalInitConfig(enabled=True),
    )
    for rep in ("cold", "warm"):
        t0 = time.time()
        sfm = StructureFromMotion(table, xy, cfg)
        res = sfm.run_global_reconstruction()
        s = res.stats
        log("%s GLOBAL recon: %.1fs — cams=%d pts=%d err=%.3f tracklen=%.2f" % (
            rep, time.time() - t0, s["num_cameras"], s["num_points"],
            s["mean_reprojection_error"], s["mean_track_length"]))
        log("%s stage_s: %s" % (rep, {k: round(v, 1) for k, v in s["stage_s"].items()}))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    if len(sys.argv) > 3 and sys.argv[3] == "sweep":
        sweep_only(n, p)
    elif len(sys.argv) > 3 and sys.argv[3] == "ring":
        ring_sweep(n, p)
    elif len(sys.argv) > 3 and sys.argv[3] == "global":
        global_recon(n, p)
    elif len(sys.argv) > 3 and sys.argv[3] == "globalfull":
        global_full(n, p)
    elif len(sys.argv) > 3 and sys.argv[3] == "corridor":
        lw = [int(a[3:]) for a in sys.argv[5:] if a.startswith("lw=")]
        corridor(n, p, mode=sys.argv[4] if len(sys.argv) > 4 else "global",
                 use_retrieval="retrieval" in sys.argv[5:],
                 local_window=lw[0] if lw else 0)
    else:
        main(n, p)
