"""PIXEL-level scale benchmark: full pipeline on rendered real-texture images.

Round-4 verdict item 1: every >36-image result rested on idealized synthetic
descriptors. This harness runs the framework's ACTUAL contract —
pixels-to-pointcloud (ref find_matches.py:246-310 + sfm_reconstruction.py) —
at hundreds of images: render_scene.py synthesizes textured 1024x768 views of
a corridor with GT calib, then the public SfMPipeline surface runs
frontend -> retrieval -> sweep -> reconstruction -> GT eval, end to end.

Modes:
  python scripts/image_scale_bench.py 200                  # full pipeline
  python scripts/image_scale_bench.py 200 incremental      # engine choice
  python scripts/image_scale_bench.py 200 global orb       # binary frontend
  python scripts/image_scale_bench.py 200 recall           # retrieval recall
                                          # vs exhaustive on REAL descriptors
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

T0 = time.time()


def log(m):
    print("[%7.1fs] %s" % (time.time() - T0, m), flush=True)


def dataset(n):
    from render_scene import render_dataset

    return render_dataset(f"/tmp/pixel_corridor_{n}", n, log=log)


def full(n, mode="global", kind="sift", fast_threshold=None):
    from sfm_tpu.config import (SfMConfig, FeatureConfig, MatchConfig,
                                VerifyConfig, BAConfig, TriangulationConfig,
                                GlobalInitConfig, RetrievalConfig)
    from sfm_tpu.pipeline import SfMPipeline, PipelineArgs

    data = dataset(n)
    glob = mode == "global"
    # The rendered textures are lower-contrast than bunny photos; the
    # binary path's absolute FAST contrast gate (reference parity: 20/255)
    # needs lowering here or the pair graph starves (measured at 200 imgs:
    # thr=20 -> 118 accepted pairs = garbage averaging input; thr=10 ->
    # 1,237 accepted). SIFT's normalized DoG gate needs no such tuning.
    fkw = {} if fast_threshold is None else {"fast_threshold": fast_threshold}
    # Single-chip HBM scaling: at ~500 dense-texture images a 512-match
    # budget yields ~1.7M BA observations, which is past what one 16 GB
    # chip's global BA holds (measured: compile-OOM at 22.25 GB, then a
    # runtime worker crash at the edge after the Jacobian chunking fix).
    # 256 matches/pair halves the observation load at equal pair coverage;
    # scenes beyond that belong on the obs-sharded multi-chip BA
    # (parallel/run_ba_sharded).
    mm = 512 if n < 400 else 256
    cfg = SfMConfig(
        features=FeatureConfig(kind=kind, **fkw),
        matching=MatchConfig(max_matches=mm),
        verify=VerifyConfig(ransac_iters=1024),
        ba=BAConfig(max_iterations=30 if glob else 15,
                    cg_iters=80 if glob else 40,
                    optimize_intrinsics=False, prune_multiplier=3.0,
                    frequency=7,
                    # Restricted windowed periodic BA for the incremental
                    # modes (on-chip A/B in PROGRESS round 5: faster AND
                    # more accurate); final BA stays global.
                    local_window=0 if glob else 16),
        triangulation=TriangulationConfig(cadence=2),
        global_init=GlobalInitConfig(enabled=glob, polish=(mode == "polish")),
        retrieval=RetrievalConfig(mode="auto"),
    )
    for rep in ("cold", "warm"):
        out = Path(f"/tmp/pixel_out_{n}_{mode}_{kind}_{rep}")
        args = PipelineArgs(data_dir=str(data), output_dir=str(out),
                            use_mask=False, num_images=n,
                            export_colmap=False, export_meshlab=False)
        pipe = SfMPipeline(args, cfg)
        t0 = time.time()
        ok = pipe.run_preprocessing()
        t_pre = time.time() - t0
        assert ok, "preprocess failed"
        acc = pipe.matcher.table.accepted()
        log("%s preprocess: %.1fs — %d candidate pairs swept, %d accepted" % (
            rep, t_pre, pipe.matcher.table.num_pairs, len(acc)))
        t0 = time.time()
        ok = pipe.run_reconstruction()
        t_rec = time.time() - t0
        assert ok, "reconstruction failed"
        s = pipe.result.stats
        log("%s %s recon: %.1fs — cams=%d/%d pts=%d err=%.3fpx tracklen=%.2f" % (
            rep, mode.upper(), t_rec, s["num_cameras"], n, s["num_points"],
            s["mean_reprojection_error"], s["mean_track_length"]))
        if "gt_rot_err_deg_median" in s:
            log("%s GT: rot med %.3f deg (max %.2f), ATE %.4f (%.3f%% of scene)" % (
                rep, s["gt_rot_err_deg_median"], s.get("gt_rot_err_deg_max", -1),
                s["gt_ate"], 100 * s["gt_ate_rel"]))
        log("%s stage_s: %s" % (
            rep, {k: round(v, 1) for k, v in s.get("stage_s", {}).items()}))
        log("%s TOTAL: %.1fs (preprocess %.1f + recon %.1f)" % (
            rep, t_pre + t_rec, t_pre, t_rec))
        rec = {"n": n, "mode": mode, "kind": kind, "rep": rep,
               "t_preprocess_s": round(t_pre, 1), "t_recon_s": round(t_rec, 1),
               "pairs_swept": int(pipe.matcher.table.num_pairs),
               "pairs_accepted": len(acc),
               "cams": int(s["num_cameras"]), "points": int(s["num_points"]),
               "err_px": round(float(s["mean_reprojection_error"]), 3),
               "gt_rot_med_deg": round(float(s.get("gt_rot_err_deg_median", -1)), 3),
               "gt_ate_rel_pct": round(100 * float(s.get("gt_ate_rel", -1)), 3)}
        print("RESULT " + json.dumps(rec), flush=True)


def recall(n, kind="sift"):
    """Retrieval recall measured against the exhaustive sweep on the SAME
    real-image descriptors (round-4 verdict: recall had only ever been
    measured on idealized synthetic descriptors)."""
    from sfm_tpu.config import (SfMConfig, FeatureConfig, MatchConfig,
                                VerifyConfig, RetrievalConfig,
                                effective_retrieval_config)
    from sfm_tpu.matching.api import ImageMatcher
    from sfm_tpu.matching import all_pairs_sweep
    from sfm_tpu.matching.retrieval import select_candidate_pairs

    data = dataset(n)
    cfg = SfMConfig(features=FeatureConfig(kind=kind),
                    matching=MatchConfig(max_matches=512),
                    verify=VerifyConfig(ransac_iters=1024),
                    retrieval=RetrievalConfig(mode="on"))
    m = ImageMatcher(data, cfg, output_dir=Path(f"/tmp/pixel_recall_{n}_{kind}"))
    t0 = time.time()
    feats = m.detect_all(use_mask=False)
    log("detect: %.1fs (%d imgs, mean %d kps)" % (
        time.time() - t0, len(m.image_paths),
        int(feats["valid"].sum(1).mean())))
    t0 = time.time()
    kept, rstats = select_candidate_pairs(
        feats["desc"], feats["valid"], n, effective_retrieval_config(cfg))
    log("retrieval: kept %d/%d (%.2f%%) in %.1fs" % (
        rstats["kept"], rstats["candidates"], 100 * rstats["keep_frac"],
        time.time() - t0))
    t0 = time.time()
    table_full = all_pairs_sweep(feats["xy"], feats["desc"], feats["valid"], cfg)
    log("exhaustive sweep: %.1fs (%d pairs, %d accepted)" % (
        time.time() - t0, table_full.num_pairs, len(table_full.accepted())))
    t0 = time.time()
    table_r = all_pairs_sweep(feats["xy"], feats["desc"], feats["valid"], cfg,
                              pairs=kept)
    log("retrieval sweep: %.1fs (%d pairs, %d accepted)" % (
        time.time() - t0, table_r.num_pairs, len(table_r.accepted())))
    full_acc = {tuple(table_full.pairs[p]) for p in table_full.accepted()}
    got = {tuple(table_r.pairs[p]) for p in table_r.accepted()}
    rec = len(full_acc & got) / max(len(full_acc), 1)
    log("RECALL on real descriptors: %d/%d accepted pairs (%.2f%%)" % (
        len(full_acc & got), len(full_acc), 100 * rec))
    print("RESULT " + json.dumps(
        {"n": n, "kind": kind, "metric": "retrieval_recall_real_pixels",
         "recall": round(rec, 4), "kept_frac": round(rstats["keep_frac"], 4),
         "exhaustive_accepted": len(full_acc),
         "retrieval_accepted": len(got)}), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rest = sys.argv[2:]
    if rest and rest[0] == "recall":
        recall(n, kind=rest[1] if len(rest) > 1 else "sift")
    else:
        full(n, mode=rest[0] if rest else "global",
             kind=rest[1] if len(rest) > 1 else "sift",
             fast_threshold=float(rest[2]) if len(rest) > 2 else None)
