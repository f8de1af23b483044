"""Retrieval + gate robustness under realistic descriptor degradation.

Round-4 verdict weak #2 / next-round item 7: RetrievalConfig.min_score=8,
top_k=10 and the verification gates were tuned on bunny + idealized corridors
(desc_noise=0.03, no repeated texture). This harness sweeps descriptor noise
and repeated-texture fraction on the corridor scene and measures, for each
degradation level:

  - retrieval recall vs the exhaustive sweep's accepted-pair set (the metric
    that matters: which VERIFIED pairs would preselection have dropped)
  - the recall/keep-frac trade across a grid of (min_score, top_k) — scored
    ONCE per scene; thresholding is host-side replay, so the grid is free
  - the adaptive per-image threshold (select_pairs_adaptive) vs the fixed
    default on the same scores

Usage: python scripts/retrieval_stress.py [n_cams] [n_pts]
Writes one JSON line per (noise, repeat) config to stdout ("CURVE ...").
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from sfm_tpu.config import SfMConfig, MatchConfig, VerifyConfig, RetrievalConfig
from sfm_tpu.matching import all_pairs_sweep
from sfm_tpu.matching.sweep import candidate_pairs
from sfm_tpu.matching.retrieval import (retrieval_scores,
                                        select_pairs_from_scores)
from scale_bench import make_scene_corridor

T0 = time.time()


def log(m):
    print("[%7.1fs] %s" % (time.time() - T0, m), flush=True)


def run_config(n_cams, n_pts, desc_noise, repeat_frac, cfg, rcfg):
    rng = np.random.default_rng(7)
    xy, desc, valid, R_gt, t_gt = make_scene_corridor(
        rng, n_cams, n_pts, desc_noise=desc_noise, repeat_frac=repeat_frac)
    pairs = candidate_pairs(n_cams)
    t0 = time.time()
    scores = retrieval_scores(desc, valid, pairs, rcfg)
    t_score = time.time() - t0
    t0 = time.time()
    table = all_pairs_sweep(xy, desc, valid, cfg)
    t_sweep = time.time() - t0
    acc_idx = table.accepted()
    acc = {tuple(table.pairs[p]) for p in acc_idx}
    log("noise=%.2f repeat=%.2f: %d/%d pairs accepted by exhaustive sweep "
        "(score %.0fs, sweep %.0fs)" % (desc_noise, repeat_frac, len(acc),
                                        len(pairs), t_score, t_sweep))
    out = {"desc_noise": desc_noise, "repeat_frac": repeat_frac,
           "candidates": int(len(pairs)), "exhaustive_accepted": len(acc),
           "grid": []}
    if not acc:
        return out
    pair_tuples = [tuple(p) for p in pairs]
    acc_mask = np.array([t in acc for t in pair_tuples])
    for min_score in (4, 8, 12):
        for top_k in (5, 10):
            keep = select_pairs_from_scores(scores, pairs, n_cams,
                                            min_score, top_k)
            rec = float(acc_mask[keep].sum() / acc_mask.sum())
            out["grid"].append({"min_score": min_score, "top_k": top_k,
                                "keep_frac": round(float(keep.mean()), 4),
                                "recall": round(rec, 4)})
    from sfm_tpu.matching.retrieval import select_pairs_adaptive

    keep_a, thr = select_pairs_adaptive(scores, pairs, n_cams, rcfg)
    rec_a = float(acc_mask[keep_a].sum() / acc_mask.sum())
    out["adaptive"] = {"keep_frac": round(float(keep_a.mean()), 4),
                       "recall": round(rec_a, 4),
                       "threshold": round(float(thr), 2)}
    return out


def main(n_cams=200, n_pts=8000):
    cfg = SfMConfig(matching=MatchConfig(max_matches=512),
                    verify=VerifyConfig(ransac_iters=1024))
    rcfg = RetrievalConfig(mode="on")
    # desc_noise is PER-COMPONENT sigma: same-point descriptor distance is
    # ~16*sigma, chance (inter-point) distance ~1.41 — so 0.09 is the
    # matching-impossible ceiling and 0.05-0.08 is the degradation band
    # (first sweep of this harness used 0.15-0.45 and found the exhaustive
    # sweep itself accepts zero pairs there: that measured the ceiling, not
    # retrieval).
    for desc_noise, repeat_frac in [
        (0.03, 0.0),   # the idealized regime every prior number used
        (0.05, 0.0),
        (0.06, 0.0),
        (0.07, 0.0),
        (0.08, 0.0),
        (0.03, 0.25),  # quarter of the texture repeats across the scene
        (0.06, 0.25),  # both degradations at once
        (0.06, 0.50),
    ]:
        out = run_config(n_cams, n_pts, desc_noise, repeat_frac, cfg, rcfg)
        print("CURVE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8000)
