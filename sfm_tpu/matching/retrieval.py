"""Retrieval-based candidate-pair preselection for large scenes.

The reference matches ALL C(N,2) pairs exhaustively (ref
find_matches.py:329-350) — fine at 36 images, but at 1000 images the full
sweep spends ~98% of its work on pairs geometric verification rejects
(corridor-1000: 8,684 of 499,500 candidates accepted = 1.7%). This stage
scores every candidate pair with a cheap proxy — the ratio-test match count
over each image's top-S keypoints (one small matmul per pair, ~1/60 of a
full pair match, no RANSAC, 2 bytes/pair downloaded) — then keeps only
pairs that clear a score threshold or rank among an image's top-k
neighbors (the top-k floor guarantees every image keeps candidates, so
rescue/registration never sees a zero-candidate camera). The full
match+verify sweep runs only on the kept candidates.

This is the TPU analogue of COLMAP's vocab-tree / NetVLAD retrieval
matching modes; the reference has no such stage. Keypoints arriving from
the frontend are response-ordered (features/frontend.py global top_k), so
``desc[:, :S]`` is exactly "the S strongest keypoints".

The scoring matmul deliberately runs at default (bf16) TPU precision:
retrieval scores are approximate by design, and the match-count proxy is
thresholded far above bf16's ±1-2 match jitter.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import RetrievalConfig


@partial(jax.jit, static_argnames=("ratio_threshold",))
def _score_chunk(pairs_chunk, desc_s, valid_s, ratio_threshold: float):
    """(C, 2) pair indices -> (C,) int32 mutual ratio-test match counts.

    desc_s: (N, S, D) subsampled unit descriptors; valid_s: (N, S).
    Same top-2 min-pass structure as matching/core.py, reduced to a count.
    """

    def one(ij):
        d1 = desc_s[ij[0]]
        v1 = valid_s[ij[0]]
        d2 = desc_s[ij[1]]
        v2 = valid_s[ij[1]]
        sim = d1 @ d2.T
        dist = jnp.maximum(2.0 - 2.0 * sim, 0.0)
        dist = jnp.where(v2[None, :], dist, jnp.inf)
        dist = jnp.where(v1[:, None], dist, jnp.inf)
        d_best = jnp.min(dist, axis=1)
        best_j = jnp.argmin(dist, axis=1)
        cols = jnp.arange(dist.shape[1])[None, :]
        d_second = jnp.min(jnp.where(cols == best_j[:, None], jnp.inf, dist), axis=1)
        back = jnp.argmin(dist, axis=0)
        good = (
            (d_best < (ratio_threshold**2) * d_second)
            & v1
            & jnp.isfinite(d_best)
            & (back[best_j] == jnp.arange(d1.shape[0]))
        )
        return good.sum(dtype=jnp.int32)

    return jax.vmap(one)(pairs_chunk)


def retrieval_scores(
    desc,
    valid,
    pairs: np.ndarray,
    config: RetrievalConfig = RetrievalConfig(),
) -> np.ndarray:
    """Mini-match scores for every candidate pair. Returns (P,) int32 host."""
    from sfm_tpu.utils.transfer import device_get_chunked

    # Slice to the top-S subsample BEFORE jnp.asarray: for host-resident
    # descriptors (the scale_bench/engine path) this halves the bytes shipped
    # over the ~40 MB/s tunnel (1000x512x128 f32 = 262 MB -> 131 MB).
    S = min(config.subsample, desc.shape[1])
    desc_s = jnp.asarray(desc[:, :S]).astype(jnp.float32)
    valid_s = jnp.asarray(valid[:, :S])
    pairs = np.asarray(pairs, np.int32)
    P = pairs.shape[0]
    C = config.chunk_size
    pad = (-P) % C
    pairs_padded = np.concatenate([pairs, np.zeros((pad, 2), np.int32)]) if pad else pairs
    pending = []
    for c0 in range(0, P + pad, C):
        chunk = jnp.asarray(pairs_padded[c0 : c0 + C])
        pending.append(
            _score_chunk(chunk, desc_s, valid_s, config.ratio_threshold).astype(jnp.int16)
        )
    merged = jnp.concatenate(pending)[:P]
    return device_get_chunked(merged).astype(np.int32)


def select_pairs_from_scores(
    scores: np.ndarray,
    pairs: np.ndarray,
    num_images: int,
    min_score: int,
    top_k: int,
) -> np.ndarray:
    """Keep mask over ``pairs``: score >= min_score OR in either image's
    top-k scoring neighbors (the connectivity floor)."""
    scores = np.asarray(scores)
    pairs = np.asarray(pairs)
    keep = scores >= min_score
    if top_k > 0:
        # Per-image rank of each incident pair by score (descending),
        # vectorized: duplicate each pair under both endpoints, lexsort by
        # (image, -score), rank = position within the image's group.
        img = np.concatenate([pairs[:, 0], pairs[:, 1]])
        pidx = np.tile(np.arange(len(pairs)), 2)
        order = np.lexsort((-np.tile(scores, 2), img))
        img_sorted = img[order]
        group_start = np.searchsorted(img_sorted, np.arange(num_images))
        ranks = np.arange(len(order)) - group_start[img_sorted]
        keep[pidx[order[ranks < top_k]]] = True
    return keep


def select_pairs_adaptive(
    scores: np.ndarray,
    pairs: np.ndarray,
    num_images: int,
    config: RetrievalConfig = RetrievalConfig(),
):
    """Per-image-calibrated keep mask (round-4 verdict item 7).

    The fixed ``min_score`` was tuned at desc_noise=0.03; under realistic
    descriptor noise the true-pair score distribution shifts down wholesale
    and an absolute bar silently drops verified pairs. This rule calibrates
    on the per-image score distribution: image i's bar is
    ``adaptive_beta`` x (its top_k-th best incident score), and a pair must
    clear only the LOWER of its two endpoint bars. The effective bar is
    clamped to [min_score_floor, min_score], so it can only RELAX the fixed
    threshold — clean-scene selection (where scores are far above the bar)
    is unchanged, while depressed-score regimes keep their true neighbors.
    Returns (keep_mask, median_effective_threshold).
    """
    scores = np.asarray(scores)
    pairs = np.asarray(pairs)
    # k-th best incident score per image, vectorized via the same
    # duplicate-and-rank pass as the top-k floor below.
    img = np.concatenate([pairs[:, 0], pairs[:, 1]])
    sc2 = np.tile(scores, 2)
    order = np.lexsort((-sc2, img))
    img_sorted = img[order]
    group_start = np.searchsorted(img_sorted, np.arange(num_images))
    ranks = np.arange(len(order)) - group_start[img_sorted]
    k = max(config.top_k, 1)
    s_k = np.zeros(num_images, scores.dtype)
    # For each image take the score at rank min(k, count)-1: the k-th best,
    # or its worst incident score when it has fewer than k candidates.
    counts = np.searchsorted(img_sorted, np.arange(num_images), side="right") - group_start
    take = group_start + np.minimum(counts, k) - 1
    nonempty = counts > 0
    s_k[nonempty] = sc2[order][take[nonempty]]
    bar_img = np.clip(config.adaptive_beta * s_k,
                      config.min_score_floor, config.min_score)
    thr = np.minimum(bar_img[pairs[:, 0]], bar_img[pairs[:, 1]])
    keep = scores >= thr
    if config.top_k > 0:
        # Same per-image connectivity floor as the fixed rule: an absurdly
        # high min_score leaves only the top-k contribution.
        keep |= select_pairs_from_scores(scores, pairs, num_images,
                                         np.iinfo(np.int32).max, config.top_k)
    return keep, float(np.median(thr))


def select_candidate_pairs(
    desc,
    valid,
    num_images: int,
    config: RetrievalConfig = RetrievalConfig(),
    pairs: Optional[np.ndarray] = None,
):
    """Score all candidate pairs and return (kept_pairs, stats dict).

    ``desc`` may be host numpy or device-resident; only 2 bytes/pair come
    back to host. ``pairs`` defaults to all (i, j), i < j.
    """
    import time

    from sfm_tpu.matching.sweep import candidate_pairs

    t0 = time.time()
    if config.mode == "sequential":
        kept = sequential_pairs(num_images, config.sequential_window)
        return kept, {
            "candidates": num_images * (num_images - 1) // 2,
            "kept": int(kept.shape[0]),
            "keep_frac": kept.shape[0] / max(num_images * (num_images - 1) // 2, 1),
            "seconds": time.time() - t0,
        }
    if pairs is None:
        pairs = candidate_pairs(num_images)
    scores = retrieval_scores(desc, valid, pairs, config)
    if config.adaptive:
        keep, thr = select_pairs_adaptive(scores, pairs, num_images, config)
    else:
        keep = select_pairs_from_scores(
            scores, pairs, num_images, config.min_score, config.top_k
        )
        thr = float(config.min_score)
    stats = {
        "candidates": int(pairs.shape[0]),
        "kept": int(keep.sum()),
        "keep_frac": float(keep.mean()),
        "threshold_median": thr,
        "seconds": time.time() - t0,
    }
    return pairs[keep], stats


def sequential_pairs(num_images: int, window: int) -> np.ndarray:
    """Candidate pairs for an ORDERED sequence: (i, j) with j - i <= window.

    For video / trajectory captures where overlap is known to be temporal,
    this skips even the retrieval scoring — O(N * window) candidates instead
    of C(N, 2). (COLMAP's "sequential" matching mode; the reference has only
    exhaustive.)
    """
    i = np.repeat(np.arange(num_images), window)
    j = i + np.tile(np.arange(1, window + 1), num_images)
    ok = j < num_images
    return np.stack([i[ok], j[ok]], axis=-1).astype(np.int32)


def retrieval_enabled(config: RetrievalConfig, num_images: int) -> bool:
    if config.mode in ("on", "sequential"):
        return True
    if config.mode == "auto":
        return num_images >= config.auto_min_images
    return False
