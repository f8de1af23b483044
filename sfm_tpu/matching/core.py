"""Descriptor matching for one image pair: one matmul + masked reductions.

The Lowe-ratio contract follows ref find_matches.py:141-155 (knn k=2, ratio
0.75); unlike the reference we also offer a mutual (cross-check) test, which
costs one extra argmin over the already-computed distance matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _use_pallas_default() -> bool:
    """Default to the XLA path. Measured on v5e (K=2048, D=128, 32-pair
    chunk): XLA matmul + masked min-passes 22.6 ms/chunk, Pallas fused top-2
    kernel 221 ms — the kernel's per-tile accumulator merges serialize while
    XLA streams the full (K, K) f32 distance tile at HBM bandwidth. The
    kernel stays available (MatchConfig.use_pallas) for K >= 8k where the
    distance matrix cannot materialize; `python bench.py --matcher-mfu`
    reports the measured FLOP rate of both paths."""
    return False


def match_descriptors(
    desc1, valid1, desc2, valid2,
    ratio_threshold: float = 0.75,
    max_matches: int = 1024,
    mutual_check: bool = True,
    use_pallas: bool = None,
    tile_size: int = 128,
):
    """Match two padded descriptor sets.

    desc1: (K1, D) unit-norm; valid1: (K1,); desc2: (K2, D); valid2: (K2,).
    Returns dict:
      idx1, idx2  (M,) int32 indices into the two keypoint sets
      valid       (M,) bool
      distance    (M,) squared L2 descriptor distance
    M = max_matches; surviving matches are ordered best-first.
    """
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    return _match_descriptors(
        desc1, valid1, desc2, valid2,
        ratio_threshold=ratio_threshold,
        max_matches=max_matches,
        mutual_check=mutual_check,
        use_pallas=use_pallas,
        tile_size=tile_size,
    )


@partial(jax.jit, static_argnames=("max_matches", "mutual_check", "use_pallas", "tile_size"))
def _match_descriptors(
    desc1,
    valid1,
    desc2,
    valid2,
    ratio_threshold: float = 0.75,
    max_matches: int = 1024,
    mutual_check: bool = True,
    use_pallas: bool = False,
    tile_size: int = 128,
):
    d1 = jnp.asarray(desc1, jnp.float32)
    d2 = jnp.asarray(desc2, jnp.float32)
    K1 = d1.shape[0]
    K2 = d2.shape[0]
    pallas_ok = use_pallas and K1 % 128 == 0 and K2 % tile_size == 0 and K1 % tile_size == 0

    if pallas_ok:
        # Fused MXU kernel: the (K1, K2) distance matrix never touches HBM.
        from sfm_tpu.ops.match_topk import match_top2_pallas

        s_best, s_second, best_j = match_top2_pallas(d1, d2, valid2, tile_n=tile_size)
        d_best = jnp.maximum(2.0 - 2.0 * s_best, 0.0)
        d_second = jnp.maximum(2.0 - 2.0 * s_second, 0.0)
        d_best = jnp.where(valid1, d_best, _INF)
        if mutual_check:
            b2, _, back = match_top2_pallas(d2, d1, valid1, tile_n=tile_size)
    else:
        # Squared L2 for unit vectors: ||a-b||^2 = 2 - 2 a.b — one matmul.
        sim = d1 @ d2.T
        dist = jnp.maximum(2.0 - 2.0 * sim, 0.0)
        big = jnp.where(valid2[None, :], 0.0, _INF)
        dist = dist + big
        dist = jnp.where(valid1[:, None], dist, _INF)

        # Top-2 smallest along axis 1 via two masked min-passes: lax.top_k
        # lowers to a full sort (measured ~15x the matmul cost at K=2048);
        # min+argmin+mask+min is four linear passes on the VPU.
        d_best = jnp.min(dist, axis=1)
        best_j = jnp.argmin(dist, axis=1)
        cols = jnp.arange(dist.shape[1])[None, :]
        dist2 = jnp.where(cols == best_j[:, None], _INF, dist)
        d_second = jnp.min(dist2, axis=1)
        if mutual_check:
            back = jnp.argmin(dist, axis=0)  # (K2,)

    ratio_ok = d_best < (ratio_threshold**2) * d_second
    good = ratio_ok & valid1 & jnp.isfinite(d_best)

    if mutual_check:
        # j's best partner must be i.
        good = good & (back[best_j] == jnp.arange(K1))

    # Compact to a fixed budget, best (smallest distance) first.
    score = jnp.where(good, -d_best, -_INF)
    k = min(max_matches, score.shape[0])
    top_scores, order = jax.lax.top_k(score, k)
    if k < max_matches:  # pad the budget if there are fewer keypoints than M
        pad = max_matches - k
        top_scores = jnp.concatenate([top_scores, jnp.full((pad,), -_INF, top_scores.dtype)])
        order = jnp.concatenate([order, jnp.zeros((pad,), order.dtype)])
    valid = jnp.isfinite(top_scores)
    idx1 = order.astype(jnp.int32)
    idx2 = best_j[order].astype(jnp.int32)
    return {
        "idx1": jnp.where(valid, idx1, 0),
        "idx2": jnp.where(valid, idx2, 0),
        "valid": valid,
        "distance": jnp.where(valid, -top_scores, 0.0),
    }


def match_pair(feats1, feats2, ratio_threshold=0.75, max_matches=1024, mutual_check=True):
    """Match two :class:`~sfm_tpu.features.Features`; adds matched pixel coords."""
    m = match_descriptors(
        feats1.desc, feats1.valid, feats2.desc, feats2.valid,
        ratio_threshold=ratio_threshold,
        max_matches=max_matches,
        mutual_check=mutual_check,
    )
    m["xy1"] = feats1.xy[m["idx1"]] * m["valid"][:, None]
    m["xy2"] = feats2.xy[m["idx2"]] * m["valid"][:, None]
    return m
