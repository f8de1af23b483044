"""Retrieval scoring sharded over the device mesh.

Candidate-pair preselection (matching/retrieval.py) is embarrassingly
parallel over pairs — the same shape as the sharded sweep: each device owns
a tile of the pair list, the subsampled descriptor stack is replicated
(N * S * D floats — 128 MB at corridor-1000 defaults), and only the 2-byte
per-pair scores cross back. Zero collectives in the hot path.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sfm_tpu.config import RetrievalConfig
from sfm_tpu.matching.retrieval import (
    _score_chunk,
    select_pairs_from_scores,
)
from sfm_tpu.matching.sweep import candidate_pairs
from sfm_tpu.parallel.mesh import pad_to_multiple


def sharded_retrieval_scores(
    desc,
    valid,
    pairs: np.ndarray,
    mesh,
    config: RetrievalConfig = RetrievalConfig(),
    pairs_per_device: int = 1024,
    feature_kind: str = "sift",
) -> np.ndarray:
    """`retrieval_scores` with the pair axis sharded over ``mesh``.

    ``feature_kind`` maps ``config.ratio_threshold`` into the scorer's
    squared-L2 metric (config.map_ratio_for_kind) — binary (orb) callers
    must pass it or the Hamming ratio silently tightens to r^2. The
    single-device path gets the same mapping from
    ``config.effective_retrieval_config`` at its call site
    (matching/api.py); this parallel twin has no SfMConfig in scope, so the
    kind travels as an argument.
    """
    import dataclasses

    from sfm_tpu.config import map_ratio_for_kind

    config = dataclasses.replace(
        config,
        ratio_threshold=map_ratio_for_kind(config.ratio_threshold, feature_kind),
    )
    axis = mesh.axis_names[0]
    chunk = pairs_per_device * mesh.devices.size

    # Slice to the top-S subsample BEFORE jnp.asarray — host-resident
    # descriptor stacks should ship only the bytes the scorer reads.
    S = min(config.subsample, desc.shape[1])
    desc_s = jnp.asarray(desc[:, :S]).astype(jnp.float32)
    valid_s = jnp.asarray(valid[:, :S])

    pairs = np.asarray(pairs, np.int32)
    Pn = pairs.shape[0]
    pairs_padded = pad_to_multiple(pairs, chunk)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda pc, d, v: _score_chunk(pc, d, v, config.ratio_threshold).astype(
            jnp.int16
        ),
        in_shardings=(shard, repl, repl),
        out_shardings=repl,
    )
    desc_r = jax.device_put(desc_s, repl)
    valid_r = jax.device_put(valid_s, repl)
    outs = []
    for c0 in range(0, pairs_padded.shape[0], chunk):
        pc = jax.device_put(jnp.asarray(pairs_padded[c0 : c0 + chunk]), shard)
        outs.append(np.asarray(fn(pc, desc_r, valid_r)))
    return np.concatenate(outs)[:Pn].astype(np.int32)


def sharded_select_candidate_pairs(
    desc,
    valid,
    num_images: int,
    mesh,
    config: RetrievalConfig = RetrievalConfig(),
    pairs: Optional[np.ndarray] = None,
    pairs_per_device: int = 1024,
    feature_kind: str = "sift",
):
    """`select_candidate_pairs` with scoring sharded over ``mesh``
    (``feature_kind``: see sharded_retrieval_scores)."""
    import time

    t0 = time.time()
    if pairs is None:
        pairs = candidate_pairs(num_images)
    scores = sharded_retrieval_scores(
        desc, valid, pairs, mesh, config, pairs_per_device, feature_kind
    )
    keep = select_pairs_from_scores(
        scores, pairs, num_images, config.min_score, config.top_k
    )
    stats = {
        "candidates": int(pairs.shape[0]),
        "kept": int(keep.sum()),
        "keep_frac": float(keep.mean()),
        "seconds": time.time() - t0,
    }
    return pairs[keep], stats
