"""Pair sweep sharded over the device mesh.

Each device owns a contiguous tile of the (padded) pair list; features are
replicated (they are small: N*K*(D+3) floats). Matching + verification run
embarrassingly parallel — zero collectives in the hot path; only the final
summary gather crosses devices.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sfm_tpu.config import SfMConfig
from sfm_tpu.matching.sweep import (
    PairTable,
    candidate_pairs,
    _sweep_chunk_fn,
)
from sfm_tpu.parallel.mesh import pad_to_multiple


def sharded_all_pairs_sweep(
    xy,
    desc,
    valid,
    mesh=None,
    config: SfMConfig = SfMConfig(),
    pairs: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    pairs_per_device: int = 16,
) -> PairTable:
    """all_pairs_sweep with the pair axis sharded over ``mesh``.

    ``mesh=None`` builds the mesh from ``config.sharding``. The chunk program
    is identical to the single-device sweep; sharding is declared on its
    batch inputs and GSPMD partitions the vmap.
    """
    if mesh is None:
        from sfm_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(config.sharding)
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    chunk = pairs_per_device * n_dev

    xy = jnp.asarray(xy)
    desc = jnp.asarray(desc)
    valid = jnp.asarray(valid)
    n = xy.shape[0]
    if pairs is None:
        pairs = candidate_pairs(n)
    pairs = np.asarray(pairs, np.int32)
    Pn = pairs.shape[0]
    if key is None:
        key = jax.random.key(config.seed)

    pairs_padded = pad_to_multiple(pairs, chunk)
    keys = jax.random.split(key, pairs_padded.shape[0])

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    base_fn = _sweep_chunk_fn(config)
    fn = jax.jit(
        base_fn,
        in_shardings=(shard, shard, repl, repl, repl),
        out_shardings=repl,
    )

    xy_r = jax.device_put(xy, repl)
    desc_r = jax.device_put(desc, repl)
    valid_r = jax.device_put(valid, repl)

    outs = []
    for c0 in range(0, pairs_padded.shape[0], chunk):
        out = fn(
            jax.device_put(keys[c0 : c0 + chunk], shard),
            jax.device_put(jnp.asarray(pairs_padded[c0 : c0 + chunk]), shard),
            xy_r, desc_r, valid_r,
        )
        outs.append(jax.tree.map(np.asarray, out))

    merged = jax.tree.map(lambda *xs: np.concatenate(xs)[:Pn], *outs)
    return PairTable(
        pairs=pairs,
        accept=merged["accept"],
        num_matches=merged["num_matches"],
        num_inliers=merged["num_inliers"],
        inlier_ratio=merged["inlier_ratio"],
        reprojection_error=merged["reprojection_error"],
        well_distributed=merged["well_distributed"],
        F=merged["F"],
        xy1=merged["xy1"],
        xy2=merged["xy2"],
        idx1=merged["idx1"],
        idx2=merged["idx2"],
        match_valid=merged["match_valid"],
        inliers=merged["inliers"],
    )
