"""Multi-process / multi-slice execution (SURVEY.md section 5, last row).

Single-process GSPMD (the rest of `sfm_tpu.parallel`) covers one host's
chips. Scaling past a host — TPU pod slices over DCN, or multiple CPU hosts —
needs `jax.distributed`: every process calls :func:`initialize`, after which
`jax.devices()` spans the whole cluster and the existing mesh/sharding code
works unchanged (`make_mesh(total_devices)` sees every chip; GSPMD routes
intra-slice collectives over ICI and inter-slice ones over DCN).

Typical pod-slice launch (one process per host, same program):

    import sfm_tpu.parallel.distributed as dist
    dist.initialize()                       # TPU: autodetects coordinator
    mesh = make_mesh()                      # all chips across all hosts
    table = sharded_all_pairs_sweep(..., mesh)

For DCN-aware layouts (data parallel over slices, model/obs parallel inside
a slice) use :func:`hybrid_mesh`, which builds a 2-D ("slice", "data") mesh
from `jax.experimental.mesh_utils.create_hybrid_device_mesh`.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import jax

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kw,
) -> bool:
    """Initialize jax.distributed for multi-process execution.

    On TPU pods all arguments autodetect from the environment; on CPU/GPU
    clusters pass them explicitly (or set JAX_COORDINATOR_ADDRESS etc.).
    Returns True if distributed mode is active after the call, False when
    running single-process (already-initialized calls are idempotent).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return jax.process_count() > 1
        # Single-process contexts (no coordinator to be found) fall through.
        logger.info("jax.distributed not initialized (%s); single process", e)
        return False
    logger.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_count() > 1


def hybrid_mesh(per_slice: Optional[int] = None, slice_axis: str = "slice",
                data_axis: str = "data"):
    """2-D (slice, data) mesh with DCN on the outer axis and ICI inside.

    ``per_slice``: devices per slice (default: local device count). Shard
    bulk batch axes over ``data_axis`` (ICI collectives); put only
    low-bandwidth reductions on ``slice_axis`` (DCN).
    """
    from jax.sharding import Mesh

    devs = jax.devices()
    if per_slice is None:
        per_slice = jax.local_device_count()
    n_slices = len(devs) // per_slice
    if n_slices * per_slice != len(devs):
        raise ValueError(
            f"{len(devs)} devices do not tile into slices of {per_slice}")
    if n_slices > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (per_slice,), (n_slices,), devices=devs
            ).T  # (n_slices, per_slice)
        except Exception:  # CPU hosts: no slice topology info — plain tiling
            arr = np.array(devs).reshape(n_slices, per_slice)
    else:
        arr = np.array(devs).reshape(1, per_slice)
    return Mesh(arr, (slice_axis, data_axis))
