"""Mesh construction + sharding helpers."""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices.

    Raises if fewer than ``n_devices`` are available — silently truncating
    would let an "8-device" dry run execute on a 1-device mesh and report
    success (round-1 failure mode).
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are available ({[d.platform for d in devs]}); "
                "force virtual CPU devices via "
                "XLA_FLAGS=--xla_force_host_platform_device_count and "
                'jax.config.update("jax_platforms", "cpu") first'
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def mesh_from_config(cfg) -> Mesh:
    """Build the mesh described by a :class:`~sfm_tpu.config.ShardingConfig`:
    ``mesh_shape=None`` -> all local devices on one ``data_axis``."""
    n = None
    if cfg.mesh_shape is not None:
        if len(cfg.mesh_shape) != 1:
            raise ValueError(
                f"only 1-D meshes are supported (got shape {cfg.mesh_shape}); "
                "every sharded stage partitions a single batch axis"
            )
        n = int(cfg.mesh_shape[0])
    return make_mesh(n, axis=cfg.data_axis)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Shard leading axis over the mesh (pads NOT applied here — callers pad)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(x, sharding)


def replicate(x, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(x, sharding)


def pad_to_multiple(arr, multiple: int, axis: int = 0, fill=0):
    """Pad ``arr`` along ``axis`` so its length is a multiple of ``multiple``."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(arr), widths, constant_values=fill)
