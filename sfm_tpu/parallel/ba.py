"""Bundle adjustment sharded over the observation axis.

The BA problem's observation table (obs_cam/obs_point/obs_xy/obs_valid) is
sharded over the mesh; cameras, points, and intrinsics are replicated. Under
jit, XLA's SPMD partitioner lowers every segment-sum in the Schur matvec to a
local segment-sum + all-reduce (psum) over ICI, and the per-observation
Jacobian work — the O(obs) bulk of each LM iteration — runs fully parallel.
The reduced camera system (6C+4 floats) is tiny and replicated, so the PCG
loop adds no cross-device traffic beyond the matvec reductions.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from sfm_tpu.config import BAConfig
from sfm_tpu.ba.problem import BAProblem
from sfm_tpu.ba.lm import run_ba
from sfm_tpu.parallel.mesh import pad_to_multiple


def shard_problem(problem: BAProblem, mesh) -> BAProblem:
    """Pad the obs table to the mesh size and lay it out over the devices."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    obs_cam = pad_to_multiple(np.asarray(problem.obs_cam), n_dev)
    obs_point = pad_to_multiple(np.asarray(problem.obs_point), n_dev)
    obs_xy = pad_to_multiple(np.asarray(problem.obs_xy), n_dev)
    obs_valid = pad_to_multiple(np.asarray(problem.obs_valid), n_dev)

    return BAProblem(
        rvec=jax.device_put(problem.rvec, repl),
        tvec=jax.device_put(problem.tvec, repl),
        cam_valid=jax.device_put(problem.cam_valid, repl),
        cam_fixed=jax.device_put(problem.cam_fixed, repl),
        intr=jax.device_put(problem.intr, repl),
        points=jax.device_put(problem.points, repl),
        point_valid=jax.device_put(problem.point_valid, repl),
        obs_cam=jax.device_put(obs_cam, shard),
        obs_point=jax.device_put(obs_point, shard),
        obs_xy=jax.device_put(obs_xy, shard),
        obs_valid=jax.device_put(obs_valid, shard),
    )


def run_ba_sharded(
    problem: BAProblem,
    mesh=None,
    config: BAConfig = BAConfig(),
    optimize_intrinsics: bool = True,
    sharding=None,
):
    """run_ba with the observation axis sharded over ``mesh``.

    ``mesh=None`` builds the mesh from ``sharding`` (a ShardingConfig;
    defaults to all local devices). The LM program itself is unchanged —
    sharding is purely a data-layout declaration; GSPMD inserts the
    collectives.
    """
    if mesh is None:
        from sfm_tpu.config import ShardingConfig
        from sfm_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(sharding if sharding is not None else ShardingConfig())
    sharded = shard_problem(problem, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _null():
        out, stats = run_ba(
            sharded, config, optimize_intrinsics=optimize_intrinsics
        )
    return out, stats


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
