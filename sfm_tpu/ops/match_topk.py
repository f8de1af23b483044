"""Fused descriptor-distance top-2 kernel.

The jnp matcher (matching/core.py) materializes the full (K1, K2) distance
matrix in HBM, then runs top_k over it — for K=2048 that is a 16 MB
round-trip per pair, pure HBM-bandwidth waste. This kernel runs a 2-D grid
over (desc1 row-tiles x desc2 col-tiles): each step computes one similarity
tile on the MXU and folds it into running (best, second, argbest)
accumulators that live in the output VMEM blocks, so the distance matrix
never exists anywhere. Pallas pipelines the desc2 tile streaming HBM->VMEM
behind the matmul.

Distance = squared L2 on unit-norm descriptors = 2 - 2*sim; the kernel
tracks max similarity (equivalent, cheaper). All buffers are >= 2-D (TPU
vector layout; 1-D dynamic slices cannot prove alignment).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def match_top2_reference(desc1, desc2, valid2):
    """jnp reference: returns (best_sim, second_sim, best_idx) per desc1 row."""
    sim = desc1 @ desc2.T
    sim = jnp.where(valid2[None, :], sim, _NEG)
    top2, idx = jax.lax.top_k(sim, 2)
    return top2[:, 0], top2[:, 1], idx[:, 0].astype(jnp.int32)


def _kernel(d1_ref, d2_ref, v2_ref, best_ref, second_ref, idx_ref, *, tile_n: int):
    """Grid step (i, j): desc1 tile i vs desc2 tile j, merged into outputs."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, _NEG)
        second_ref[:] = jnp.full_like(second_ref, _NEG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    sim = jax.lax.dot_general(
        d1_ref[:], d2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (tile_m, tile_n)
    sim = jnp.where(v2_ref[:, 0][None, :] > 0, sim, _NEG)
    offs = j * tile_n

    # Tile-local top-2.
    t_best = jnp.max(sim, axis=1, keepdims=True)               # (tile_m, 1)
    t_arg = jnp.argmax(sim, axis=1).astype(jnp.int32)[:, None] + offs
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + offs
    sim2 = jnp.where(cols == t_arg, _NEG, sim)
    t_second = jnp.max(sim2, axis=1, keepdims=True)

    # Merge with the running accumulators.
    best = best_ref[:]
    second = second_ref[:]
    bidx = idx_ref[:]
    take = t_best > best
    best_ref[:] = jnp.maximum(best, t_best)
    idx_ref[:] = jnp.where(take, t_arg, bidx)
    second_ref[:] = jnp.where(
        take, jnp.maximum(best, t_second), jnp.maximum(second, t_best)
    )


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def match_top2_pallas(desc1, desc2, valid2, tile_m: int = 128, tile_n: int = 128,
                      interpret: bool = False):
    """Top-2 similarity search: desc1 (K1, D) against desc2 (K2, D).

    K1 % tile_m == 0 and K2 % tile_n == 0 required (pad + mask upstream).
    Returns (best_sim (K1,), second_sim (K1,), best_idx (K1,) int32).
    """
    K1, D = desc1.shape
    K2 = desc2.shape[0]
    assert K1 % tile_m == 0 and K2 % tile_n == 0, (K1, K2, tile_m, tile_n)

    v2 = valid2.astype(jnp.int32)[:, None]       # (K2, 1): 2-D for TPU layout

    grid = (K1 // tile_m, K2 // tile_n)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K1, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1, 1), jnp.float32),
            jax.ShapeDtypeStruct((K1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * K1 * K2 * D, bytes_accessed=(K1 + K2) * D * 4, transcendentals=0
        ),
        interpret=interpret,
    )(desc1, desc2, v2)
    return out[0][:, 0], out[1][:, 0], out[2][:, 0]
