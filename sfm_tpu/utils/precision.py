"""Matmul precision control.

TPU matmuls default to bfloat16 accumulation, which is exactly right for the
bulk compute (descriptor distance matmuls) and exactly wrong for small-matrix
geometry (rotations, normal equations, DLT systems) where 1e-3 relative error
breaks downstream RANSAC/BA. Geometry-core functions are wrapped with
:func:`f32_matmuls` so their dot/einsum ops always run in full float32,
regardless of the global default; hot kernels opt into bf16 explicitly at
their own call sites.
"""
from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: run ``fn``'s matmuls/einsums with float32 MXU passes."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
