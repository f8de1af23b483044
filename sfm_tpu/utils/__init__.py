"""Shared utilities: precision control, logging, profiling."""

from sfm_tpu.utils.precision import f32_matmuls  # noqa: F401
