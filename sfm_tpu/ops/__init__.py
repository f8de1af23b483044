"""Pallas TPU kernels for the hot ops.

These are the fused, hand-scheduled versions of inner loops the rest of the
framework expresses in jnp. Each kernel has a jnp reference implementation in
its module and a parity test; callers select via config/flags so CPU tests
and TPU production share one code path shape.
"""

from sfm_tpu.ops.match_topk import match_top2_pallas, match_top2_reference  # noqa: F401
