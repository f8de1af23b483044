"""Bundle adjustment: sparse Levenberg-Marquardt on TPU.

Replaces the reference's scipy.optimize.least_squares TRF with a dense
finite-difference Jacobian (ref sfm_reconstruction.py:401-549 — its
scalability wall, SURVEY.md section 3.4) with the classical large-scale BA
pipeline expressed as fixed-shape array programs:

  * analytic per-observation Jacobians (vmapped jax.jacfwd on the 2-vector
    residual — exact, no finite differences),
  * robust Huber IRLS weighting (the reference used huber loss too, :511),
  * block-sparse normal equations assembled by segment-sums over a flat
    observation table (never materialized),
  * Schur complement onto the camera system, applied *matrix-free*: one
    S-matvec costs O(observations) segment ops,
  * block-Jacobi preconditioned conjugate gradients on the reduced system,
  * damped accept/reject LM outer loop in lax.while_loop.

Shared intrinsics (fx, fy, cx, cy) are an optional extra 4-parameter block in
the reduced system, with the reference's regularization intent
(anchor to init / fx~fy / principal point, weight 0.1 — ref :489-501).
Everything is shaped (C_max, P_max, O_max) with validity masks, so one compile
serves the whole incremental reconstruction as the scene grows.
"""

from sfm_tpu.ba.problem import BAProblem  # noqa: F401
from sfm_tpu.ba.lm import run_ba  # noqa: F401
from sfm_tpu.ba.blocked import (  # noqa: F401
    BlockedBAProblem,
    build_blocked_problem,
    run_ba_blocked,
)
