"""Multi-device scale-out over a jax.sharding.Mesh.

The two stages worth sharding (SURVEY.md section 5, "long-context" row) are:
  * the O(N^2) pair sweep — shard the pair axis; each device owns a tile of
    the pair grid and runs matching+verification locally (no collectives),
  * bundle adjustment — shard the observation table; XLA's SPMD partitioner
    turns the segment-sums in the Schur matvec into local reductions +
    all-reduce over ICI, while the small camera system stays replicated.

Everything uses sharding annotations + jit (GSPMD): we declare data layout,
XLA inserts the collectives.
"""

from sfm_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
from sfm_tpu.parallel.sweep import sharded_all_pairs_sweep  # noqa: F401
from sfm_tpu.parallel.ba import shard_problem, run_ba_sharded  # noqa: F401
