"""Multi-device scale-out over a jax.sharding.Mesh.

The two stages worth sharding (SURVEY.md section 5, "long-context" row) are:
  * the O(N^2) pair sweep — two shardings: `sharded_all_pairs_sweep` shards
    the pair axis (features replicated; fastest at small N), and
    `ring_all_pairs_sweep` shards the FEATURES, exchanging descriptor blocks
    around the ring via ppermute (constant per-device memory; the scale
    path — the all-pairs analogue of ring attention),
  * bundle adjustment — shard the observation table; XLA's SPMD partitioner
    turns the segment-sums in the Schur matvec into local reductions +
    all-reduce over ICI, while the small camera system stays replicated.

Everything uses sharding annotations + jit/shard_map: we declare data
layout, XLA inserts or we place the collectives.
"""

from sfm_tpu.parallel.mesh import make_mesh, mesh_from_config, shard_batch, replicate  # noqa: F401
from sfm_tpu.parallel.sweep import sharded_all_pairs_sweep  # noqa: F401
from sfm_tpu.parallel.retrieval import (  # noqa: F401
    sharded_retrieval_scores,
    sharded_select_candidate_pairs,
)
from sfm_tpu.parallel.ring import ring_all_pairs_sweep, extract_pair_artifacts  # noqa: F401
from sfm_tpu.parallel.ba import shard_problem, run_ba_sharded  # noqa: F401
from sfm_tpu.parallel.distributed import initialize as init_distributed, hybrid_mesh  # noqa: F401
