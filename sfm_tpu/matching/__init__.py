"""All-pairs descriptor matching + geometric verification, batched on device.

Replaces the reference's per-pair Python loop over cv2.BFMatcher knn +
cv2.findFundamentalMat (ref find_matches.py:141-155, :246-310): descriptor
distances are one matmul per pair tile (MXU), top-2 + Lowe ratio + mutual
check are masked reductions, and verification is the vmapped fixed-budget
F-RANSAC — the whole O(N^2) sweep runs as a few fused programs over a padded
pair table, shardable over a device mesh.
"""

from sfm_tpu.matching.core import match_pair, match_descriptors  # noqa: F401
from sfm_tpu.matching.verify import verify_pair, match_and_verify  # noqa: F401
from sfm_tpu.matching.sweep import all_pairs_sweep, PairTable  # noqa: F401
from sfm_tpu.matching.retrieval import (  # noqa: F401
    retrieval_enabled,
    retrieval_scores,
    select_candidate_pairs,
)
