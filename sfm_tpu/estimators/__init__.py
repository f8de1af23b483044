"""Batched robust estimators: fixed-budget vmapped RANSAC instantiated for
fundamental-matrix estimation, PnP, and pose recovery.

Replaces cv2.findFundamentalMat (ref find_matches.py:282) and
cv2.solvePnPRansac (ref sfm_reconstruction.py:246-255) with data-independent
control flow: a static hypothesis budget, masked inlier counting, and argmax
selection — the shapes never depend on the data, so everything jits once and
vmaps over pairs/images.
"""

from sfm_tpu.estimators.ransac import ransac_sample_indices  # noqa: F401
from sfm_tpu.estimators.fundamental import estimate_fundamental_ransac  # noqa: F401
from sfm_tpu.estimators.pnp import pnp_dlt, pnp_ransac, refine_pose_gn  # noqa: F401
