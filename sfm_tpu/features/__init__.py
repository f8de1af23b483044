"""SIFT-class feature frontend, TPU-native.

Replaces the reference's FAST+ORB frontend (ref find_matches.py:74-139) with a
DoG detector + 128-D gradient-histogram descriptor built entirely from batched
array ops: the pyramid is separable convolutions (MXU/VPU), extremum detection
is elementwise comparisons on the full grid, subpixel refinement is a
closed-form 3x3 solve evaluated on the whole grid, and the descriptor is an
einsum with *static* spatial-bin weights so it rides the MXU. Keypoint count
is fixed per image (top-k + validity mask) so the downstream all-pairs matcher
sees static shapes.

Capability parity notes (SURVEY.md section 7 step 3): float descriptors swap
ORB's Hamming distance for a dot-product distance, keeping the k=2 + Lowe
ratio contract (ref find_matches.py:141-155); silhouette-mask gating keeps the
reference's semantics (ref find_matches.py:120-137).
"""

from sfm_tpu.features.frontend import (  # noqa: F401
    detect_and_describe,
    detect_and_describe_batch,
    Features,
)
from sfm_tpu.features.pyramid import build_pyramid, gaussian_blur  # noqa: F401
