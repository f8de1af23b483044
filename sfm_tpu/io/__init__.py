"""Host-side I/O: image decoding, stage artifacts, exporters, calibration files."""

from sfm_tpu.io.images import load_image, load_image_gray, load_mask  # noqa: F401
from sfm_tpu.io.calib import (  # noqa: F401
    evaluate_poses, load_gt_poses, load_projection_matrix, umeyama,
)
