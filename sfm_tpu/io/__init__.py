"""Host-side I/O: image decoding, stage artifacts, exporters, calibration files."""

from sfm_tpu.io.images import load_image, load_image_gray, load_mask  # noqa: F401
from sfm_tpu.io.calib import load_projection_matrix  # noqa: F401
