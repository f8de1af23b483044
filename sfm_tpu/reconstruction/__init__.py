"""Incremental reconstruction: host-orchestrated decisions, device-resident math.

The sequential decisions (seed choice, next-best-view, accept/reject)
live on the host over small summary tables; the heavy math (PnP RANSAC,
multi-view triangulation, bundle adjustment) runs as fixed-shape jitted
programs (SURVEY.md section 7 step 5).
"""

from sfm_tpu.reconstruction.tracks import build_tracks, TrackTable  # noqa: F401
from sfm_tpu.reconstruction.incremental import StructureFromMotion, ReconstructionResult  # noqa: F401
from sfm_tpu.reconstruction.global_init import (  # noqa: F401
    global_poses,
    rotation_averaging,
    translation_averaging,
)
