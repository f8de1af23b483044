"""Batched differentiable 3-D geometry core (pure jnp — the base everything vmaps over)."""

from sfm_tpu.geometry.rotations import (  # noqa: F401
    rodrigues,
    rotation_to_rvec,
    quaternion_from_matrix,
    matrix_from_quaternion,
    skew,
)
from sfm_tpu.geometry.projection import (  # noqa: F401
    project,
    project_rvec,
    camera_matrix,
    reprojection_errors,
)
from sfm_tpu.geometry.epipolar import (  # noqa: F401
    normalize_points,
    eight_point,
    symmetric_epipolar_distance,
    sampson_distance,
    essential_from_fundamental,
    fundamental_from_essential,
    decompose_essential,
    recover_pose,
)
from sfm_tpu.geometry.triangulation import (  # noqa: F401
    triangulate_two_view,
    triangulate_multiview,
)
