"""The flat observation-table form of a bundle-adjustment problem.

The reference packs per-camera parameter vectors and re-groups observations
per camera inside the objective (ref sfm_reconstruction.py:415-443, :472-501).
Here the problem is one flat table — the TPU-native layout: every observation
row knows its camera id and point id, and all reductions are segment-sums.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class BAProblem(NamedTuple):
    """Padded BA problem. Shapes: C cameras, P points, O observations.

    Invalid rows (padding) carry valid=False and are excluded from every
    reduction by weight masking.
    """

    rvec: jnp.ndarray        # (C, 3) axis-angle world->cam
    tvec: jnp.ndarray        # (C, 3)
    cam_valid: jnp.ndarray   # (C,) bool
    cam_fixed: jnp.ndarray   # (C,) bool — gauge anchors (step forced to 0)
    intr: jnp.ndarray        # (4,) fx, fy, cx, cy (shared pinhole)
    points: jnp.ndarray      # (P, 3)
    point_valid: jnp.ndarray # (P,) bool
    obs_cam: jnp.ndarray     # (O,) int32
    obs_point: jnp.ndarray   # (O,) int32
    obs_xy: jnp.ndarray      # (O, 2) pixels
    obs_valid: jnp.ndarray   # (O,) bool
    intr_c: jnp.ndarray = None  # (C, 4) per-camera intrinsics — populated
                                # only in BAConfig.per_camera_intrinsics mode
                                # (ref parameterizes 10/camera, :415-427)

    @property
    def num_cameras(self) -> int:
        return self.rvec.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_obs(self) -> int:
        return self.obs_cam.shape[0]


def build_problem(
    rvec, tvec, cam_valid, intr, points, point_valid,
    obs_cam, obs_point, obs_xy, obs_valid,
    cam_fixed=None,
    pad_cameras=None, pad_points=None, pad_obs=None,
) -> BAProblem:
    """Assemble + pad a BAProblem from host arrays.

    ``cam_fixed`` defaults to fixing the first valid camera (gauge freedom);
    pad_* round shapes up so the jitted LM program is reused across growth.
    """
    rvec = np.asarray(rvec, np.float32)
    C = rvec.shape[0]
    P = np.asarray(points).shape[0]
    O = np.asarray(obs_cam).shape[0]
    Cp = pad_cameras or C
    Pp = pad_points or P
    Op = pad_obs or O

    def padc(a, n, shape_tail=()):
        a = np.asarray(a)
        out = np.zeros((n,) + a.shape[1:], a.dtype)
        out[: a.shape[0]] = a
        return out

    if cam_fixed is None:
        cam_fixed = np.zeros(C, bool)
        cv = np.asarray(cam_valid, bool)
        if cv.any():
            cam_fixed[np.argmax(cv)] = True  # first valid camera anchors gauge

    return BAProblem(
        rvec=jnp.asarray(padc(rvec, Cp)),
        tvec=jnp.asarray(padc(np.asarray(tvec, np.float32), Cp)),
        cam_valid=jnp.asarray(padc(np.asarray(cam_valid, bool), Cp)),
        cam_fixed=jnp.asarray(padc(np.asarray(cam_fixed, bool), Cp)),
        intr=jnp.asarray(np.asarray(intr, np.float32)),
        points=jnp.asarray(padc(np.asarray(points, np.float32), Pp)),
        point_valid=jnp.asarray(padc(np.asarray(point_valid, bool), Pp)),
        obs_cam=jnp.asarray(padc(np.asarray(obs_cam, np.int32), Op)),
        obs_point=jnp.asarray(padc(np.asarray(obs_point, np.int32), Op)),
        obs_xy=jnp.asarray(padc(np.asarray(obs_xy, np.float32), Op)),
        obs_valid=jnp.asarray(padc(np.asarray(obs_valid, bool), Op)),
    )
