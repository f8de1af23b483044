"""Reader for the bunny dataset's ground-truth calibration files.

The reference ships 36 ground-truth 3x4 projection matrices in
bunny_data/calib/NNNN.txt ("CONTOUR" header + three P rows) and never reads
them (SURVEY.md section 0). We use them as the oracle for geometry unit tests
and for quality evaluation.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def load_projection_matrix(path) -> np.ndarray:
    """Parse a CONTOUR-format file into a (3, 4) float64 projection matrix."""
    lines = [ln.strip() for ln in Path(path).read_text().splitlines() if ln.strip()]
    if lines and not lines[0][0].isdigit() and not lines[0].lstrip("-")[0].isdigit():
        lines = lines[1:]  # drop the "CONTOUR" header
    rows = [[float(v) for v in ln.split()] for ln in lines[:3]]
    P = np.array(rows, dtype=np.float64)
    if P.shape != (3, 4):
        raise ValueError(f"expected 3x4 projection matrix in {path}, got {P.shape}")
    return P


def decompose_projection(P: np.ndarray):
    """P = K [R | t] -> (K, R, t) with K upper-triangular, positive diagonal.

    RQ decomposition via the flipped-QR trick; enforces det(R) = +1 and
    K[2,2] = 1.
    """
    if np.linalg.det(P[:, :3]) < 0:
        P = -P  # projective scale; guarantees det(R) = +1 after the sign fix
    M = P[:, :3]
    # RQ(M): flip, QR, flip back.
    Mf = np.flipud(M).T
    Q, R_ = np.linalg.qr(Mf)
    K = np.flipud(np.fliplr(R_.T))
    R = np.flipud(Q.T)
    # Make K's diagonal positive.
    sgn = np.sign(np.diag(K))
    sgn[sgn == 0] = 1.0
    S = np.diag(sgn)
    K = K @ S
    R = S @ R
    t = np.linalg.solve(K, P[:, 3])
    K = K / K[2, 2]
    return K, R, t
