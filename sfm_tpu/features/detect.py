"""Scale-space extremum detection + subpixel refinement, full-grid style.

Instead of the reference's per-keypoint Python/OpenCV control flow
(ref find_matches.py:74-118), every candidate test runs on the whole DoG grid
at once: 26-neighbor extremum tests are shifted comparisons, the 3x3 subpixel
system is solved in closed form (adjugate) at every pixel, and the survivors
are selected by a single top-k on the masked response map. No data-dependent
shapes anywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _shift2d(x, dy, dx):
    """Shift a (..., H, W) array, zero-filling the border."""
    return jnp.roll(x, (dy, dx), axis=(-2, -1))


def dog_extrema_scores(dog, contrast_threshold: float, edge_threshold: float):
    """Score every interior pixel of a DoG stack as a keypoint candidate.

    dog: (S+2, h, w). Returns dict with ONE (S, h, w) grid (interior layers
    1..S): ``score`` (|refined contrast|, 0 where rejected), already gated on
    extremality, contrast, edge response, and offset convergence.

    The subpixel offsets are computed here (they gate the score) but NOT
    returned as grids: with ``score`` as the single consumer XLA fuses the
    whole 27-point stencil + adjugate solve into one loop over the grid,
    instead of materializing ~14 full-resolution derivative/offset grids
    (432 MB each at the upsampled octave in a 12-image batch — the round-3
    OOM). Selected candidates get their offsets recomputed pointwise by
    :func:`refine_candidates`.
    """
    D = dog
    S = D.shape[0] - 2
    center = D[1:-1]  # (S, h, w)

    # --- 26-neighbor extremum test (vectorized shifts) ---------------------
    is_max = jnp.ones_like(center, dtype=bool)
    is_min = jnp.ones_like(center, dtype=bool)
    for ds in (-1, 0, 1):
        layer = D[1 + ds : D.shape[0] - 1 + ds]  # aligned (S, h, w)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                nb = _shift2d(layer, dy, dx)
                is_max &= center > nb
                is_min &= center < nb
    extremum = is_max | is_min

    # --- derivatives (central differences on the stack) --------------------
    gx = 0.5 * (_shift2d(center, 0, -1) - _shift2d(center, 0, 1))
    gy = 0.5 * (_shift2d(center, -1, 0) - _shift2d(center, 1, 0))
    gs = 0.5 * (D[2:] - D[:-2])
    dxx = _shift2d(center, 0, -1) + _shift2d(center, 0, 1) - 2 * center
    dyy = _shift2d(center, -1, 0) + _shift2d(center, 1, 0) - 2 * center
    dss = D[2:] + D[:-2] - 2 * center
    dxy = 0.25 * (
        _shift2d(center, -1, -1) + _shift2d(center, 1, 1)
        - _shift2d(center, -1, 1) - _shift2d(center, 1, -1)
    )
    dxs = 0.25 * (
        _shift2d(D[2:], 0, -1) - _shift2d(D[2:], 0, 1)
        - _shift2d(D[:-2], 0, -1) + _shift2d(D[:-2], 0, 1)
    )
    dys = 0.25 * (
        _shift2d(D[2:], -1, 0) - _shift2d(D[2:], 1, 0)
        - _shift2d(D[:-2], -1, 0) + _shift2d(D[:-2], 1, 0)
    )

    # --- closed-form solve of H @ off = -g (3x3 adjugate) ------------------
    #     H = [[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]]
    det = (
        dxx * (dyy * dss - dys * dys)
        - dxy * (dxy * dss - dys * dxs)
        + dxs * (dxy * dys - dyy * dxs)
    )
    inv_det = jnp.where(jnp.abs(det) < _EPS, 0.0, 1.0 / jnp.where(jnp.abs(det) < _EPS, 1.0, det))
    a00 = dyy * dss - dys * dys
    a01 = dxs * dys - dxy * dss
    a02 = dxy * dys - dxs * dyy
    a11 = dxx * dss - dxs * dxs
    a12 = dxy * dxs - dxx * dys
    a22 = dxx * dyy - dxy * dxy
    off_x = -(a00 * gx + a01 * gy + a02 * gs) * inv_det
    off_y = -(a01 * gx + a11 * gy + a12 * gs) * inv_det
    off_s = -(a02 * gx + a12 * gy + a22 * gs) * inv_det

    refined = center + 0.5 * (gx * off_x + gy * off_y + gs * off_s)

    # --- gates -------------------------------------------------------------
    converged = (
        (jnp.abs(off_x) < 0.6) & (jnp.abs(off_y) < 0.6) & (jnp.abs(off_s) < 0.6)
    )
    contrast_ok = jnp.abs(refined) >= contrast_threshold
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = edge_threshold
    edge_ok = (det2 > 0) & (tr * tr * r < (r + 1.0) ** 2 * det2)

    h, w = center.shape[-2:]
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    border = 5
    in_bounds = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)

    good = extremum & converged & contrast_ok & edge_ok & in_bounds
    score = jnp.where(good, jnp.abs(refined), 0.0)
    return {"score": score}


def refine_candidates(dog, layer, y, x):
    """Recompute subpixel offsets at selected candidate coordinates.

    dog: (S+2, h, w); layer: (K,) interior DoG layer (1..S); y, x: (K,) int
    grid coords. Gathers each candidate's 3x3x3 neighborhood and solves the
    same closed-form (adjugate) 3x3 system as the grid pass — identical
    values, but only for K candidates instead of every pixel.
    Returns (off_x, off_y, off_s), each (K,).
    """
    def cube(l, yy, xx):
        return jax.lax.dynamic_slice(dog, (l - 1, yy - 1, xx - 1), (3, 3, 3))

    C = jax.vmap(cube)(layer, y, x)                 # (K, 3, 3, 3) [s, y, x]
    c = C[:, 1, 1, 1]
    gx = 0.5 * (C[:, 1, 1, 2] - C[:, 1, 1, 0])
    gy = 0.5 * (C[:, 1, 2, 1] - C[:, 1, 0, 1])
    gs = 0.5 * (C[:, 2, 1, 1] - C[:, 0, 1, 1])
    dxx = C[:, 1, 1, 2] + C[:, 1, 1, 0] - 2 * c
    dyy = C[:, 1, 2, 1] + C[:, 1, 0, 1] - 2 * c
    dss = C[:, 2, 1, 1] + C[:, 0, 1, 1] - 2 * c
    dxy = 0.25 * (C[:, 1, 2, 2] + C[:, 1, 0, 0] - C[:, 1, 0, 2] - C[:, 1, 2, 0])
    dxs = 0.25 * (C[:, 2, 1, 2] - C[:, 2, 1, 0] - C[:, 0, 1, 2] + C[:, 0, 1, 0])
    dys = 0.25 * (C[:, 2, 2, 1] - C[:, 2, 0, 1] - C[:, 0, 2, 1] + C[:, 0, 0, 1])

    det = (
        dxx * (dyy * dss - dys * dys)
        - dxy * (dxy * dss - dys * dxs)
        + dxs * (dxy * dys - dyy * dxs)
    )
    inv_det = jnp.where(jnp.abs(det) < _EPS, 0.0, 1.0 / jnp.where(jnp.abs(det) < _EPS, 1.0, det))
    a00 = dyy * dss - dys * dys
    a01 = dxs * dys - dxy * dss
    a02 = dxy * dys - dxs * dyy
    a11 = dxx * dss - dxs * dxs
    a12 = dxy * dxs - dxx * dys
    a22 = dxx * dyy - dxy * dxy
    off_x = -(a00 * gx + a01 * gy + a02 * gs) * inv_det
    off_y = -(a01 * gx + a11 * gy + a12 * gs) * inv_det
    off_s = -(a02 * gx + a12 * gy + a22 * gs) * inv_det
    return off_x, off_y, off_s


def select_octave_candidates(fields, budget: int):
    """Top-``budget`` candidates of one octave by refined-contrast score.

    Returns per-candidate arrays: layer (int, 1-based interior DoG layer),
    y, x (int grid coords), offsets, score; score == 0 marks padding.
    """
    score = fields["score"]
    S, h, w = score.shape
    # Exact top_k: approx_max_k loses ~30% of keypoints here because the
    # score grid is sparse (mostly zeros) and k is comparable to the number
    # of nonzero entries — the approximation's recall target assumes dense
    # scores. But sorting the full grid is the single biggest detection op
    # (9.4M elements at the upsampled octave), so first max-pool 2x2: the
    # 26-neighbor extremum test forbids two same-sign extrema in adjacent
    # pixels, so a block holds >1 candidate only for a rare max/min diagonal
    # pair, where we keep the stronger — then sort the 4x-smaller grid.
    hp, wp = h + (h % 2), w + (w % 2)
    sp = jnp.pad(score, ((0, 0), (0, hp - h), (0, wp - w)))
    blocks = sp.reshape(S, hp // 2, 2, wp // 2, 2)
    pooled = blocks.max(axis=(2, 4))
    k = min(budget, pooled.size)  # tiny octaves can hold < budget cells
    top, pidx = jax.lax.top_k(pooled.reshape(-1), k)
    if k < budget:
        top = jnp.pad(top, (0, budget - k))        # score 0 == padding
        pidx = jnp.pad(pidx, (0, budget - k))
    layer = pidx // ((hp // 2) * (wp // 2))
    prem = pidx % ((hp // 2) * (wp // 2))
    by = prem // (wp // 2)
    bx = prem % (wp // 2)
    # Which of the 4 block members won: compare against the pooled value.
    sub = blocks[layer, by, :, bx, :].reshape(-1, 4)        # (budget, 4)
    sub_arg = jnp.argmax(sub == top[:, None], axis=1)
    y = by * 2 + sub_arg // 2
    x = bx * 2 + sub_arg % 2
    return {
        "layer": (layer + 1).astype(jnp.int32),  # DoG interior layer index
        "y": jnp.minimum(y, h - 1).astype(jnp.int32),
        "x": jnp.minimum(x, w - 1).astype(jnp.int32),
        "score": top,
    }
