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
    1..S): ``score`` = |raw DoG contrast| where the pixel is a strict
    26-neighbor extremum inside the border, 0 elsewhere.

    This grid pass is deliberately LIGHT: subpixel refinement and the
    convergence / refined-contrast / edge gates run per-candidate in
    :func:`refine_and_gate` AFTER per-octave selection, not here. Computing
    the 3x3x3 derivative stack + adjugate solve at every pixel was ~2/3 of
    the extremum stage's wall-clock (measured on v5e) for values that are
    consumed at <0.1% of pixels; per-octave candidate budgets exceed the
    strict-extremum survivor count by an order of magnitude on real images
    (bunny octave 0: 2048 budget vs ~650 extrema at a pre-gate contrast
    floor), so ranking by raw |contrast| here and by refined contrast after
    the pointwise gates selects the same keypoint set.

    A ``contrast_threshold``-derived pre-filter (half the final threshold,
    against the raw value) trims obvious noise extrema so the downstream
    budgets are spent on plausible candidates; the exact threshold is
    re-applied to the REFINED value in :func:`refine_and_gate` (the refined
    contrast of a surviving extremum can exceed its raw value, hence the
    slack factor).

    The strict 26-neighbor test runs as SEPARABLE row/column reductions
    (the center is excluded by composing the same-layer 8-neighbor max from
    x-window maxes of the adjacent rows + the two same-row neighbors): ~20
    VPU ops/pixel vs ~52 for pairwise shifted compares, exactly equal output
    (see :func:`_dog_extrema_scores_ref`, the oracle the tests pin this to).
    Border wrap from jnp.roll is harmless: the in-bounds border (5 px)
    exceeds the 1-px window radius, so wrapped values never reach a scored
    pixel.
    """
    D = dog
    center = D[1:-1]  # (S, h, w)

    def _nbmax(red):
        # x-window (3-tap) reduction per layer, full stack.
        Hx = red(red(D, _shift2d(D, 0, 1)), _shift2d(D, 0, -1))
        # Full 3x3 spatial window per layer (for the ds = +-1 layers).
        Hxy = red(red(Hx, _shift2d(Hx, 1, 0)), _shift2d(Hx, -1, 0))
        # Same-layer 8 neighbors EXCLUDING center: the two adjacent rows'
        # 3-wide maxes + the two same-row neighbors.
        N8 = red(
            red(_shift2d(Hx, 1, 0), _shift2d(Hx, -1, 0)),
            red(_shift2d(D, 0, 1), _shift2d(D, 0, -1)),
        )
        # 26-neighbor reduction for interior layers 1..S.
        return red(red(Hxy[:-2], Hxy[2:]), N8[1:-1])

    is_max = center > _nbmax(jnp.maximum)
    is_min = center < _nbmax(jnp.minimum)
    extremum = is_max | is_min

    h, w = center.shape[-2:]
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    border = 5
    in_bounds = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)

    raw = jnp.abs(center)
    good = extremum & in_bounds & (raw >= 0.5 * contrast_threshold)
    return {"score": jnp.where(good, raw, 0.0)}


def _dog_extrema_scores_ref(dog, contrast_threshold: float,
                            edge_threshold: float):
    """Oracle for :func:`dog_extrema_scores`: pairwise shifted compares.

    The direct transcription of the strict 26-neighbor test (52 compares);
    kept only so tests can pin the separable production path to it exactly.
    """
    D = dog
    center = D[1:-1]  # (S, h, w)
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

    h, w = center.shape[-2:]
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    border = 5
    in_bounds = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
    raw = jnp.abs(center)
    good = extremum & in_bounds & (raw >= 0.5 * contrast_threshold)
    return {"score": jnp.where(good, raw, 0.0)}


def refine_and_gate(dog, layer, y, x, contrast_threshold: float,
                    edge_threshold: float):
    """Subpixel refinement + quality gates for selected candidates.

    dog: (S+2, h, w); layer/y/x: (K,) grid coords of strict extrema from
    :func:`select_octave_candidates`. Computes the closed-form (adjugate)
    3x3 offset solve on each candidate's 27-point neighborhood and applies
    the SIFT gates the grid pass deferred: offset convergence (<0.6),
    refined |contrast| >= contrast_threshold, Hessian edge-ratio test.

    Returns (off_x, off_y, off_s, score) with score = |refined contrast|
    where all gates pass, else 0 (the downstream validity convention).
    """
    off_x, off_y, off_s, extras = _refine_cubes(dog, layer, y, x)
    refined, dxx, dyy, dxy = extras
    converged = (
        (jnp.abs(off_x) < 0.6) & (jnp.abs(off_y) < 0.6) & (jnp.abs(off_s) < 0.6)
    )
    contrast_ok = jnp.abs(refined) >= contrast_threshold
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = edge_threshold
    edge_ok = (det2 > 0) & (tr * tr * r < (r + 1.0) ** 2 * det2)
    score = jnp.where(converged & contrast_ok & edge_ok, jnp.abs(refined), 0.0)
    return off_x, off_y, off_s, score


def refine_candidates(dog, layer, y, x):
    """Subpixel offsets at selected candidate coordinates (no gates).

    Thin wrapper over :func:`_refine_cubes` for callers that only need the
    offsets; the production frontend uses :func:`refine_and_gate`.
    """
    off_x, off_y, off_s, _ = _refine_cubes(dog, layer, y, x)
    return off_x, off_y, off_s


def _refine_cubes(dog, layer, y, x):
    """Gather 3x3x3 candidate neighborhoods and solve the offset system.

    dog: (S+2, h, w); layer: (K,) interior DoG layer (1..S); y, x: (K,) int
    grid coords. Solves the closed-form (adjugate) 3x3 system per candidate.
    Returns (off_x, off_y, off_s, (refined, dxx, dyy, dxy)) — the extras
    feed the quality gates in :func:`refine_and_gate`.

    The 27-point neighborhoods are fetched as ONE flat gather of 27*K
    scalars: a vmapped (3,3,3) dynamic_slice was the single most expensive
    detection op on the TPU (9.3 of 35 ms/image — tiny strided slices
    defeat the gather coalescer), while the flat gather is ~0.1 ms.
    Out-of-range indices (only reachable for zero-score padding rows, whose
    offsets are discarded) are clamped.
    """
    Sp2, h, w = dog.shape
    ds = jnp.arange(-1, 2)
    l_idx = jnp.clip(layer[:, None] + ds[None, :], 0, Sp2 - 1)   # (K, 3)
    y_idx = jnp.clip(y[:, None] + ds[None, :], 0, h - 1)
    x_idx = jnp.clip(x[:, None] + ds[None, :], 0, w - 1)
    idx = (
        l_idx[:, :, None, None] * (h * w)
        + y_idx[:, None, :, None] * w
        + x_idx[:, None, None, :]
    )                                                # (K, 3, 3, 3) [s, y, x]
    C = dog.reshape(-1)[idx.reshape(-1)].reshape(idx.shape)
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
    refined = c + 0.5 * (gx * off_x + gy * off_y + gs * off_s)
    return off_x, off_y, off_s, (refined, dxx, dyy, dxy)


def _maxpool2(x):
    """2x2/stride-2 max over the trailing two axes (odd edges zero-padded).

    reduce_window, not the reshape(..., 2, ..., 2).max trick: a trailing
    axis of extent 2 defeats the TPU's (8, 128) tiling and measured ~6 ms
    per image at the upsampled octave; the windowed reduction runs in the
    vector units at full tile width.
    """
    h, w = x.shape[-2:]
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.max,
        (1, 2, 2), (1, 2, 2),
        [(0, 0), (0, h % 2), (0, w % 2)],
    )


def select_octave_candidates(fields, budget: int):
    """Top-``budget`` candidates of one octave by refined-contrast score.

    Returns per-candidate arrays: layer (int, 1-based interior DoG layer),
    y, x (int grid coords), score; score == 0 marks padding.

    Exact top_k: approx_max_k loses ~30% of keypoints here because the score
    grid is sparse (mostly zeros) and k is comparable to the number of
    nonzero entries — the approximation's recall target assumes dense scores.
    A flat exact top_k over the grid was the single biggest detection op
    (12.6 ms/image), so selection is hierarchical and still exact:

      1. 2x2 CELL max — the 26-neighbor extremum test forbids two same-sign
         extrema in adjacent pixels, so a cell holds >1 candidate only for a
         rare max/min diagonal pair, where we keep the stronger.
      2. 4x4 BLOCK max over cells; top_k over blocks (16x fewer elements
         than pixels). Coverage is guaranteed: if a true top-k cell's block
         were not selected, every selected block's max exceeds that cell's
         score, giving >= k strictly better cells — contradiction.
      3. top_k over the 4*k surviving cells, then argmax inside each winning
         cell recovers the pixel.
    """
    score = fields["score"]
    S, h, w = score.shape
    cell = _maxpool2(score)                        # (S, h2, w2)
    h2, w2 = cell.shape[-2:]
    blk = _maxpool2(cell)                          # (S, h4, w4)
    h4, w4 = blk.shape[-2:]

    k1 = min(budget, blk.size)
    _, bidx = jax.lax.top_k(blk.reshape(-1), k1)
    bl = bidx // (h4 * w4)
    brem = bidx % (h4 * w4)
    by = brem // w4
    bx = brem % w4

    # The 4 cells of each selected block (out-of-range cells masked to -1).
    dy = jnp.array([0, 0, 1, 1])
    dx = jnp.array([0, 1, 0, 1])
    cy = by[:, None] * 2 + dy[None, :]             # (k1, 4)
    cx = bx[:, None] * 2 + dx[None, :]
    cell_ok = (cy < h2) & (cx < w2)
    cidx = (
        bl[:, None] * (h2 * w2)
        + jnp.minimum(cy, h2 - 1) * w2
        + jnp.minimum(cx, w2 - 1)
    )
    cs = jnp.where(cell_ok, cell.reshape(-1)[cidx], -1.0)   # (k1, 4)

    k2 = min(budget, cs.size)
    ctop, cpos = jax.lax.top_k(cs.reshape(-1), k2)
    sel_b = cpos // 4
    sub = cpos % 4
    layer = bl[sel_b]
    cell_y = by[sel_b] * 2 + dy[sub]
    cell_x = bx[sel_b] * 2 + dx[sub]

    # Winning pixel inside each selected 2x2 cell.
    py = cell_y[:, None] * 2 + dy[None, :]         # (k2, 4)
    px = cell_x[:, None] * 2 + dx[None, :]
    pix_ok = (py < h) & (px < w)
    pidx = (
        layer[:, None] * (h * w)
        + jnp.minimum(py, h - 1) * w
        + jnp.minimum(px, w - 1)
    )
    ps = jnp.where(pix_ok, score.reshape(-1)[pidx], -1.0)
    sub_arg = jnp.argmax(ps == ctop[:, None], axis=1)
    y = cell_y * 2 + dy[sub_arg]
    x = cell_x * 2 + dx[sub_arg]
    top = jnp.maximum(ctop, 0.0)                   # -1 padding -> score 0

    if k2 < budget:
        pad = (0, budget - k2)
        top = jnp.pad(top, pad)                    # score 0 == padding
        layer = jnp.pad(layer, pad)
        y = jnp.pad(y, pad)
        x = jnp.pad(x, pad)
    return {
        "layer": (layer + 1).astype(jnp.int32),  # DoG interior layer index
        "y": jnp.minimum(y, h - 1).astype(jnp.int32),
        "x": jnp.minimum(x, w - 1).astype(jnp.int32),
        "score": top,
    }
