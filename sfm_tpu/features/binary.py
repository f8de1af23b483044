"""FAST + ORB-class binary frontend — the reference's feature class, TPU-native.

Reference behavior being matched (find_matches.py:96-137): FAST corners
(threshold=20, non-max suppression) detected on the masked image, then ORB
256-bit rotation-steered binary descriptors computed AT those keypoints —
``orb.compute`` describes FAST keypoints where they sit, so the reference
frontend is single-scale despite ORB's pyramid knobs. Matching is Hamming
knn2 + 0.75 ratio (find_matches.py:141-155).

TPU mapping (everything static-shape, one fused program per image):

- FAST is pure VPU work. The 16 ring samples are whole-image rolls; the
  "9 contiguous of 16" arc test is a log-step windowed AND over the circular
  ring axis (4 rolls + 4 ANDs); NMS is one 3x3 ``reduce_window``. No
  per-pixel loops, no gathers.
- Descriptors are emitted as **±1/sqrt(256) unit vectors**, not packed bits:
  for a, b in {-1,+1}^256, Hamming(a,b) = (256 - <a,b>)/2, so the matcher's
  squared-L2 on the unit encoding is (4/256)·Hamming — an exact monotone
  (linear) map. The entire existing MXU matmul matcher, sweep, and retrieval
  scorer run UNCHANGED on binary features, with no popcount loops anywhere
  (cf. ``config.effective_match_config`` for the ratio-threshold mapping).
- Rotation steering quantizes orientation into 30 bins (ORB's 12-degree
  resolution) and precomputes per-bin integer sample offsets, turning
  "rotate the 256-pair pattern per keypoint" into one row lookup in a
  (30, 256) constant table + a row-wise ``take_along_axis`` on the
  keypoint's own 33x33 patch.

The BRIEF test pattern is our own (seeded Gaussian pairs on a radius-14.5
disk, the original BRIEF construction) — ORB's learned pattern is an OpenCV
artifact, not part of the capability contract.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import FeatureConfig
from sfm_tpu.features.pyramid import gaussian_blur_mm
from sfm_tpu.features.detect import select_octave_candidates

PATCH = 33          # descriptor/orientation patch edge (center at 16)
HALF = PATCH // 2
N_BITS = 256        # descriptor length (ORB parity)
N_ANGLE_BINS = 30   # 12-degree steering resolution (ORB's)
BORDER = HALF + 1   # min keypoint distance from the image edge

# Radius-3 Bresenham circle, 16 samples clockwise from 12 o'clock — the
# standard FAST-9/16 test ring. (dy, dx), y down.
_RING = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], np.int32)


def _make_pattern(seed: int = 20140413, n: int = N_BITS, sigma: float = 6.2,
                  rmax: float = 14.5, min_sep: float = 2.0):
    """BRIEF test pattern: n (p, q) point pairs, Gaussian about the center,
    kept inside a radius-``rmax`` disk so every steered rotation stays inside
    the 33x33 patch; pairs closer than ``min_sep`` are re-drawn (a p≈q test
    compares a pixel to itself and carries no signal)."""
    rng = np.random.default_rng(seed)

    def draw(k):
        out = np.empty((0, 2))
        while len(out) < k:
            c = rng.normal(0.0, sigma, size=(4 * k, 2))
            c = c[np.hypot(c[:, 0], c[:, 1]) <= rmax]
            out = np.concatenate([out, c])
        return out[:k]

    p, q = draw(n), draw(n)
    for _ in range(64):
        close = np.hypot(*(p - q).T) < min_sep
        if not close.any():
            break
        q[close] = draw(int(close.sum()))
    return p, q


def _steer_tables():
    """(N_ANGLE_BINS, N_BITS) int32 flat patch indices for each test point,
    one row per quantized orientation. Nearest-pixel sampling (ORB rounds the
    rotated pattern the same way)."""
    p, q = _make_pattern()
    t1 = np.zeros((N_ANGLE_BINS, N_BITS), np.int32)
    t2 = np.zeros((N_ANGLE_BINS, N_BITS), np.int32)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        for tbl, pts in ((t1, p), (t2, q)):
            x = pts[:, 0] * c - pts[:, 1] * s
            y = pts[:, 0] * s + pts[:, 1] * c
            xi = np.clip(np.round(x).astype(np.int64) + HALF, 0, PATCH - 1)
            yi = np.clip(np.round(y).astype(np.int64) + HALF, 0, PATCH - 1)
            tbl[b] = (yi * PATCH + xi).astype(np.int32)
    return t1, t2


_STEER1, _STEER2 = _steer_tables()

# Intensity-centroid moment weights: circular radius-15 window (ORB's
# IC_Angle footprint) on the patch's local coordinates.
_UU = np.arange(PATCH) - HALF
_IC_DISK = (np.hypot(*np.meshgrid(_UU, _UU)) <= 15.0)
_IC_WX = (_IC_DISK * _UU[None, :]).astype(np.float32).ravel()   # weight = x
_IC_WY = (_IC_DISK * _UU[:, None]).astype(np.float32).ravel()   # weight = y


def fast_scores(image, threshold: float):
    """(H, W) f32 [0,1] -> (H, W) FAST-9/16 corner score (0 = non-corner).

    A pixel passes if >= 9 CONTIGUOUS ring samples are all brighter than
    center+t or all darker than center-t. Score is the summed contrast
    beyond threshold of the qualifying polarity — a ranking proxy for NMS
    and top-k (OpenCV's exact score is the max t keeping the corner, which
    needs a per-pixel binary search; ranking is all we use it for).
    """
    ring = jnp.stack(
        [jnp.roll(image, (-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in _RING]
    )                                               # (16, H, W) value at p+offset
    bright = ring > image[None] + threshold
    dark = ring < image[None] - threshold

    def has_arc9(m):
        # AND over 9 consecutive ring positions, all 16 circular starts at
        # once: log-step windowed AND (roll is circular on the ring axis).
        w2 = m & jnp.roll(m, -1, 0)                 # windows of 2
        w4 = w2 & jnp.roll(w2, -2, 0)               # 4
        w8 = w4 & jnp.roll(w4, -4, 0)               # 8
        w9 = w8 & jnp.roll(m, -8, 0)                # 9
        return w9.any(axis=0)

    arc_b, arc_d = has_arc9(bright), has_arc9(dark)
    sb = jnp.where(bright, ring - image[None] - threshold, 0.0).sum(0)
    sd = jnp.where(dark, image[None] - ring - threshold, 0.0).sum(0)
    # Each polarity's sum only counts if THAT polarity's arc test passed —
    # otherwise a dark-arc corner with a few strongly bright non-arc samples
    # would be ranked by the bright sum and could NMS-suppress a genuine
    # neighbor.
    return jnp.maximum(jnp.where(arc_b, sb, 0.0), jnp.where(arc_d, sd, 0.0))


def _nms3(score):
    """3x3 non-max suppression (ties survive; FAST plateaus are rare and the
    global top-k dedups by budget anyway)."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= mx, score, 0.0)


def detect_orb(image, mask, config: FeatureConfig, has_mask: bool):
    """(H, W) f32 [0,1] image (+ optional bool mask) -> Features.

    Multi-scale when ``config.orb_levels > 1``: the single-scale core runs
    on a bilinear pyramid (ORB's nlevels/scaleFactor mechanism — cv2 ORB
    detects on a 1.2^l pyramid; the REFERENCE's orb.compute-on-FAST path is
    effectively single-scale, so levels > 1 is a beyond-reference quality
    win). Measured motivation (round 5): bunny image 0 — the camera the
    reference loses — matches the model at only ~12% guided-inlier rate
    with single-scale binary descriptors (PnP pose 50-84 deg wrong vs GT
    calib), while the multi-scale SIFT path rescues it; the failure is
    scale coverage, not thresholds. Keypoints from all levels merge into
    one response-ordered top-K table (retrieval's ``desc[:, :S]`` strongest
    -subset contract preserved); xy/sigma are mapped back to level-0 pixels.
    """
    if config.orb_levels > 1:
        return _detect_orb_pyramid(image, mask, config, has_mask)
    return _detect_orb_level(image, mask, config, has_mask,
                             config.max_keypoints)


def _level_budgets(base: int, n_levels: int, factor: float):
    """Per-level keypoint budgets. Level 0 keeps the FULL ``base`` budget —
    splitting it (ORB's nfeatures distribution) was measured to starve the
    pairwise sweep on small masked scenes (bunny accepted pairs 175 -> 123,
    cameras 35 -> 34): the pair graph is built on level-0 detail, and
    multi-scale must only ADD coverage, never subtract it. Upper levels get
    extra rows proportional to their pixel count (1/factor^2l), so the
    merged table is a strict superset of the single-scale table (total K
    grows ~1.3-1.5x; the K^2 match matmul absorbs it on the MXU)."""
    w = np.power(1.0 / (factor * factor), np.arange(1, n_levels))
    # Round upper-level budgets to a multiple of 8 for friendlier layouts.
    extra = [int(np.ceil(base * wi / 8) * 8) for wi in w]
    return [int(base)] + extra


def _detect_orb_pyramid(image, mask, config: FeatureConfig, has_mask: bool):
    from sfm_tpu.features.frontend import Features  # deferred: no import cycle

    h, w = image.shape
    budgets = _level_budgets(config.max_keypoints, config.orb_levels,
                             config.orb_scale_factor)
    parts = []
    for lvl, budget in enumerate(budgets):
        if budget <= 0:
            continue
        s = float(config.orb_scale_factor) ** lvl
        if lvl == 0:
            im_l, mk_l = image, mask
        else:
            hl, wl = max(int(round(h / s)), 2 * BORDER + 2), max(
                int(round(w / s)), 2 * BORDER + 2)
            im_l = jax.image.resize(image, (hl, wl), "linear")
            mk_l = (
                jax.image.resize(mask.astype(jnp.float32), (hl, wl), "linear")
                > 0.5
                if has_mask
                else mask
            )
        f = _detect_orb_level(im_l, mk_l, config, has_mask, budget)
        # Map back to level-0 pixel coordinates; keypoint footprint scales
        # with the level (the descriptor patch covers 33*s level-0 pixels).
        # jax.image.resize samples at half-pixel centers, so level coord x_l
        # sits at level-0 coord x_l*s + (s-1)/2, not x_l*s.
        if lvl == 0:
            parts.append(f)
        else:
            sy = h / im_l.shape[0]
            sx = w / im_l.shape[1]
            off = jnp.asarray([(sx - 1) / 2, (sy - 1) / 2], jnp.float32)
            scale = jnp.asarray([sx, sy], jnp.float32)
            parts.append(f._replace(
                xy=jnp.where(f.valid[:, None], f.xy * scale + off, 0.0),
                sigma=f.sigma * jnp.float32((sx + sy) / 2),
            ))
    cat = lambda field: jnp.concatenate([getattr(f, field) for f in parts])
    resp = cat("response")
    # Response-ordered merge of ALL rows (invalid rows carry response 0 and
    # sink to the tail); the table is a strict superset of single-scale.
    order = jnp.argsort(-jnp.where(cat("valid"), resp, -jnp.inf))
    pick = lambda a: a[order]
    return Features(
        xy=pick(cat("xy")), sigma=pick(cat("sigma")), angle=pick(cat("angle")),
        response=pick(resp), desc=pick(cat("desc")), valid=pick(cat("valid")),
    )


def _detect_orb_level(image, mask, config: FeatureConfig, has_mask: bool,
                      budget: int):
    """Single-scale FAST+steered-BRIEF core (module docstring); padded
    fixed-``budget`` arrays, invalid rows zeroed. ``desc`` is (K, 256) f16
    in {±1/16} — a unit vector whose pairwise squared-L2 is
    (4/256)·Hamming."""
    from sfm_tpu.features.frontend import Features  # deferred: no import cycle

    h, w = image.shape
    t = config.fast_threshold / 255.0               # u8-scale knob, [0,1] pixels
    score = fast_scores(image, t)

    # Keypoints must carry a full patch: zero scores inside the border band.
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inb = (yy >= BORDER) & (yy < h - BORDER) & (xx >= BORDER) & (xx < w - BORDER)
    score = jnp.where(inb, score, 0.0)

    if has_mask:
        if config.mask_dilate > 0:
            from sfm_tpu.features.frontend import dilate_mask

            mask = dilate_mask(mask, config.mask_dilate)
        # Gate the SCORE, not the image: the reference zeroes background
        # pixels then post-filters keypoints by mask (find_matches.py:92-133),
        # which manufactures silhouette-edge corners it must then discard.
        # Gating the score keeps only true-image corners inside the mask.
        score = jnp.where(mask, score, 0.0)

    score = _nms3(score)
    cands = select_octave_candidates({"score": score[None]}, budget)
    x, y, resp = cands["x"], cands["y"], cands["score"]
    valid = resp > 0
    K = x.shape[0]

    # ONE 33x33 bf16 BLURRED patch per keypoint, shared by the orientation
    # moments and the BRIEF tests. Design choices, both measured:
    # - The patch gather (vmapped dynamic_slice -> scattered-window gather)
    #   is the frontend's dominant stage; gathering a single pre-cast bf16
    #   plane instead of a stacked raw+blurred f32 pair moves 1/4 of the
    #   bytes. bf16 is bit-identical for BRIEF (the matmul below rounds its
    #   operands to bf16 anyway).
    # - Moments on the sigma~2 BLURRED patch instead of the raw image: the
    #   intensity centroid of a smoothed patch is a slightly more stable
    #   orientation, and it deletes the raw plane. (A whole-image 33x33
    #   moment conv measured catastrophically slow on TPU: 137 ms/img.)
    # - Moment matvecs keep f32 accumulation (HIGHEST): the weights are
    #   exact small integers, each bf16xint product is exact in f32, so
    #   only the sum order differs from the numpy oracle.
    blur16 = gaussian_blur_mm(image, 2.0).astype(jnp.bfloat16)

    def _slice(yc, xc):
        return jax.lax.dynamic_slice(
            blur16, (yc - HALF, xc - HALF), (PATCH, PATCH)
        )

    blur = jax.vmap(_slice)(y, x).reshape(K, PATCH * PATCH)

    m10 = jnp.matmul(blur.astype(jnp.float32), jnp.asarray(_IC_WX),
                     precision=jax.lax.Precision.HIGHEST)
    m01 = jnp.matmul(blur.astype(jnp.float32), jnp.asarray(_IC_WY),
                     precision=jax.lax.Precision.HIGHEST)
    angle = jnp.arctan2(m01, m10)
    frac = angle * (N_ANGLE_BINS / (2.0 * np.pi))
    bins = jnp.mod(jnp.round(frac).astype(jnp.int32), N_ANGLE_BINS)

    # Steered BRIEF as one MXU matmul instead of per-keypoint gathers:
    # bit i = patch[p_i] < patch[q_i]  ⟺  patch · (e_{p_i} - e_{q_i}) < 0,
    # so all 30 steering bins at once are patch @ D with
    # D = onehot(idx1) - onehot(idx2) ∈ {-1,0,1}^(1089, 30·256), then each
    # keypoint keeps its own bin's 256 columns. The 30x redundant FLOPs ride
    # the MXU at ~400x the scattered-gather rate (measured: the
    # take_along_axis formulation was 177 ms of a 281 ms batch-12 dispatch;
    # this one is ~15 ms). D is built on device from the 60 KB index tables
    # so no multi-MB constant is baked into the executable.
    #
    # The whole computation runs in bf16: the stage is BANDWIDTH-bound on the
    # (K, 30, 256) diff tensor (f32: 755 MB/batch-12; measured DEFAULT 2.04
    # vs HIGH 2.54 ms/img — precision barely moves it, traffic does), and
    # bf16 is sign-exact here: each diff element is blur[p] - blur[q] of
    # bf16-rounded operands (two ±1 terms, f32 accumulation), the bf16 output
    # rounding never crosses zero, and bf16's ~2e-3 input rounding sits BELOW
    # the u8 pixel quantization step (1/255 = 3.9e-3) the values carry anyway.
    P2 = PATCH * PATCH
    D = (jax.nn.one_hot(jnp.asarray(_STEER1).reshape(-1), P2, dtype=jnp.bfloat16)
         - jax.nn.one_hot(jnp.asarray(_STEER2).reshape(-1), P2, dtype=jnp.bfloat16))
    diff = jax.lax.dot_general(
        blur, D, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    ).reshape(K, N_ANGLE_BINS, N_BITS)
    onehot_bin = jax.nn.one_hot(bins, N_ANGLE_BINS, dtype=diff.dtype)
    sel = jnp.einsum("kb,kbi->ki", onehot_bin, diff)
    bits = sel < 0
    desc = (bits.astype(jnp.float16) * 2 - 1) * jnp.float16(1.0 / 16.0)

    xy = jnp.stack([x.astype(jnp.float32), y.astype(jnp.float32)], axis=-1)
    zero = lambda a: jnp.where(
        valid.reshape(valid.shape + (1,) * (a.ndim - 1)), a, 0
    )
    return Features(
        xy=zero(xy),
        sigma=zero(jnp.full((K,), 7.0 / 2.0, jnp.float32)),  # FAST kp size 7
        angle=zero(angle),
        response=zero(resp),
        desc=zero(desc),
        valid=valid,
    )
