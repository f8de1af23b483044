"""The full feature frontend: image -> fixed-K keypoints + descriptors.

One jitted program per image geometry: pyramid (convs) -> grid extrema ->
per-octave top-k -> mask gate + GLOBAL top-k on candidate metadata ->
orientation + descriptor for the selected budget only. Returns padded arrays
+ validity mask so the all-pairs matcher downstream has fully static shapes.

Select-first ordering (round 3): description is the dominant per-keypoint
cost, and describing every per-octave candidate slot (sum of octave budgets,
~1.9x the final keypoint budget) then throwing half away wasted that work.
Selection needs only metadata (response + mask lookup at xy), so it runs
first; the survivors are described against a single multi-octave "canvas"
(all octave Gaussian stacks stacked along rows at a common width), which
makes patch extraction a uniform per-keypoint dynamic_slice regardless of
which octave the keypoint came from.

Silhouette-mask gating follows the reference (find_matches.py:120-137): a
keypoint is kept only if the mask is foreground at its location.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import FeatureConfig
from sfm_tpu.features.pyramid import build_pyramid
from sfm_tpu.features.detect import (
    dog_extrema_scores,
    refine_and_gate,
    select_octave_candidates,
)
from sfm_tpu.features.descriptor import (
    _GPATCH,
    orientation_and_descriptor_canvas,
)


class Features(NamedTuple):
    """Padded per-image features. Invalid rows are zeroed."""

    xy: jnp.ndarray        # (K, 2) full-resolution pixel coords
    sigma: jnp.ndarray     # (K,)
    angle: jnp.ndarray     # (K,)
    response: jnp.ndarray  # (K,) |refined DoG contrast|
    desc: jnp.ndarray      # (K, 128) unit-norm
    valid: jnp.ndarray     # (K,) bool


def _octave_budget(max_keypoints: int, octave: int) -> int:
    return max(max_keypoints >> octave, 256)


def _normalize_image(image):
    """Accept u8/u16 quantized grayscale and normalize on DEVICE.

    The tunnel's host->device path measured ~37 MB/s — uploading f32 pixels
    made the transfer, not the compute, the detection bottleneck (3.8 s vs
    1.2 s for all dispatches on bunny-36). u16 luma is 2x smaller with
    quantization error 7.6e-6, three orders of magnitude below the DoG
    contrast threshold (0.006).
    """
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    if image.dtype == jnp.uint16:
        return image.astype(jnp.float32) / 65535.0
    return image.astype(jnp.float32)


def _unpack_mask(packed, w: int):
    """(h, ceil(w/8)) uint8 np.packbits rows -> (h, w) bool, on device."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[0], -1)[:, :w].astype(bool)


def dilate_mask(mask, radius: int):
    """Grow a boolean foreground mask by ``radius`` px (morphological
    dilation as an OR max-pool) so keypoints on the silhouette boundary
    survive — the analogue of the reference's morphological close on the
    mask (find_matches.py:70). Shared by the SIFT and ORB detection paths."""
    d = 2 * radius + 1
    return jax.lax.reduce_window(
        mask, False, jax.lax.bitwise_or, (d, d), (1, 1), "SAME"
    )


@partial(jax.jit, static_argnames=("config", "has_mask"))
def _detect_impl(image, mask, config: FeatureConfig, has_mask: bool) -> Features:
    image = _normalize_image(image)
    if has_mask and mask.dtype == jnp.uint8:   # bit-packed on the wire
        mask = _unpack_mask(mask, image.shape[1])
    if config.kind == "orb":
        # FAST+ORB-class binary path (the reference's feature class) — same
        # Features contract, desc is (K, 256) ±1/16 f16 (features/binary.py).
        from sfm_tpu.features.binary import detect_orb

        return detect_orb(image, mask, config, has_mask)
    S = config.scales_per_octave
    gaussians, dogs = build_pyramid(
        image,
        num_octaves=config.num_octaves,
        scales_per_octave=S,
        sigma0=config.sigma0,
        assumed_blur=config.assumed_blur,
        upsample=config.upsample_first_octave,
    )
    # With the -1 octave, octave o sits at resolution scale 2^(o-1).
    oct_base = 0.5 if config.upsample_first_octave else 1.0

    # ---- stage 1: candidate METADATA per octave (no descriptors) ----------
    # The grid pass scores strict extrema by raw |contrast| only; subpixel
    # refinement and the convergence/contrast/edge gates run here, per
    # selected candidate (see detect.dog_extrema_scores for the rationale).
    per_octave = []
    for o in range(config.num_octaves):
        fields = dog_extrema_scores(
            dogs[o], config.contrast_threshold, config.edge_threshold
        )
        cands = select_octave_candidates(fields, _octave_budget(config.max_keypoints, o))

        layer = cands["layer"]                        # 1..S (DoG interior)
        off_x, off_y, off_s, gated_score = refine_and_gate(
            dogs[o], layer, cands["y"], cands["x"],
            config.contrast_threshold, config.edge_threshold,
        )
        # Selection padding (cands score 0) must stay invalid regardless of
        # what the gates computed on its clamped neighborhood.
        gated_score = jnp.where(cands["score"] > 0, gated_score, 0.0)
        x_o = cands["x"].astype(jnp.float32) + off_x
        y_o = cands["y"].astype(jnp.float32) + off_y
        sigma_rel = config.sigma0 * jnp.power(
            2.0, (layer.astype(jnp.float32) + off_s) / S
        )

        scale = float(1 << o) * oct_base
        n = layer.shape[0]
        per_octave.append(
            {
                "xy": jnp.stack([x_o * scale, y_o * scale], axis=-1),
                "sigma": sigma_rel * scale,
                "sigma_rel": sigma_rel,
                "response": gated_score,
                "grad_idx": layer - 1,
                "x_o": x_o,
                "y_o": y_o,
                "octave": jnp.full((n,), o, jnp.int32),
            }
        )

    cat = lambda key: jnp.concatenate([p[key] for p in per_octave])
    xy = cat("xy")
    response = cat("response")
    valid = response > 0

    # ---- stage 2: mask gate + global selection on metadata only -----------
    if has_mask:
        if config.mask_dilate > 0:
            mask = dilate_mask(mask, config.mask_dilate)
        h, w = image.shape
        xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
        valid = valid & mask[yi, xi]

    score = jnp.where(valid, response, -1.0)
    _, idx = jax.lax.top_k(score, config.max_keypoints)
    sel = lambda key: cat(key)[idx]
    valid = valid[idx] & (score[idx] > 0)

    xy = sel("xy")
    sigma = sel("sigma")
    response = response[idx]

    # ---- stage 3: describe ONLY the selected budget ------------------------
    # Canvas: every octave's INTERIOR Gaussian layers (1..S — the only ones
    # descriptors sample), padded to a common width and stacked along rows.
    # A keypoint's patch is then one dynamic_slice at
    # (grad_layer, row_off[octave] + y, x) — no per-octave batches.
    S_int = S  # interior layer count
    heights = [g.shape[-2] for g in gaussians]
    widths = [g.shape[-1] for g in gaussians]
    wmax = max(max(widths), _GPATCH)
    # f16 canvas: the per-keypoint patch slice is gather-bandwidth-bound
    # (measured ~7 ms/img of the 28 at f32); half the bytes. f16, not bf16:
    # bf16's 8-bit mantissa measurably perturbs descriptors (the rotation-
    # invariance test's marginal ratio-test matches flipped, 6 -> 4), while
    # f16's 11-bit mantissa keeps the keypoint/match set identical at the
    # same gather bandwidth.
    canvas = jnp.concatenate(
        [jnp.pad(g[1:S_int + 1], ((0, 0), (0, max(0, _GPATCH - g.shape[-2])),
                                  (0, wmax - g.shape[-1]))) for g in gaussians],
        axis=1,
    ).astype(jnp.float16)
    row_off = []
    acc = 0
    for g in gaussians:
        row_off.append(acc)
        acc += max(g.shape[-2], _GPATCH)

    octv = sel("octave")
    kp_roff = jnp.asarray(row_off, jnp.int32)[octv]
    kp_h = jnp.asarray(heights, jnp.int32)[octv]
    kp_w = jnp.asarray(widths, jnp.int32)[octv]

    angle, desc = orientation_and_descriptor_canvas(
        canvas,
        sel("grad_idx"),
        sel("x_o"),
        sel("y_o"),
        sel("sigma_rel"),
        kp_roff,
        kp_w,
        kp_h,
        descriptor_scale=config.descriptor_scale,
        clip=config.descriptor_clip,
    )

    zero = lambda a: jnp.where(
        valid.reshape(valid.shape + (1,) * (a.ndim - 1)), a, 0
    )
    return Features(
        xy=zero(xy),
        sigma=zero(sigma),
        angle=zero(angle),
        response=zero(response),
        desc=zero(desc),
        valid=valid,
    )


def detect_and_describe(
    image, mask: Optional[jnp.ndarray] = None, config: FeatureConfig = FeatureConfig()
) -> Features:
    """Detect SIFT-class features on a (H, W) float32 [0,1] image.

    ``mask``: optional (H, W) bool foreground mask (True = keep keypoints).
    Accepts float32 [0, 1] or u8/u16 quantized grayscale (normalized on
    device — see :func:`_normalize_image`).
    """
    image = jnp.asarray(image)
    has_mask = mask is not None
    if mask is None:
        mask = jnp.ones((1, 1), dtype=bool)  # placeholder, unused
    return _detect_impl(image, jnp.asarray(mask, bool), config, has_mask)


@partial(jax.jit, static_argnames=("config", "has_mask"))
def _detect_batch_impl(images, masks, config: FeatureConfig, has_mask: bool):
    return jax.vmap(lambda im, mk: _detect_impl(im, mk, config, has_mask))(
        images, masks
    )


def detect_and_describe_batch(
    images, masks=None, config: FeatureConfig = FeatureConfig(),
    batch_size: int = 4,
) -> Features:
    """Batched frontend: (N, H, W) images -> Features with leading axis N.

    Dispatches in sub-batches of ``batch_size``: one vmapped program per
    sub-batch amortizes the per-call dispatch overhead (dominant on a
    remote-tunneled TPU), while the cap bounds the vmap's working set (the
    un-fused pyramid grids dominate it).

    Host (numpy) inputs are sliced on host and uploaded per sub-batch, so
    each upload overlaps the previous sub-batch's compute; u8/u16 inputs
    stay quantized on the wire (see :func:`_normalize_image`).
    """
    host_in = isinstance(images, np.ndarray)
    xp = np if host_in else jnp
    images = xp.asarray(images)
    N = images.shape[0]
    has_mask = masks is not None
    if masks is None:
        masks = xp.ones((N, 1, 1), dtype=bool)
    masks = xp.asarray(masks)
    if host_in and has_mask and masks.dtype == bool and masks.ndim == 3:
        # Bit-pack the mask rows for the wire (8x fewer bytes; unpacked on
        # device by _detect_impl).
        masks = np.packbits(masks, axis=-1)

    B = min(batch_size, N)
    pad = (-N) % B
    if pad:
        images = xp.concatenate([images, xp.repeat(images[-1:], pad, 0)])
        masks = xp.concatenate([masks, xp.repeat(masks[-1:], pad, 0)])
    def upload(a):
        """Host slice -> device (utils.transfer owns the tunnel chunking)."""
        if not host_in:
            return jnp.asarray(a)
        from sfm_tpu.utils.transfer import device_put_chunked

        return device_put_chunked(a)

    # Double-buffer: a worker thread uploads sub-batch c+1 while the main
    # thread dispatches compute on sub-batch c — the upload (~1.2 s for
    # bunny-36) otherwise serializes with the ~1.2 s of compute.
    from concurrent.futures import ThreadPoolExecutor

    starts = list(range(0, N + pad, B))
    outs = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(lambda c=starts[0]: (upload(images[c : c + B]),
                                               upload(masks[c : c + B])))
        for i, c in enumerate(starts):
            ib, mb = fut.result()
            if i + 1 < len(starts):
                nxt = starts[i + 1]
                fut = pool.submit(lambda c=nxt: (upload(images[c : c + B]),
                                                 upload(masks[c : c + B])))
            outs.append(_detect_batch_impl(ib, mb, config, has_mask))
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs)[:N], *outs)
    return Features(*merged)
