"""Orientation assignment + 128-D descriptor, as gather + einsum.

The classic SIFT descriptor loops over a rotated patch per keypoint; here the
patch is a *static* unit sample grid (so the Gaussian window weights and the
spatial-bin interpolation weights are compile-time constants), scaled by the
keypoint sigma and rotated by its orientation. Per keypoint the only dynamic
work is one batched bilinear gather of the gradient field and an einsum onto
the (4x4 spatial) x (8 orientation) bins — the einsum contracts 256 samples,
which XLA maps onto the MXU across the keypoint batch.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * np.pi


def octave_gradients(gauss):
    """(S+3, h, w) Gaussian stack -> gradient stacks for interior layers.

    Returns (gx, gy), each (S, h, w), central differences of layers 1..S.
    """
    inner = gauss[1:-2]  # layers 1..S (match DoG interior layers)
    gx = 0.5 * (jnp.roll(inner, -1, axis=-1) - jnp.roll(inner, 1, axis=-1))
    gy = 0.5 * (jnp.roll(inner, -1, axis=-2) - jnp.roll(inner, 1, axis=-2))
    return gx, gy


def _bilinear_gather(stack, layer_idx, xs, ys):
    """Sample a (S, h, w) stack at float positions for one layer.

    layer_idx: () int; xs, ys: (P,) float octave coords. Returns (P,) values
    and a (P,) in-bounds mask.
    """
    S, h, w = stack.shape
    inb = (xs >= 0) & (xs <= w - 1.001) & (ys >= 0) & (ys <= h - 1.001)
    x = jnp.clip(xs, 0.0, w - 1.001)
    y = jnp.clip(ys, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = stack.reshape(-1)
    base = layer_idx * (h * w)
    i00 = base + y0 * w + x0
    v00 = flat[i00]
    v01 = flat[i00 + 1]
    v10 = flat[i00 + w]
    v11 = flat[i00 + w + 1]
    v = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return v, inb


# ---------------------------------------------------------------------------
# Static grids (numpy, baked at trace time)
# ---------------------------------------------------------------------------

def _unit_grid(n: int):
    """n x n sample offsets with unit half-extent, flattened to (n*n, 2)."""
    c = (np.arange(n, dtype=np.float32) + 0.5) / n * 2.0 - 1.0
    u, v = np.meshgrid(c, c)
    return np.stack([u.reshape(-1), v.reshape(-1)], axis=-1)  # (n*n, [x, y])


_ORI_GRID = _unit_grid(16)                               # (256, 2) in [-1, 1]
_ORI_W = np.exp(-4.5 * np.sum(_ORI_GRID**2, axis=-1)).astype(np.float32)
# orientation window: offsets = 4.5*sigma * unit, Gaussian sigma = 1.5*sigma
# -> weight exp(-|off|^2 / (2 (1.5 s)^2)) = exp(-4.5 |unit|^2): static.


def _spatial_weights(n_samples_axis: int = 16, n_bins: int = 4):
    """Static bilinear weights from sample positions (bin units) to bins.

    Samples live at bin-unit coords spanning [-n_bins/2, n_bins/2]; bin centers
    at -1.5, -0.5, 0.5, 1.5. Returns (n_samples_axis, n_bins) per-axis weights.
    """
    coords = ((np.arange(n_samples_axis) + 0.5) / n_samples_axis) * n_bins - n_bins / 2.0
    centers = np.arange(n_bins) - (n_bins - 1) / 2.0
    d = np.abs(coords[:, None] - centers[None, :])
    return np.maximum(0.0, 1.0 - d).astype(np.float32)


_DESC_N = 16
_DESC_BINS = 4
_DESC_GRID = _unit_grid(_DESC_N) * (_DESC_BINS / 2.0)     # (256, 2) bin units
_W_AXIS = _spatial_weights(_DESC_N, _DESC_BINS)           # (16, 4)
# Full spatial weight: outer product over the two axes -> (256, 16 bins).
_W_SPATIAL = np.einsum(
    "ib,jc->ijbc", _W_AXIS, _W_AXIS
).reshape(_DESC_N, _DESC_N, -1).reshape(-1, _DESC_BINS * _DESC_BINS)
# Gaussian window over the descriptor (sigma = half window = 2 bin units).
_DESC_WG = np.exp(
    -np.sum(_DESC_GRID**2, axis=-1) / (2.0 * (_DESC_BINS / 2.0) ** 2)
).astype(np.float32)


def keypoint_orientation(gx, gy, x, y, layer, sigma_rel, num_bins: int = 36):
    """Dominant gradient orientation of one keypoint. Returns angle in [0, 2pi).

    x, y: octave coords; layer: int index into the (S, h, w) gradient stacks;
    sigma_rel: octave-relative keypoint sigma.
    """
    offs = jnp.asarray(_ORI_GRID) * (4.5 * sigma_rel)      # (256, 2)
    xs = x + offs[:, 0]
    ys = y + offs[:, 1]
    vx, inb = _bilinear_gather(gx, layer, xs, ys)
    vy, _ = _bilinear_gather(gy, layer, xs, ys)
    mag = jnp.sqrt(vx * vx + vy * vy)
    theta = jnp.arctan2(vy, vx) % _TWO_PI
    wgt = mag * jnp.asarray(_ORI_W) * inb

    b = theta * (num_bins / _TWO_PI)
    b0 = jnp.floor(b)
    frac = b - b0
    b0 = b0.astype(jnp.int32) % num_bins
    b1 = (b0 + 1) % num_bins
    bins = jnp.arange(num_bins)
    hist = jnp.sum(
        wgt[:, None]
        * ((bins[None, :] == b0[:, None]) * (1 - frac[:, None])
           + (bins[None, :] == b1[:, None]) * frac[:, None]),
        axis=0,
    )
    # Two rounds of circular [1, 4, 6, 4, 1]/16 smoothing.
    for _ in range(2):
        hist = (
            6 * hist
            + 4 * (jnp.roll(hist, 1) + jnp.roll(hist, -1))
            + (jnp.roll(hist, 2) + jnp.roll(hist, -2))
        ) / 16.0
    p = jnp.argmax(hist)
    hl = hist[(p - 1) % num_bins]
    hc = hist[p]
    hr = hist[(p + 1) % num_bins]
    denom = hl - 2 * hc + hr
    shift = jnp.where(jnp.abs(denom) < 1e-12, 0.0, 0.5 * (hl - hr) / denom)
    return ((p.astype(jnp.float32) + 0.5 + shift) * (_TWO_PI / num_bins)) % _TWO_PI


def keypoint_descriptor(
    gx, gy, x, y, layer, sigma_rel, angle,
    descriptor_scale: float = 3.0,
    clip: float = 0.2,
):
    """128-D SIFT descriptor for one keypoint (vmap over the batch axis)."""
    bin_size = descriptor_scale * sigma_rel
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)
    g = jnp.asarray(_DESC_GRID) * bin_size                 # (256, 2)
    xs = x + ca * g[:, 0] - sa * g[:, 1]
    ys = y + sa * g[:, 0] + ca * g[:, 1]
    vx, inb = _bilinear_gather(gx, layer, xs, ys)
    vy, _ = _bilinear_gather(gy, layer, xs, ys)
    mag = jnp.sqrt(vx * vx + vy * vy)
    theta = (jnp.arctan2(vy, vx) - angle) % _TWO_PI

    nb = 8
    b = theta * (nb / _TWO_PI)
    b0 = jnp.floor(b)
    frac = b - b0
    b0 = b0.astype(jnp.int32) % nb
    b1 = (b0 + 1) % nb
    obins = jnp.arange(nb)
    w_orient = (
        (obins[None, :] == b0[:, None]) * (1 - frac[:, None])
        + (obins[None, :] == b1[:, None]) * frac[:, None]
    )  # (256, 8)

    contrib = mag * jnp.asarray(_DESC_WG) * inb            # (256,)
    desc = jnp.einsum(
        "sb,so->bo", jnp.asarray(_W_SPATIAL) * contrib[:, None], w_orient
    ).reshape(-1)                                           # (128,)

    norm = jnp.maximum(jnp.linalg.norm(desc), 1e-12)
    desc = jnp.minimum(desc / norm, clip)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-12)
    return desc
