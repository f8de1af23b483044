"""Gaussian scale-space pyramid as separable convolutions.

Each octave holds S+3 Gaussian images built by *incremental* blurs (blur the
previous layer by sqrt(sig_i^2 - sig_{i-1}^2)) and S+2 DoG layers. Octave
downsampling takes every second pixel of the layer with 2x the base sigma —
the standard SIFT construction, expressed so every op is a fixed-shape conv
XLA can fuse and tile.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


import numpy as np


def _gaussian_taps(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a (..., H, W) float32 image, SAME-zero pad.

    ``sigma`` is a Python float (static): the taps are baked at trace time.
    Implemented as shift-and-add (each tap is a static slice of the padded
    image) instead of conv_general_dilated: 1-channel convs cannot use the
    MXU, and the f32 precision they need (bf16 quantization creates ~40%
    spurious DoG extrema at contrast 0.006) makes them 18x slower than this
    fused VPU elementwise chain (measured 658 -> 37 ms for the octave-0 blur
    stack at 1536x2048). Elementwise FMA is exact f32, so no precision flag
    is needed; output matches the HIGHEST-precision conv to ~5e-7.

    The production pyramid uses :func:`gaussian_blur_mm` (banded matmuls on
    the MXU, ~16% faster end-to-end); this exact-f32 path remains the
    numerics oracle and the small-image (< MXU tile) path.
    """
    if sigma <= 0:
        return img
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gaussian_taps(sigma, radius)
    h, w = img.shape[-2], img.shape[-1]
    pad = [(0, 0)] * (img.ndim - 2)
    x = jnp.pad(img, pad + [(0, 0), (radius, radius)])
    out = sum(
        float(k[i]) * jax.lax.dynamic_slice_in_dim(x, i, w, axis=-1)
        for i in range(2 * radius + 1)
    )
    x = jnp.pad(out, pad + [(radius, radius), (0, 0)])
    out = sum(
        float(k[i]) * jax.lax.dynamic_slice_in_dim(x, i, h, axis=-2)
        for i in range(2 * radius + 1)
    )
    return out


def _band_matrix(taps: np.ndarray, n: int) -> jnp.ndarray:
    """(n, n) banded blur matrix built IN-GRAPH from static taps.

    B[r, c] = taps[c - r + radius] for |c - r| <= radius, else 0: one
    compare+select per tap over an iota grid. Built in-graph (not as a
    baked numpy constant) so large band matrices don't bloat the serialized
    executable the remote-compile tunnel uploads; XLA CSEs the build per
    (sigma, n) within a program and hoists it out of vmap.
    """
    radius = (len(taps) - 1) // 2
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = c - r
    B = jnp.zeros((n, n), jnp.float32)
    for i, t in enumerate(taps):
        B = B + jnp.where(d == (i - radius), jnp.float32(t), 0.0)
    return B


def gaussian_blur_mm(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian blur as two banded matmuls on the MXU, SAME-zero pad.

    Same taps and pad semantics as :func:`gaussian_blur`, contracted as
    ``(img @ B_W) then (@ B_H)`` with 3-pass-bf16 precision. The shift-add
    path re-reads the padded image once per tap through HBM (no register
    blocking across the 9-21 term sum); the matmul reads each operand once
    and runs at MXU rate. Measured on v5e (768x1024, batch 12): pyramid
    8.6 -> 7.3 ms/image, |DoG| deviation <= 3e-5 — 200x below the 0.006
    contrast gate. Small images (below one 128-lane MXU tile) keep the
    exact shift-add path; CPU (tests) resolves HIGH precision to exact f32,
    so the oracle comparison is bit-meaningful there.
    """
    if sigma <= 0:
        return img
    h, w = img.shape[-2], img.shape[-1]
    if h < 128 or w < 128:  # below MXU tile: shift-add wins and stays exact
        return gaussian_blur(img, sigma)
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gaussian_taps(sigma, radius)
    BW = _band_matrix(k, w)
    BH = _band_matrix(k, h)
    x = jax.lax.dot_general(
        img, BW, (((img.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGH,
    )
    x = jnp.swapaxes(x, -1, -2)
    x = jax.lax.dot_general(
        x, BH, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGH,
    )
    return jnp.swapaxes(x, -1, -2)


def layer_sigmas(num_layers: int, sigma0: float, scales_per_octave: int):
    """Absolute blur of each layer within an octave (octave-relative units)."""
    k = 2.0 ** (1.0 / scales_per_octave)
    return [sigma0 * (k**i) for i in range(num_layers)]


@partial(jax.jit, static_argnames=(
    "num_octaves", "scales_per_octave", "sigma0", "assumed_blur", "upsample"))
def build_pyramid(
    image: jnp.ndarray,
    num_octaves: int = 4,
    scales_per_octave: int = 3,
    sigma0: float = 1.6,
    assumed_blur: float = 0.5,
    upsample: bool = False,
):
    """(H, W) float32 in [0,1] -> (gaussians, dogs).

    gaussians: list of per-octave (S+3, h_o, w_o) stacks;
    dogs:      list of per-octave (S+2, h_o, w_o) stacks.
    Octave o has resolution (H >> o, W >> o); with ``upsample`` the first
    octave is the 2x-upsampled image (SIFT's -1 octave: doubles the keypoint
    yield on fine structures) and callers scale coordinates by 0.5.
    """
    S = scales_per_octave
    sigmas = layer_sigmas(S + 3, sigma0, S)

    img = image.astype(jnp.float32)
    if upsample:
        h, w = img.shape
        img = jax.image.resize(img, (2 * h, 2 * w), method="bilinear")
        assumed_blur = assumed_blur * 2.0  # blur scales with the resampling

    # Bring the input up to sigma0.
    base_extra = math.sqrt(max(sigma0**2 - assumed_blur**2, 1e-8))
    base = gaussian_blur_mm(img, base_extra)

    gaussians = []
    dogs = []
    for o in range(num_octaves):
        layers = [base]
        for i in range(1, S + 3):
            inc = math.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-8))
            layers.append(gaussian_blur_mm(layers[-1], inc))
        g = jnp.stack(layers)
        gaussians.append(g)
        dogs.append(g[1:] - g[:-1])
        # Next octave base: the layer with blur 2*sigma0, subsampled 2x.
        base = layers[S][::2, ::2]
    return gaussians, dogs
