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
    base = gaussian_blur(img, base_extra)

    gaussians = []
    dogs = []
    for o in range(num_octaves):
        layers = [base]
        for i in range(1, S + 3):
            inc = math.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-8))
            layers.append(gaussian_blur(layers[-1], inc))
        g = jnp.stack(layers)
        gaussians.append(g)
        dogs.append(g[1:] - g[:-1])
        # Next octave base: the layer with blur 2*sigma0, subsampled 2x.
        base = layers[S][::2, ::2]
    return gaussians, dogs
