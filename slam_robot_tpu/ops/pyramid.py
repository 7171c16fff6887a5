"""Gaussian image pyramids (hessian.h:95-126 semantics, TPU-shaped).

Reference recipe per MakePyramid: grey f32/255, GaussianBlur 5x5 sigma=1.1 at
level 0; each further level is pyrDown (5x5 [1,4,6,4,1]/16 binomial filter +
2x decimation to size (n+1)/2) followed by GaussianBlur 5x5 sigma=0.8.

TPU-native choices:
- images are [H, W] f32 in HBM; convolutions are separable
  ``lax.conv_general_dilated`` calls XLA fuses well
- every level is stored *edge-padded* by ``PAD`` pixels so the tracker's
  sub-pixel patch extraction is a pure dynamic-slice + bilinear mix with
  getRectSubPix's replicate-border semantics and no scatter/clamp logic in
  the hot loop
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Padding around every pyramid level. Must cover half a patch (6 for 13x13)
# plus one pixel of bilinear support plus the tracker's max single-step
# excursion; 8 is enough and keeps the lane dimension friendly.
PAD = 8


class PyramidLevel(NamedTuple):
    padded: jnp.ndarray   # [H + 2*PAD, W + 2*PAD] f32, edge-replicated
    height: int           # static original height
    width: int            # static original width


def to_grey(img) -> jnp.ndarray:
    """RGB (or already-grey) uint8/f32 -> grey f32 in [0,1].

    Uses the CV_RGB2GRAY weights (0.299, 0.587, 0.114) the reference's
    cvtColor applies (hessian.h:100).
    """
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    if img.ndim == 3:
        w = jnp.array([0.299, 0.587, 0.114], img.dtype)
        img = img @ w
    return img


def gaussian_kernel(sigma: float, size: int = 5) -> jnp.ndarray:
    """OpenCV getGaussianKernel: exp(-(i-c)^2 / (2 sigma^2)), normalized."""
    i = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-(i * i) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _sep_conv(img, kernel1d, stride: int = 1):
    """Separable 2D correlation with reflect-101 border (OpenCV default)."""
    ksz = kernel1d.shape[0]
    r = ksz // 2
    x = jnp.pad(img, ((r, r), (r, r)), mode="reflect")[None, None]
    kv = kernel1d.reshape(1, 1, ksz, 1)
    kh = kernel1d.reshape(1, 1, 1, ksz)
    x = lax.conv_general_dilated(x, kv, (stride, 1), "VALID", precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, kh, (1, stride), "VALID", precision=lax.Precision.HIGHEST)
    return x[0, 0]


def blur(img, sigma: float, size: int = 5):
    return _sep_conv(img, gaussian_kernel(sigma, size))


_PYRDOWN_K = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def pyr_down(img):
    """OpenCV pyrDown: binomial 5x5 + 2x decimation to size (n+1)//2."""
    return _sep_conv(img, _PYRDOWN_K, stride=2)


def _edge_pad(img, pad: int = PAD):
    return jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")


@functools.partial(jax.jit, static_argnames=("depth", "sigma0", "sigma_down"))
def build_pyramid(img, depth: int = 6, sigma0: float = 1.1, sigma_down: float = 0.8
                  ) -> tuple[PyramidLevel, ...]:
    """Full MakePyramid: returns ``depth`` edge-padded levels.

    Level sizes are static functions of the input shape, so the whole
    pipeline compiles once per camera resolution.
    """
    g = to_grey(img)
    g = blur(g, sigma0)
    levels = [g]
    for _ in range(1, depth):
        g = blur(pyr_down(g), sigma_down)
        levels.append(g)
    return tuple(
        PyramidLevel(padded=_edge_pad(l), height=l.shape[0], width=l.shape[1])
        for l in levels
    )
