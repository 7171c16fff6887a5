"""Sub-pixel patch extraction and photometric-invariant scoring.

Rebuilds HessianTracker's GetPatch / ScorePatchMatch / radial weight mask
(hessian.h:11-30, 54-93, 129-141) on flat edge-padded pyramids:

- extraction is one dynamic-slice of (S+1)x(S+1) plus a bilinear mix — no
  per-pixel gathers; the level image may be any (possibly traced) slice of
  a FlatPyramid, with its true width/height passed as (possibly traced)
  scalars
- getRectSubPix's replicate-border behavior comes from the pyramid's edge
  padding; a boolean validity mask marks pixels whose bilinear support fell
  outside the true image (the reference zeroes such pixels via its
  shift-and-zero-fill logic at hessian.h:63-76 and then skips zeros in
  ScorePatchMatch at hessian.h:134-135 — an explicit mask is the same skip
  without the value-sentinel aliasing)
- scoring: gain/bias compensation alpha = sqrt(sumsq1/sumsq2),
  beta = mean1 - alpha*mean2 over the weighted SSD with the normalized
  radial mask 1/(15 + r^2)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from slam_robot_tpu.ops.pyramid import PAD


class Patch(NamedTuple):
    data: jnp.ndarray    # [S, S] f32  (leading axes allowed for stacks)
    valid: jnp.ndarray   # [S, S] bool
    mean: jnp.ndarray    # scalar: sum/S^2 (over all pixels, like the ref)
    sumsq: jnp.ndarray   # scalar: sum of squares / S^2


@functools.lru_cache(maxsize=None)
def _radial_mask_np(size: int, bias: float):
    import numpy as np

    x = np.arange(size, dtype=np.float32)
    rx = 0.5 * size - x
    rr = rx[None, :] ** 2 + rx[:, None] ** 2
    m = 1.0 / (bias + rr)
    return m * (size * size / np.sum(m))


def radial_mask(size: int = 13, bias: float = 15.0) -> jnp.ndarray:
    """1/(bias + r^2) about the (0.5*size) corner-offset center, normalized
    to mean 1 (hessian.h:11-30 — note the reference centers at 0.5*size,
    not the pixel center (size-1)/2; we keep its exact weighting).

    Only the numpy value is cached: any jnp value produced inside a jit
    trace is a tracer, and caching one leaks it across traces."""
    return jnp.asarray(_radial_mask_np(size, float(bias)))


def extract(img, width, height, pt, size: int = 13, index=None) -> Patch:
    """Patch of `size`^2 centered at sub-pixel pt=(x,y) in level coordinates.

    ``img`` is an edge-padded level image [Hp, Wp] — or, with ``index``
    given, a stack [N, Hp, Wp] from which plane ``index`` is sliced *inside
    the same dynamic_slice* (so a traced per-lane level/view index never
    gathers a whole image). ``width``/``height`` are the level's true
    (unpadded) extents — static or traced. Equivalent to getRectSubPix with
    replicate border (hessian.h:77-83). pt follows the pixel-center
    convention.
    """
    half = (size - 1) // 2
    x, y = pt[0], pt[1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)

    # (size+1)^2 window starting at the patch's top-left support pixel.
    # Clamp inside the *level's* padded extent so replicate-edge semantics
    # hold even for wildly out-of-bounds points (validity handles meaning).
    sy = jnp.clip(y0 - half + PAD, 0, height + 2 * PAD - (size + 1))
    sx = jnp.clip(x0 - half + PAD, 0, width + 2 * PAD - (size + 1))
    if index is None:
        win = lax.dynamic_slice(img, (sy, sx), (size + 1, size + 1))
    else:
        win = lax.dynamic_slice(
            img, (index, sy, sx), (1, size + 1, size + 1)
        )[0]

    p = (
        (1 - fy) * (1 - fx) * win[:size, :size]
        + (1 - fy) * fx * win[:size, 1:]
        + fy * (1 - fx) * win[1:, :size]
        + fy * fx * win[1:, 1:]
    )

    # validity: bilinear support inside the true image
    w = jnp.asarray(width, jnp.float32)
    h = jnp.asarray(height, jnp.float32)
    gx = x0.astype(jnp.float32) + jnp.arange(size, dtype=jnp.float32) - half
    gy = y0.astype(jnp.float32) + jnp.arange(size, dtype=jnp.float32) - half
    vx = (gx >= 0) & (gx + 1 <= w)
    vy = (gy >= 0) & (gy + 1 <= h)
    valid = vy[:, None] & vx[None, :]

    n = size * size
    return Patch(
        data=p,
        valid=valid,
        mean=jnp.sum(p) / n,
        sumsq=jnp.sum(p * p) / n,
    )


def score(p1: Patch, p2: Patch, weight: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Lighting-invariant weighted SSD (hessian.h:129-141).

    alpha = sqrt(sumsq1 / sumsq2); beta = mean1 - alpha*mean2;
    sum over mutually valid pixels of weight * (p1 - alpha*p2 - beta)^2.
    """
    alpha = jnp.sqrt(p1.sumsq / jnp.maximum(p2.sumsq, eps))
    beta = p1.mean - alpha * p2.mean
    diff = p1.data - p2.data * alpha - beta
    ok = p1.valid & p2.valid
    return jnp.sum(jnp.where(ok, diff * diff * weight, 0.0))
