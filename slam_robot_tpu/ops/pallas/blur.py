"""Separable 5-tap Gaussian blur as a single Pallas kernel.

The pyramid builder's per-level GaussianBlur (hessian.h:102,113) lowers in
XLA to two conv_general_dilated calls with intermediate HBM round trips.
This kernel keeps the whole level in VMEM and applies both passes in one
program: the vertical pass is five shifted static slices accumulated in a
VMEM scratch, the horizontal pass five more on the result — pure VPU work,
one HBM read and one write per level.

Border handling: the caller passes a reflect-101-padded image (radius 2),
matching OpenCV's default border and the XLA path in ops/pyramid._sep_conv,
so the kernel itself only does VALID accumulation with static slices.

A 480x640 f32 level is ~1.2MB; level + scratch + output fit VMEM
comfortably for every pyramid level of the reference resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_robot_tpu.ops.pyramid import gaussian_kernel

_R = 2  # 5-tap radius


def _blur_kernel(k_ref, x_ref, o_ref, scratch):
    # vertical pass: x is [H + 4, W + 4] padded; scratch holds [H, W + 4]
    h = o_ref.shape[0]
    w = o_ref.shape[1]
    acc = k_ref[0, 0] * x_ref[0:h, :]
    for i in range(1, 2 * _R + 1):
        acc = acc + k_ref[0, i] * x_ref[i : i + h, :]
    scratch[:, :] = acc
    # horizontal pass
    out = k_ref[0, 0] * scratch[:, 0:w]
    for j in range(1, 2 * _R + 1):
        out = out + k_ref[0, j] * scratch[:, j : j + w]
    o_ref[:, :] = out


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def blur(img, sigma: float = 1.1, interpret: bool = False):
    """Gaussian 5x5 blur of a [H, W] f32 image, reflect-101 border.

    Drop-in replacement for ops/pyramid.blur (same kernel weights, same
    border); ``interpret=True`` runs the kernel in interpreter mode for
    host-side tests.
    """
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    x = jnp.pad(img, _R, mode="reflect")
    k = gaussian_kernel(sigma, 2 * _R + 1).reshape(1, -1)

    return pl.pallas_call(
        _blur_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w + 2 * _R), jnp.float32)],
        interpret=interpret,
    )(k, x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pyr_down(img, interpret: bool = False):
    """OpenCV pyrDown (binomial 5x5 + 2x decimation to (n+1)//2): the
    separable conv runs as the Pallas blur kernel at full resolution; the
    2x decimation stays in XLA (strided access inside Mosaic lowers to an
    unsupported gather). Drop-in for ops/pyramid.pyr_down."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    x = jnp.pad(img, _R, mode="reflect")
    k = (jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0).reshape(1, -1)

    full = pl.pallas_call(
        _blur_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w + 2 * _R), jnp.float32)],
        interpret=interpret,
    )(k, x)
    return full[::2, ::2]
