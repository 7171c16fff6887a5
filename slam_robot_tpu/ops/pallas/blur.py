"""Separable 5-tap Gaussian blur as a single Pallas kernel.

The pyramid builder's per-level GaussianBlur (hessian.h:102,113) lowers in
XLA to two conv_general_dilated calls with intermediate HBM round trips.
This kernel keeps the whole level in VMEM and applies both passes in one
program: the vertical pass is five shifted static slices accumulated in a
VMEM scratch, the horizontal pass five more on the result — pure VPU work,
one HBM read and one write per level.

Border handling (reflect-101, OpenCV's default) happens IN-KERNEL via
static concats of 1-wide edge slices. The earlier design padded outside
with jnp.pad, which XLA fused with the preceding pyrDown decimation into a
computed-index gather costing ~780 us/frame on the hot path
(trace-measured); with the border inside the kernel the decimation is a
plain strided copy feeding the next pallas_call's VMEM operand (~1 us).

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
    x = x_ref[:]
    h = o_ref.shape[0]
    w = o_ref.shape[1]
    # vertical pass with reflect-101 rows: [x2, x1 | x | x_{h-2}, x_{h-3}]
    top = jnp.concatenate([x[2:3, :], x[1:2, :]], axis=0)
    bot = jnp.concatenate([x[h - 2:h - 1, :], x[h - 3:h - 2, :]], axis=0)
    xv = jnp.concatenate([top, x, bot], axis=0)
    acc = k_ref[0, 0] * xv[0:h, :]
    for i in range(1, 2 * _R + 1):
        acc = acc + k_ref[0, i] * xv[i : i + h, :]
    # horizontal pass with reflect-101 columns on the vertical result
    left = jnp.concatenate([acc[:, 2:3], acc[:, 1:2]], axis=1)
    right = jnp.concatenate([acc[:, w - 2:w - 1], acc[:, w - 3:w - 2]], axis=1)
    scratch[:, :] = jnp.concatenate([left, acc, right], axis=1)
    out = k_ref[0, 0] * scratch[:, 0:w]
    for j in range(1, 2 * _R + 1):
        out = out + k_ref[0, j] * scratch[:, j : j + w]
    o_ref[:, :] = out


def _call(img, k, interpret: bool):
    h, w = img.shape
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
    )(k, img)


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def blur(img, sigma: float = 1.1, interpret: bool = False):
    """Gaussian 5x5 blur of a [H, W] f32 image, reflect-101 border.

    Drop-in replacement for ops/pyramid.blur (same kernel weights, same
    border); ``interpret=True`` runs the kernel in interpreter mode for
    host-side tests.
    """
    img = jnp.asarray(img, jnp.float32)
    k = gaussian_kernel(sigma, 2 * _R + 1).reshape(1, -1)
    return _call(img, k, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pyr_down(img, interpret: bool = False):
    """OpenCV pyrDown (binomial 5x5 + 2x decimation to (n+1)//2): the
    separable conv runs as the Pallas blur kernel at full resolution; the
    2x decimation is a strided slice of the kernel output (cheap now that
    no pad-gather can fuse into it; in-Mosaic strided access is still
    unsupported). Drop-in for ops/pyramid.pyr_down."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    k = (jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0).reshape(1, -1)
    full = _call(img, k, interpret)
    # decimation WITHOUT a strided slice: a plain full[::2, ::2] here
    # lowers to a 76k-element computed-index gather costing ~780 us/frame
    # (trace-measured; an optimization_barrier does not prevent it). Rows
    # decimate as a contiguous reshape + static slice; columns (the lane
    # dimension, where stride-2 is the pathological case) via a 0/1
    # selection matmul on the MXU (~98 MFLOP at level 0 — microseconds).
    ho, wo = (h + 1) // 2, (w + 1) // 2
    rows = full.reshape(ho, 2, w)[:, 0, :] if h % 2 == 0 else (
        jnp.concatenate([full, full[-1:]], 0).reshape(ho, 2, w)[:, 0, :]
    )
    csel = (jnp.arange(w)[:, None] == 2 * jnp.arange(wo)[None, :]).astype(
        jnp.float32
    )
    return jnp.matmul(rows, csel, precision=jax.lax.Precision.HIGHEST)
