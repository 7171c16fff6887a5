"""KLT patch tracker (klt.h rebuilt; the reference's alternate tracker).

Forward-additive Lucas-Kanade with analytic spatial gradients and
gain/bias-compensated residuals — the approach klt.h builds its "equation
15" 2x2 gradient-outer-product system from (klt.h:294-331) before its
``#if 1`` block overrides it with the numeric BruteHessian step. We keep
the analytic KLT (the interesting variant the reference abandoned):

    per iteration at position x:
        I  = patch(image, x), with gradients gx, gy (central differences of
             the bilinear surface — the Scharr-style analytic gradient)
        e  = T - alpha*I - beta   (gain/bias compensated residual)
        G  = sum w [gx,gy][gx,gy]^T ;  b = sum w e [gx,gy]
        x += G^-1 b, clamped to 1px, converged when |d| < threshold

Same pyramid cascade/level masking contract as ops/tracker.track_feature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from slam_robot_tpu.ops import patch as patch_ops
from slam_robot_tpu.ops.patch import Patch
from slam_robot_tpu.ops.pyramid import FlatPyramid
from slam_robot_tpu.ops.tracker import _level_patch

_MARGIN = 0.01


def _patch_and_grads(img, width, height, pt, size: int = 13, index=None):
    """Bilinear patch plus its analytic spatial gradients (half-pixel
    central differences of the sampled surface)."""
    ex = lambda q: patch_ops.extract(img, width, height, q, size, index=index)
    p0 = ex(pt)
    hx = jnp.array([0.5, 0.0])
    hy = jnp.array([0.0, 0.5])
    px1 = ex(pt + hx)
    px0 = ex(pt - hx)
    py1 = ex(pt + hy)
    py0 = ex(pt - hy)
    gx = px1.data - px0.data
    gy = py1.data - py0.data
    return p0, gx, gy


def track_level(img, width, height, ref_patch: Patch, pt, weight,
                threshold: float = 0.001, max_iters: int = 10,
                size: int = 13, active=True, index=None):
    wf = jnp.asarray(width, jnp.float32)
    hf = jnp.asarray(height, jnp.float32)

    def oob(xy):
        return (
            (xy[0] < _MARGIN) | (xy[1] < _MARGIN)
            | (xy[0] + _MARGIN > wf) | (xy[1] + _MARGIN > hf)
        )

    def body(carry):
        xy, ok, it, done = carry
        bad = oob(xy)

        cur, gx, gy = _patch_and_grads(img, width, height, xy, size, index=index)
        alpha = jnp.sqrt(ref_patch.sumsq / jnp.maximum(cur.sumsq, 1e-12))
        beta = ref_patch.mean - alpha * cur.mean
        e = ref_patch.data - cur.data * alpha - beta
        m = (ref_patch.valid & cur.valid).astype(jnp.float32) * weight

        gxx = jnp.sum(m * gx * gx)
        gxy = jnp.sum(m * gx * gy)
        gyy = jnp.sum(m * gy * gy)
        bx = jnp.sum(m * e * gx) / jnp.maximum(alpha, 1e-6)
        by = jnp.sum(m * e * gy) / jnp.maximum(alpha, 1e-6)
        det = gxx * gyy - gxy * gxy
        sdet = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
        d = jnp.stack([(gyy * bx - gxy * by), (gxx * by - gxy * bx)]) / sdet
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        n = jnp.linalg.norm(d)
        d = jnp.where(n > 1.0, d / jnp.maximum(n, 1e-20), d)

        new_xy = jnp.where(bad, xy, xy + d)
        conv = (jnp.abs(d[0]) < threshold) & (jnp.abs(d[1]) < threshold)
        new_done = done | bad | conv
        return (
            jnp.where(done, xy, new_xy),
            ok & ~bad,
            it + 1,
            new_done,
        )

    def cond(c):
        _, _, it, done = c
        return (it < max_iters) & ~done

    pt = jnp.asarray(pt, jnp.float32)
    done0 = ~jnp.asarray(active, bool)
    xy, ok, _, _ = lax.while_loop(cond, body, (pt, jnp.bool_(True), jnp.int32(0), done0))
    ok = ok & ~oob(xy)
    return xy, ok


def track_feature(pyr: FlatPyramid, patches: Patch, pt, lvls, weight,
                  threshold: float = 0.001, max_iters: int = 10, active=True):
    """Coarse-to-fine KLT with the same contract as tracker.track_feature."""
    n_levels = pyr.depth
    lvls = jnp.asarray(lvls, jnp.int32)
    p0 = jnp.asarray(pt, jnp.float32) / (2.0 ** (lvls - 1)).astype(jnp.float32)
    active = jnp.asarray(active, bool)

    def body(k, carry):
        p, ok = carry
        i = n_levels - 1 - k
        take = (i <= lvls - 1) & ok & active
        img, j, w, h = pyr.level_ref(i)
        new_p, st = track_level(img, w, h, _level_patch(patches, i), p, weight,
                                threshold, max_iters, active=take, index=j)
        p = jnp.where(take, new_p, p)
        ok = jnp.where(take, st, ok)
        p = jnp.where((i <= lvls - 1) & (i > 0), p * 2.0, p)
        return p, ok

    p, ok = lax.fori_loop(0, n_levels, body, (p0, jnp.bool_(True)))
    return p, ok & active
