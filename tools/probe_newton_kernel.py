"""Benchmark a representative fused-Newton-level kernel skeleton on the chip.

Shapes: F=256 lanes, window 32x32, patch 13x13, 6 Newton iterations.
Per iteration: build banded bilinear row/col matrices, two batched
dot_generals (extraction), score + grad + Hessian via jvp-of-grad.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, WS, S, IT = 256, 32, 13, 6


def interp_mats(local):
    """local: [F,2] window-local patch origin (sub-pixel). Returns
    row [F,S,WS], col [F,WS,S] banded bilinear matrices.

    Integer band positions are compared with int iota (TPU iota must be
    integer); the fractional mixing stays differentiable through fx/fy
    (jnp.floor has zero gradient, so d/dlocal flows via the frac part)."""
    x0 = jnp.floor(local[:, 0])
    y0 = jnp.floor(local[:, 1])
    fx = (local[:, 0] - x0)[:, None, None]
    fy = (local[:, 1] - y0)[:, None, None]
    x0i = x0.astype(jnp.int32)[:, None, None]
    y0i = y0.astype(jnp.int32)[:, None, None]
    i = jax.lax.broadcasted_iota(jnp.int32, (F, S, WS), 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (F, S, WS), 2)
    row = jnp.where(k == i + y0i, 1.0 - fy, 0.0) + jnp.where(
        k == i + y0i + 1, fy, 0.0
    )
    kc = jax.lax.broadcasted_iota(jnp.int32, (F, WS, S), 1)
    jc = jax.lax.broadcasted_iota(jnp.int32, (F, WS, S), 2)
    col = jnp.where(kc == jc + x0i, 1.0 - fx, 0.0) + jnp.where(
        kc == jc + x0i + 1, fx, 0.0
    )
    return row, col


def extract(win, local):
    row, col = interp_mats(local)
    tmp = jax.lax.dot_general(
        row, win, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return jax.lax.dot_general(
        tmp, col, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _mean2(a):
    # sequential single-axis reductions: axis=(1,2) reduce SIGABRTs the
    # remote Mosaic compiler (probe_newton_bisect)
    return jnp.sum(jnp.sum(a, axis=2), axis=1) / (a.shape[1] * a.shape[2])


def _sum2(a):
    return jnp.sum(jnp.sum(a, axis=2), axis=1)


def newton_kernel(win_ref, pos_ref, ref_ref, w_ref, out_ref):
    win = win_ref[:]
    refp = ref_ref[:]
    wmask = w_ref[:]
    r_mean = _mean2(refp)
    r_sumsq = _mean2(refp * refp)

    def score_sum(local):
        p2 = extract(win, local)
        m2 = _mean2(p2)
        ss2 = _mean2(p2 * p2)
        alpha = jnp.sqrt(r_sumsq / jnp.maximum(ss2, 1e-12))
        beta = r_mean - alpha * m2
        d = refp - p2 * alpha[:, None, None] - beta[:, None, None]
        return _sum2(d * d * wmask[None])

    total = lambda p: jnp.sum(score_sum(p))
    grad_fn = jax.grad(total)

    def body(_, pos):
        g = grad_fn(pos)
        one = jnp.ones((F,), jnp.float32)
        zero = jnp.zeros((F,), jnp.float32)
        ex = jnp.stack([one, zero], -1)
        ey = jnp.stack([zero, one], -1)
        _, hx = jax.jvp(grad_fn, (pos,), (ex,))
        _, hy = jax.jvp(grad_fn, (pos,), (ey,))
        det = hx[:, 0] * hy[:, 1] - hx[:, 1] * hy[:, 0]
        safe = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
        dx = -(hy[:, 1] * g[:, 0] - hx[:, 1] * g[:, 1]) / safe
        dy = -(-hy[:, 0] * g[:, 0] + hx[:, 0] * g[:, 1]) / safe
        d = jnp.stack([dx, dy], -1)
        n = jnp.sqrt(jnp.sum(d * d, -1, keepdims=True))
        d = jnp.where(n > 1.0, d / jnp.maximum(n, 1e-20), d)
        return pos + jnp.clip(d, -1.0, 1.0)

    out_ref[:] = jax.lax.fori_loop(0, IT, body, pos_ref[:])


@jax.jit
def run(win, pos, refp, wmask):
    return pl.pallas_call(
        newton_kernel,
        out_shape=jax.ShapeDtypeStruct((F, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, pos, refp, wmask)


if __name__ == "__main__":
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    win = jax.random.uniform(key, (F, WS, WS))
    refp = jax.random.uniform(key, (F, S, S))
    pos = jnp.full((F, 2), 9.3)
    wmask = jnp.ones((S, S))
    try:
        t0 = time.time()
        out = jax.block_until_ready(run(win, pos, refp, wmask))
        print(f"compile+run {time.time()-t0:.1f}s, out[0]={np.asarray(out)[0]}")
        n = 50
        t0 = time.time()
        for _ in range(n):
            out = run(win, pos, refp, wmask)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n * 1e3
        print(f"PASS newton-skeleton: {dt:.3f} ms per level-sweep kernel "
              f"(6 Newton iters, {F} lanes)")
    except Exception as e:  # noqa: BLE001
        print("FAIL:", type(e).__name__, str(e).split(chr(10))[0][:300])
