"""Bisect the SIGABRT in the fused Newton skeleton: which stage kills the
remote Mosaic compiler?"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, WS, S, IT = 256, 32, 13, 6


def interp_mats(local):
    x0 = jnp.floor(local[:, 0])
    y0 = jnp.floor(local[:, 1])
    fx = (local[:, 0] - x0)[:, None, None]
    fy = (local[:, 1] - y0)[:, None, None]
    x0i = x0.astype(jnp.int32)[:, None, None]
    y0i = y0.astype(jnp.int32)[:, None, None]
    i = jax.lax.broadcasted_iota(jnp.int32, (F, S, WS), 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (F, S, WS), 2)
    row = jnp.where(k == i + y0i, 1.0 - fy, 0.0) + jnp.where(k == i + y0i + 1, fy, 0.0)
    kc = jax.lax.broadcasted_iota(jnp.int32, (F, WS, S), 1)
    jc = jax.lax.broadcasted_iota(jnp.int32, (F, WS, S), 2)
    col = jnp.where(kc == jc + x0i, 1.0 - fx, 0.0) + jnp.where(kc == jc + x0i + 1, fx, 0.0)
    return row, col


def extract(win, local):
    row, col = interp_mats(local)
    tmp = jax.lax.dot_general(row, win, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return jax.lax.dot_general(tmp, col, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _mean2(a):
    return jnp.sum(jnp.sum(a, axis=2), axis=1) / (a.shape[1] * a.shape[2])


def _sum2(a):
    return jnp.sum(jnp.sum(a, axis=2), axis=1)


def score_of(win, refp, wmask, r_mean, r_sumsq):
    def score_sum(local):
        p2 = extract(win, local)
        m2 = _mean2(p2)
        ss2 = _mean2(p2 * p2)
        alpha = jnp.sqrt(r_sumsq / jnp.maximum(ss2, 1e-12))
        beta = r_mean - alpha * m2
        d = refp - p2 * alpha[:, None, None] - beta[:, None, None]
        return _sum2(d * d * wmask[None])
    return score_sum


def make(stage):
    def kernel(win_ref, pos_ref, ref_ref, w_ref, out_ref):
        win = win_ref[:]
        refp = ref_ref[:]
        wmask = w_ref[:]
        r_mean = _mean2(refp)
        r_sumsq = _mean2(refp * refp)
        score_sum = score_of(win, refp, wmask, r_mean, r_sumsq)
        total = lambda p: jnp.sum(score_sum(p))
        grad_fn = jax.grad(total)
        pos = pos_ref[:]

        if stage == "extract":
            s = score_sum(pos)
            out_ref[:] = jnp.stack([s, s], -1)
        elif stage == "grad":
            out_ref[:] = grad_fn(pos)
        elif stage == "jvp":
            one = jnp.ones((F,), jnp.float32)
            zero = jnp.zeros((F,), jnp.float32)
            _, hx = jax.jvp(grad_fn, (pos,), (jnp.stack([one, zero], -1),))
            out_ref[:] = hx
        elif stage == "fori_grad":
            def body(_, p):
                g = grad_fn(p)
                return p - 0.01 * g
            out_ref[:] = jax.lax.fori_loop(0, IT, body, pos)

    return kernel


import functools
@functools.partial(jax.jit, static_argnames=('stage',))
def run(stage, win, pos, refp, wmask):
    return pl.pallas_call(
        make(stage),
        out_shape=jax.ShapeDtypeStruct((F, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, pos, refp, wmask)


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    win = jax.random.uniform(key, (F, WS, WS))
    refp = jax.random.uniform(key, (F, S, S))
    pos = jnp.full((F, 2), 9.3)
    wmask = jnp.ones((S, S))
    for stage in ["extract", "grad", "jvp", "fori_grad"]:
        try:
            t0 = time.time()
            out = jax.block_until_ready(run(stage, win, pos, refp, wmask))
            n = 30
            t0 = time.time()
            for _ in range(n):
                out = run(stage, win, pos, refp, wmask)
            jax.block_until_ready(out)
            print(f"PASS {stage}: {(time.time()-t0)/n*1e3:.3f} ms, out0={np.asarray(out)[0]}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {stage}: {type(e).__name__}: {str(e).split(chr(10))[0][:200]}")
