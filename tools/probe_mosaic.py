"""Probe Mosaic/Pallas-TPU lowering support for the fused-tracker kernel's
key primitives, each in its own tiny pallas_call:

  P1: scalar read from a VMEM ref at a traced index (fori_loop lane index)
  P2: per-lane VMEM->VMEM window copy with pl.ds starts read from VMEM
  P3: batched dot_general [F,a,b] @ [F,b,c] (the banded-interp extraction)
  P4: jax.grad / jax.jacfwd traced inside the kernel body
  P5: lax.while_loop with vector carry inside the kernel
  P6: @pl.when guarded per-lane copy (scalar mask skip)

Run on the real chip: python tools/probe_mosaic.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, WS, S = 8, 32, 13


def run(name, fn):
    try:
        out = fn()
        out = jax.tree.map(np.asarray, out)
        print(f"PASS {name}: {jax.tree.map(lambda a: a.ravel()[:3], out)}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


# ---- P1+P2: scalar VMEM reads driving per-lane window copies ----
def p12():
    img = jnp.arange(128 * 256, dtype=jnp.float32).reshape(128, 256)
    pos = jnp.stack([jnp.arange(F) * 7 + 3, jnp.arange(F) * 5 + 2], -1)

    def kernel(img_ref, pos_ref, out_ref):
        def body(f, _):
            x = pos_ref[f, 0]
            y = pos_ref[f, 1]
            out_ref[f] = img_ref[pl.ds(y, WS), pl.ds(x, WS)]
            return 0

        jax.lax.fori_loop(0, F, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # int32 positions in VMEM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img, pos.astype(jnp.int32))
    want = np.stack(
        [np.asarray(img)[int(p[1]):int(p[1]) + WS, int(p[0]):int(p[0]) + WS]
         for p in np.asarray(pos)]
    )
    np.testing.assert_allclose(np.asarray(out), want)
    return out[:, 0, 0]


# ---- P2b: same but positions land in VMEM as computed f32 vector, then are
# floored in-kernel and read back as scalars ----
def p2b():
    img = jnp.arange(128 * 256, dtype=jnp.float32).reshape(128, 256)
    pos = jnp.stack([jnp.arange(F) * 7.3 + 3.2, jnp.arange(F) * 5.1 + 2.9], -1)

    def kernel(img_ref, pos_ref, out_ref, ipos_ref):
        # vector compute -> int vector -> VMEM scratch -> scalar reads
        ipos_ref[:, :] = jnp.floor(pos_ref[:, :]).astype(jnp.int32)

        def body(f, _):
            x = ipos_ref[f, 0]
            y = ipos_ref[f, 1]
            out_ref[f] = img_ref[pl.ds(y, WS), pl.ds(x, WS)]
            return 0

        jax.lax.fori_loop(0, F, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F, 2), jnp.int32)],
    )(img, pos.astype(jnp.float32))
    return out[:, 0, 0]


# ---- P3: batched dot_general ----
def p3():
    a = jnp.ones((F, S, WS), jnp.float32)
    b = jnp.ones((F, WS, WS), jnp.float32)

    def kernel(a_ref, b_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, S, WS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    np.testing.assert_allclose(np.asarray(out), WS)
    return out[:, 0, 0]


# ---- P4: autodiff traced inside the kernel ----
def p4():
    win = jnp.arange(WS * WS, dtype=jnp.float32).reshape(WS, WS) / 100.0

    def kernel(win_ref, out_ref):
        w = win_ref[:]

        def score(xy):
            i = jax.lax.broadcasted_iota(jnp.int32, (S, WS), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (S, WS), 1)
            x0 = jnp.floor(xy[0]).astype(jnp.int32)
            fx = xy[0] - x0.astype(jnp.float32)
            rows = (
                jnp.where(j == i + x0, 1.0 - fx, 0.0)
                + jnp.where(j == i + x0 + 1, fx, 0.0)
            )
            p = jnp.dot(rows, w, preferred_element_type=jnp.float32)
            return jnp.sum(p * p) * xy[1]

        g = jax.grad(score)(jnp.array([3.3, 1.7], jnp.float32))
        h = jax.jacfwd(jax.grad(score))(jnp.array([3.3, 1.7], jnp.float32))
        out_ref[0, :] = g
        out_ref[1, :] = h[0]
        out_ref[2, :] = h[1]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win)
    return out


# ---- P5: while_loop with vector carry ----
def p5():
    x = jnp.ones((F, 2), jnp.float32)

    def kernel(x_ref, out_ref):
        def cond(c):
            xy, it, done = c
            return (it < 5) & ~jnp.all(done)

        def body(c):
            xy, it, done = c
            xy = jnp.where(done[:, None], xy, xy + 0.5)
            return xy, it + 1, done | (xy[:, 0] > 2.4)

        xy, _, _ = jax.lax.while_loop(
            cond, body, (x_ref[:], jnp.int32(0), jnp.zeros((F,), bool))
        )
        out_ref[:] = xy

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return out


# ---- P6: @pl.when guarded per-lane copy with scalar mask from SMEM ----
def p6():
    img = jnp.ones((128, 256), jnp.float32)
    mask = (jnp.arange(F) % 2).astype(jnp.int32)

    def kernel(mask_ref, img_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(f, _):
            @pl.when(mask_ref[f] > 0)
            def _():
                out_ref[f] = img_ref[pl.ds(0, WS), pl.ds(0, WS)] * 2.0

            return 0

        jax.lax.fori_loop(0, F, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mask, img)
    want = np.where((np.arange(F) % 2)[:, None, None] > 0, 2.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(want, (F, WS, WS)))
    return out[:, 0, 0]


if __name__ == "__main__":
    print("devices:", jax.devices())
    ok = True
    ok &= run("P1+P2 scalar-VMEM-read window copy", p12)
    ok &= run("P2b computed-int-scratch scalar reads", p2b)
    ok &= run("P3 batched dot_general", p3)
    ok &= run("P4 in-kernel autodiff", p4)
    ok &= run("P5 while_loop vector carry", p5)
    ok &= run("P6 pl.when guarded lane copy", p6)
    sys.exit(0 if ok else 1)
