"""Bisect the P1/P2b/P5 failures from probe_mosaic.py into single features."""

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
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def call(kernel, out_shape, in_specs, args, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )(*args)


IMG = jnp.arange(128 * 256, dtype=jnp.float32).reshape(128, 256)
POS = jnp.stack([jnp.arange(F) * 7 + 3, jnp.arange(F) * 5 + 2], -1).astype(jnp.int32)


# A: SMEM positions, dynamic window read, dynamic lane store
def a():
    def kernel(pos_ref, img_ref, out_ref):
        def body(f, _):
            x = pos_ref[f, 0]
            y = pos_ref[f, 1]
            out_ref[f] = img_ref[pl.ds(y, WS), pl.ds(x, WS)]
            return 0

        jax.lax.fori_loop(0, F, body, 0)

    return call(
        kernel,
        jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.SMEM),
         pl.BlockSpec(memory_space=pltpu.VMEM)],
        (POS, IMG),
    )


# B: SMEM positions, dynamic window read, STATIC python-loop lane store
def b():
    def kernel(pos_ref, img_ref, out_ref):
        for f in range(F):
            x = pos_ref[f, 0]
            y = pos_ref[f, 1]
            out_ref[f] = img_ref[pl.ds(y, WS), pl.ds(x, WS)]

    return call(
        kernel,
        jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.SMEM),
         pl.BlockSpec(memory_space=pltpu.VMEM)],
        (POS, IMG),
    )


# C: scalar read from VMEM ref at static index
def c():
    def kernel(pos_ref, img_ref, out_ref):
        x = pos_ref[0, 0]
        out_ref[:] = img_ref[pl.ds(x, WS), pl.ds(x, WS)]

    return call(
        kernel,
        jax.ShapeDtypeStruct((WS, WS), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.VMEM),
         pl.BlockSpec(memory_space=pltpu.VMEM)],
        (POS, IMG),
    )


# D: int vector write to SMEM scratch (vector -> SMEM handoff)
def d():
    def kernel(pos_ref, out_ref, smem):
        smem[:, :] = pos_ref[:, :]
        out_ref[:] = jnp.zeros_like(out_ref) + smem[0, 0]

    return call(
        kernel,
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.VMEM)],
        (POS,),
        scratch=[pltpu.SMEM((F, 2), jnp.int32)],
    )


# E: while_loop, scalar-only cond, vector body carry
def e():
    def kernel(x_ref, out_ref):
        def cond(c):
            _, it = c
            return it < 5

        def body(c):
            xy, it = c
            return xy + 0.5, it + 1

        xy, _ = jax.lax.while_loop(cond, body, (x_ref[:], jnp.int32(0)))
        out_ref[:] = xy

    return call(
        kernel,
        jax.ShapeDtypeStruct((F, 128), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.VMEM)],
        (jnp.ones((F, 128), jnp.float32),),
    )


# F: vector reduce -> scalar used in control flow
def f():
    def kernel(x_ref, out_ref):
        s = jnp.sum(x_ref[:])

        @pl.when(s > 2.0)
        def _():
            out_ref[:] = x_ref[:] * 2.0

        @pl.when(s <= 2.0)
        def _():
            out_ref[:] = x_ref[:]

    return call(
        kernel,
        jax.ShapeDtypeStruct((F, 128), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.VMEM)],
        (jnp.ones((F, 128), jnp.float32),),
    )


# G: while_loop with vector carry AND vector-reduce cond (P5 exact, 2D bool)
def g():
    def kernel(x_ref, out_ref):
        def cond(c):
            xy, it, done = c
            return (it < 5) & (jnp.sum(done.astype(jnp.int32)) < 2 * F)

        def body(c):
            xy, it, done = c
            xy = jnp.where(done, xy, xy + 0.5)
            return xy, it + 1, done | (xy > 2.4)

        xy, _, _ = jax.lax.while_loop(
            cond, body,
            (x_ref[:], jnp.int32(0), jnp.zeros((F, 2), bool)),
        )
        out_ref[:] = xy

    return call(
        kernel,
        jax.ShapeDtypeStruct((F, 2), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.VMEM)],
        (jnp.ones((F, 2), jnp.float32),),
    )


# H: fori_loop over lanes, per-lane scalar from SMEM input, 1D bool ops
def h():
    def kernel(pos_ref, img_ref, out_ref, smem):
        def body(f, _):
            x = pos_ref[f, 0]
            smem[f] = x * 2
            return 0

        jax.lax.fori_loop(0, F, body, 0)
        out_ref[:] = jnp.zeros_like(out_ref) + smem[3]

    return call(
        kernel,
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        [pl.BlockSpec(memory_space=pltpu.SMEM),
         pl.BlockSpec(memory_space=pltpu.VMEM)],
        (POS, IMG),
        scratch=[pltpu.SMEM((F,), jnp.int32)],
    )


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, fn in [("A smem-pos dyn-lane-store", a),
                     ("B smem-pos static-lane-store", b),
                     ("C scalar-read-VMEM static idx", c),
                     ("D vector->SMEM scratch store", d),
                     ("E while scalar-cond vector-carry", e),
                     ("F vector-reduce scalar control", f),
                     ("G while vector-cond (P5)", g),
                     ("H smem scalar loop", h)]:
        run(name, fn)
