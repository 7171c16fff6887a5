"""Probe round 3: async-copy window extraction + vector->scalar handoff."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, WS = 8, 32

IMG = jnp.arange(128 * 256, dtype=jnp.float32).reshape(128, 256)
POS = jnp.stack([jnp.arange(F) * 7 + 3, jnp.arange(F) * 5 + 2], -1).astype(jnp.int32)


def run(name, fn, check=None):
    try:
        out = np.asarray(fn())
        if check is not None:
            check(out)
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def want_windows(out):
    want = np.stack(
        [np.asarray(IMG)[int(p[1]):int(p[1]) + WS, int(p[0]):int(p[0]) + WS]
         for p in np.asarray(POS)]
    )
    np.testing.assert_allclose(out, want)


# I: VMEM->VMEM async copy, dynamic offsets both axes, lane loop
def i():
    def kernel(pos_ref, img_ref, out_ref, sem):
        def body(f, _):
            x = pos_ref[f, 0]
            y = pos_ref[f, 1]
            cp = pltpu.make_async_copy(
                img_ref.at[pl.ds(y, WS), pl.ds(x, WS)], out_ref.at[f], sem
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, F, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(POS, IMG)


# J: HBM->VMEM async copy, dynamic offsets, pipelined start-all-then-wait
def j():
    def kernel(pos_ref, img_ref, out_ref, sems):
        def start(f, _):
            x = pos_ref[f, 0]
            y = pos_ref[f, 1]
            pltpu.make_async_copy(
                img_ref.at[pl.ds(y, WS), pl.ds(x, WS)], out_ref.at[f],
                sems.at[f],
            ).start()
            return 0

        jax.lax.fori_loop(0, F, start, 0)

        def wait(f, _):
            x = pos_ref[f, 0]
            y = pos_ref[f, 1]
            pltpu.make_async_copy(
                img_ref.at[pl.ds(y, WS), pl.ds(x, WS)], out_ref.at[f],
                sems.at[f],
            ).wait()
            return 0

        jax.lax.fori_loop(0, F, wait, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((F,))],
    )(POS, IMG)


# K: scalar read from VMEM at traced index -> SMEM scratch -> ds start
def k():
    def kernel(img_ref, posv_ref, out_ref, smem, sem):
        def body(f, _):
            smem[f, 0] = posv_ref[f, 0]
            smem[f, 1] = posv_ref[f, 1]
            return 0

        jax.lax.fori_loop(0, F, body, 0)

        def copy(f, _):
            x = smem[f, 0]
            y = smem[f, 1]
            cp = pltpu.make_async_copy(
                img_ref.at[pl.ds(y, WS), pl.ds(x, WS)], out_ref.at[f], sem
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, F, copy, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((F, 2), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(IMG, POS)


# L: while_loop vector carry + vector-derived cond, 128-wide shapes
def l():
    def kernel(x_ref, out_ref):
        def cond(c):
            xy, it, done = c
            return (it < 5) & (jnp.sum(done.astype(jnp.int32)) < F * 128)

        def body(c):
            xy, it, done = c
            xy = jnp.where(done, xy, xy + 0.5)
            return xy, it + 1, done | (xy > 2.4)

        xy, _, _ = jax.lax.while_loop(
            cond, body,
            (x_ref[:], jnp.int32(0), jnp.zeros((F, 128), bool)),
        )
        out_ref[:] = xy

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.ones((F, 128), jnp.float32))


# M: dynamic ds on sublane axis only (lane axis static)
def m():
    def kernel(pos_ref, img_ref, out_ref):
        def body(f, _):
            y = pos_ref[f, 1]
            out_ref[f] = img_ref[pl.ds(y, WS), 0:WS]
            return 0

        jax.lax.fori_loop(0, F, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, WS, WS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(POS, IMG)


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("I vmem->vmem async window copy", i, want_windows)
    run("J hbm->vmem pipelined window copy", j, want_windows)
    run("K vmem-scalar->smem handoff + copy", k, want_windows)
    run("L while vector-cond 128-wide", l)
    run("M sublane-only dynamic slice", m)
