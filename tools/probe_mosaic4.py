"""Probe which op in the grouped Newton sampling (_sample_grouped) kills
the remote Mosaic compiler (HTTP 500 observed on the full kernel):

  G1: jnp.repeat on a [B,G] block           (start/frac row expansion)
  G2: broadcast_to 4-D + reshape back to 3-D (t_tiled block-diag expansion)
  G3: _banded_pair_grouped alone (iota/where banded matrix, rank-3)
  G4: repeat-free expansion via iota-division masked sums
  G5: 4-D reshape + swapaxes(-1,-2) (per-lane block transpose alternative)
  G6: full _sample_grouped as written

Run on the real chip: python tools/probe_mosaic4.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_robot_tpu.ops.pallas import newton

F, G, S, W = 64, 4, 13, 32
B = F // G


def run(name, fn):
    try:
        out = fn()
        out = jax.tree.map(np.asarray, out)
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def call(kernel, *args, out_shape):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def g1():
    a = jnp.arange(F, dtype=jnp.float32).reshape(B, G)

    def kernel(a_ref, out_ref):
        out_ref[:] = jnp.repeat(a_ref[:], 2 * S, axis=1)

    return call(kernel, a, out_shape=(B, G * 2 * S))


def g2():
    t = jnp.arange(B * G * 2 * S * W, dtype=jnp.float32).reshape(
        B, G * 2 * S, W)

    def kernel(t_ref, out_ref):
        t = t_ref[:]
        M = G * 2 * S
        out_ref[:] = jnp.broadcast_to(
            t[:, :, None, :], (B, M, G, W)).reshape(B, M, G * W)

    return call(kernel, t, out_shape=(B, G * 2 * S, G * W))


def g3():
    fr = jnp.linspace(0, 1, F)
    st = jnp.clip(jnp.arange(F, dtype=jnp.int32) % 18, 0, 18)

    def kernel(fr_ref, st_ref, out_ref):
        out_ref[:] = newton._banded_pair_grouped(
            fr_ref[:], st_ref[:].astype(jnp.int32), W, S, G)

    return call(kernel, fr, st.astype(jnp.float32),
                out_shape=(B, G * 2 * S, G * W))


def g4():
    a = jnp.arange(F, dtype=jnp.float32).reshape(B, G)

    def kernel(a_ref, out_ref):
        a = a_ref[:]
        M = G * 2 * S
        r = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        lane = r // (2 * S)
        out = jnp.zeros((B, M), jnp.float32)
        for g in range(G):
            out = out + jnp.where(lane == g, a[:, g][:, None], 0.0)
        out_ref[:] = out

    return call(kernel, a, out_shape=(B, G * 2 * S))


def g5():
    t = jnp.arange(B * G * 2 * S * W, dtype=jnp.float32).reshape(
        B, G * 2 * S, W)

    def kernel(t_ref, out_ref):
        t = t_ref[:]
        t4 = t.reshape(B, G, 2 * S, W)
        t4 = jnp.swapaxes(t4, -1, -2)
        out_ref[:] = t4.reshape(B, G * W, 2 * S)

    return call(kernel, t, out_shape=(B, G * W, 2 * S))


def g6():
    win = jnp.arange(F * W * W, dtype=jnp.float32).reshape(F, W, W) % 255.0
    fx = jnp.linspace(0.1, 0.9, F)
    fy = jnp.linspace(0.2, 0.8, F)
    x0 = jnp.clip(jnp.arange(F, dtype=jnp.int32) % 18, 0, 18)
    y0 = jnp.clip((jnp.arange(F, dtype=jnp.int32) * 3) % 18, 0, 18)

    def kernel(w_ref, fx_ref, fy_ref, x0_ref, y0_ref, out_ref):
        out_ref[:] = newton._sample_grouped(
            w_ref[:], fx_ref[:], fy_ref[:],
            x0_ref[:].astype(jnp.int32), y0_ref[:].astype(jnp.int32), S, G)

    return call(kernel, win, fx, fy, x0.astype(jnp.float32),
                y0.astype(jnp.float32), out_shape=(F, 2 * S, 2 * S))


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    for name, fn in [("G1 repeat", g1), ("G2 bcast4d+reshape", g2),
                     ("G3 banded_pair_grouped", g3),
                     ("G4 iota-masked expansion", g4),
                     ("G5 4d reshape+swapaxes", g5),
                     ("G6 full _sample_grouped", g6)]:
        run(name, fn)
