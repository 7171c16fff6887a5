"""On-chip probe: grouped-MXU Newton kernel (ops/pallas/newton.py group>1).

Questions (PERF.md round-3 lever b / VERDICT r3 item 2):
  1. does the grouped kernel compile under the remote Mosaic compiler?
  2. are pallas outputs bit-identical group=G vs group=1 on the MXU?
     (XLA:CPU is NOT bit-identical — blocked reductions reassociate the
     K=G*WH contraction, ~3e-5 on 100-scale pixels. The MXU accumulates
     K sequentially, so exact-zero padding should be an exact identity.)
  3. is it faster? scan-wrapped timing, bytes-fetched sync (the axon relay
     returns from block_until_ready without blocking).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from slam_robot_tpu.ops import patch as patch_ops
    from slam_robot_tpu.ops.pallas import newton

    def _sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0])

    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    F, S, WH, WW = 512, 13, 32, 32
    WEIGHT = patch_ops.radial_mask(S)

    win = jnp.asarray(rng.uniform(0, 255, (F, WH, WW)).astype(np.float32))
    pos0 = jnp.asarray(rng.uniform(20, 400, (F, 2)).astype(np.float32))
    org = jnp.floor(pos0) - 16.0
    ref = jnp.asarray(rng.uniform(0, 255, (F, S, S)).astype(np.float32))
    rv = jnp.ones((F, S, S), jnp.float32)
    rm = jnp.mean(ref, axis=(1, 2))
    rs = jnp.mean(ref * ref, axis=(1, 2))
    act = jnp.ones((F,), jnp.float32)
    bounds = jnp.broadcast_to(jnp.array([640.0, 480.0], jnp.float32), (F, 2))

    def level(g):
        def f(win, pos0):
            return newton.newton_level(
                win, pos0, org, ref, rv, rm, rs, act, WEIGHT, bounds,
                max_iters=6, backend="pallas", group=g)
        return jax.jit(f)

    outs = {}
    for g in (1, 2, 4, 8):
        t0 = time.perf_counter()
        try:
            p, s = level(g)(win, pos0)
            pn, sn = np.asarray(p), np.asarray(s)
        except Exception as e:  # noqa: BLE001 - probe reports, not raises
            print(f"group={g}: COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        print(f"group={g}: compiled+ran in {time.perf_counter()-t0:.1f}s")
        outs[g] = (pn, sn)

    for g in sorted(outs):
        if g == 1 or 1 not in outs:
            continue
        pe = np.array_equal(outs[1][0], outs[g][0])
        se = np.array_equal(outs[1][1], outs[g][1])
        d = np.abs(outs[1][0] - outs[g][0]).max()
        print(f"group={g}: pos bit-identical={pe} status-identical={se} "
              f"max|dpos|={d:.3g}")

    # scan-wrapped timing: K calls per measurement, position fed forward so
    # the calls serialize; sync by fetching bytes.
    K = 50

    def scan_fn(g):
        kern = level(g)

        def body(pos, _):
            p, s = kern(win, pos)
            # keep positions in-bounds so iterations stay busy
            p = jnp.clip(p, 20.0, 400.0)
            return p, s[0]

        @jax.jit
        def run(pos):
            p, ss = jax.lax.scan(body, pos, None, length=K)
            return p, ss

        return run

    for g in sorted(outs):
        run = scan_fn(g)
        _sync(run(pos0))  # compile
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(run(pos0))
            reps.append((time.perf_counter() - t0) / K * 1e3)
        print(f"group={g}: newton_level {min(reps):.3f} ms/call "
              f"(median {sorted(reps)[2]:.3f})")


if __name__ == "__main__":
    main()
