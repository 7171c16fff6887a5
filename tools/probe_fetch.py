"""Probe axon-relay fetch economics (round-4): a host fetch of ANY device
value costs ~30 ms wall (tools/probe_live.py rtt: chain dispatch 0.4 ms,
per-fetch 30.7 ms). The live robot loop fetches one f32[8] per frame, so
it is fetch-latency-bound at ~35 fps regardless of device compute.

Questions this answers on the real backend:
  1. Does a fetch overlap device compute (background-thread fetch while the
     main thread keeps dispatching)?
  2. Do two concurrent fetches overlap each other (latency) or serialize
     (occupancy)?
  3. Does fetch cost scale with payload size?

    python tools/probe_fetch.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"device: {jax.devices()[0]}", flush=True)

    # ~10-15 ms of device compute per call (square matmul chain)
    @jax.jit
    def heavy(x):
        def body(i, x):
            return x @ x * 0.9999 + 0.0001
        return jax.lax.fori_loop(0, 120, body, x), jnp.sum(x)

    x = jnp.eye(2048, dtype=jnp.bfloat16) * 0.5
    (x, s) = heavy(x)
    np.asarray(s)
    t0 = time.time()
    n = 10
    for _ in range(n):
        x, s = heavy(x)
    np.asarray(s)
    step_ms = (time.time() - t0) / n * 1000
    print(json.dumps({"probe": "step_ms", "ms": round(step_ms, 2)}), flush=True)

    # 1) fetch-per-step on the critical path (the current live loop shape)
    t0 = time.time()
    for _ in range(n):
        x, s = heavy(x)
        np.asarray(s)
    sync_ms = (time.time() - t0) / n * 1000
    print(json.dumps({"probe": "fetch_on_path_ms", "ms": round(sync_ms, 2)}),
          flush=True)

    # 2) fetch in a background thread while the main thread dispatches
    pend = []
    out = []

    def drain():
        while pend or not done[0]:
            if pend:
                out.append(np.asarray(pend.pop(0)))
            else:
                time.sleep(0.0005)

    done = [False]
    th = threading.Thread(target=drain)
    th.start()
    t0 = time.time()
    for _ in range(n):
        x, s = heavy(x)
        pend.append(s)
    done[0] = True
    th.join()
    thread_ms = (time.time() - t0) / n * 1000
    print(json.dumps({"probe": "fetch_bg_thread_ms", "ms": round(thread_ms, 2),
                      "fetched": len(out)}), flush=True)

    # 3) two concurrent fetches: latency (overlap) or occupancy (serialize)?
    a = heavy(x)[1]
    b = heavy(x)[1]
    time.sleep(1.0)  # let compute finish so we time pure fetch
    t0 = time.time()
    np.asarray(a)
    one = time.time() - t0
    a2 = a + 1
    b2 = b + 1
    time.sleep(0.5)
    ts = []

    def f(v):
        t = time.time()
        np.asarray(v)
        ts.append(time.time() - t)

    t0 = time.time()
    t1 = threading.Thread(target=f, args=(a2,))
    t2 = threading.Thread(target=f, args=(b2,))
    t1.start(); t2.start(); t1.join(); t2.join()
    both = time.time() - t0
    print(json.dumps({"probe": "fetch_concurrency",
                      "one_ms": round(one * 1000, 1),
                      "two_threads_ms": round(both * 1000, 1)}), flush=True)

    # 4) payload scaling
    for size in (8, 8192, 1 << 20, 1 << 24):
        v = jnp.arange(size, dtype=jnp.float32)
        v = v + 1
        np.asarray(v[:1])
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            v = v + 1
            np.asarray(v)
        ms = (time.time() - t0) / reps * 1000
        print(json.dumps({"probe": "fetch_size", "elems": size,
                          "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
