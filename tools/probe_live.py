"""Probe the LIVE per-frame path (VERDICT r2 item 3): a robot feeds frames
one at a time (main.cpp:503-645), so the per-call dispatch/relay overhead
that the bench's lax.scan amortizes is the live path's ceiling.

Variants:
  rtt        per-call floor of the relay: a trivial chained jitted op,
             timed over 100 calls (dependency chain = no pipelining), and
             100 independent calls (max pipelining)
  eager      pipeline.step per frame, sync once at the end (bench's
             eager_ms measurement)
  eager_sync pipeline.step + full metrics fetch per frame (run_replay's
             print loop)
  donated    pipeline.step_donated: state buffers donated per call
  live       pipeline.step_live: donated + minimal output surface
             (4 scalars instead of the ~25-buffer metrics dict)

    python tools/probe_live.py [--variants rtt,eager,live] [--frames 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    """Fetch bytes to host (jax.block_until_ready lies through the axon
    relay — PERF.md)."""
    import numpy as _np

    return _np.asarray(x)


def copy_state(ps):
    """Deep copy every array leaf (donation-safe: the old top-level-only
    copy aliased the nested map/matcher states, so a donated run DELETED
    the prototype's buffers)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.array, ps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="rtt,eager,eager_sync,donated,live")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--warm", type=int, default=96)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from slam_robot_tpu.config import SlamConfig
    from slam_robot_tpu.models import pipeline
    from slam_robot_tpu.utils import benchscene

    variants = args.variants.split(",")
    print(f"device: {jax.devices()[0]}", flush=True)

    if "rtt" in variants:
        @jax.jit
        def tick(x):
            return x + 1.0

        x = jnp.float32(0.0)
        x = tick(x)
        _sync(x)
        t0 = time.time()
        for _ in range(100):
            x = tick(x)          # dependency chain: no pipelining
        _sync(x)
        chain_ms = (time.time() - t0) / 100 * 1000
        xs = [jnp.float32(i) for i in range(100)]
        t0 = time.time()
        ys = [tick(v) for v in xs]  # independent: relay may pipeline
        for v in ys:
            _sync(v)
        par_ms = (time.time() - t0) / 100 * 1000
        print(json.dumps({"variant": "rtt", "chain_call_ms": round(chain_ms, 3),
                          "parallel_call_ms": round(par_ms, 3)}), flush=True)
        variants.remove("rtt")
        if not variants:
            return

    cfg = SlamConfig()
    frames = benchscene.make_frames(cfg, args.warm + args.frames)
    ps0 = pipeline.init(cfg)
    t0 = time.time()
    for i in range(args.warm):
        ps0, _ = pipeline.step(ps0, frames[i], cfg)
    _sync(ps0.map.frame_trans)
    print(f"warm {time.time()-t0:.0f}s", flush=True)
    live_frames = frames[args.warm:]

    aot = {}

    def get_aot():
        if "fn" not in aot:
            ps = copy_state(ps0)
            t0 = time.time()
            aot["fn"] = (
                jax.jit(pipeline._step_lean,
                        static_argnames=("cfg", "run_slam"),
                        donate_argnums=(0,))
                .lower(ps, live_frames[0], cfg=cfg).compile()
            )
            print(f"aot lower+compile {time.time()-t0:.1f}s", flush=True)
        return aot["fn"]

    def run(name):
        ps = copy_state(ps0)
        _sync(ps.map.n_obs)
        extra = {}
        t0 = time.time()
        if name == "eager":
            for img in live_frames:
                ps, met = pipeline.step(ps, img, cfg)
        elif name == "eager_sync":
            for img in live_frames:
                ps, met = pipeline.step(ps, img, cfg)
                {k: np.asarray(v) for k, v in met.items()}
        elif name == "donated":
            for img in live_frames:
                ps, met = pipeline.step_donated(ps, img, cfg)
        elif name == "live":
            for img in live_frames:
                ps, met = pipeline.step_live(ps, img, cfg)
        elif name == "nosync":
            # split host dispatch-issue time from device completion: if the
            # issue loop alone runs at ~final rate, each jit call BLOCKS on
            # the relay (queue-depth / RPC latency), not on Python overhead
            stamps = [time.time()]
            for img in live_frames:
                ps, met = pipeline.step_live(ps, img, cfg)
                stamps.append(time.time())
            extra["issue_ms_per_frame"] = round(
                (time.time() - t0) / len(live_frames) * 1000, 2)
            extra["per_dispatch_ms"] = [
                round((b - a) * 1000, 2)
                for a, b in zip(stamps[:-1], stamps[1:])
            ][:12]
        elif name == "aot":
            fn = get_aot()
            t0 = time.time()
            for img in live_frames:
                ps, met = fn(ps, img)
        elif name == "live_slice":
            # bench.py-style frame feed: index a stacked device array per
            # frame (one extra tiny dispatch + a device slice each call)
            imgs = jnp.stack(live_frames)
            n = imgs.shape[0]
            t0 = time.time()
            for i in range(n):
                ps, met = pipeline.step_live(ps, imgs[i % n], cfg)
        elif name == "live_fetch":
            # bench.py-style telemetry: per-frame packed-scalar fetch on
            # FetchPool threads (claimed fully-overlapped ~24 ms latency)
            from slam_robot_tpu.utils.fetchpool import FetchPool
            pool = FetchPool(workers=3)
            got = []
            t0 = time.time()
            for img in live_frames:
                ps, met = pipeline.step_live(ps, img, cfg)
                pool.submit(met)
                got.extend(pool.drain())
            got.extend(pool.join())
            pool.close()
            assert len(got) == len(live_frames)
        elif name == "live_ring":
            # the shipped loop: device-side f32[8,LIVE_WIDTH] telemetry ring inside
            # the jitted step, ONE pool fetch per 8 frames, zero extra
            # dispatches (bench.py / run_replay --live)
            from slam_robot_tpu.utils.fetchpool import FetchPool
            ring = jnp.zeros((8, pipeline.LIVE_WIDTH), jnp.float32)
            pool = FetchPool(workers=2)
            got = []
            group = []
            t0 = time.time()
            for i, img in enumerate(live_frames):
                ps, ring = pipeline.step_live_ring(ps, ring, img, cfg)
                group.append(i)
                if len(group) == 8:
                    pool.submit(ring, group)
                    group = []
                for metas, rows in pool.drain():
                    got.extend(zip(metas, rows[-len(metas):]))
            if group:
                pool.submit(ring, group)
            for metas, rows in pool.join():
                got.extend(zip(metas, rows[-len(metas):]))
            pool.close()
            assert len(got) == len(live_frames)
        elif name == "live_batchfetch":
            # bench.py's exact telemetry plumbing: stack 4 frames' scalars
            # on device via a tiny jit, ONE fetch per 4 frames
            from slam_robot_tpu.utils.fetchpool import BatchedFetchPool
            pool = BatchedFetchPool(k=4, workers=2)
            got = []
            t0 = time.time()
            for i, img in enumerate(live_frames):
                ps, met = pipeline.step_live(ps, img, cfg)
                pool.submit(met, i)
                got.extend(pool.drain())
            got.extend(pool.join())
            pool.close()
            assert len(got) == len(live_frames)
        elif name == "live_fetch1":
            from slam_robot_tpu.utils.fetchpool import FetchPool
            pool = FetchPool(workers=1)
            got = []
            t0 = time.time()
            for img in live_frames:
                ps, met = pipeline.step_live(ps, img, cfg)
                pool.submit(met)
                got.extend(pool.drain())
            got.extend(pool.join())
            pool.close()
            assert len(got) == len(live_frames)
        elif name == "bigargs":
            # chained trivial op over a pytree with the state's leaf count:
            # isolates per-launch arg-marshalling cost from step compute
            leaves = jax.tree_util.tree_leaves(ps)
            print(json.dumps({
                "variant": "bigargs",
                "state_leaves": len(leaves),
                "state_mb": round(sum(
                    x.size * x.dtype.itemsize for x in leaves) / 1e6, 1),
            }), flush=True)
            toy = [jnp.zeros((8,), jnp.float32) for _ in leaves]

            @jax.jit
            def tickn(xs):
                return [x + 1.0 for x in xs]

            toy = tickn(toy)
            _sync(toy[0])
            t0 = time.time()
            for _ in range(len(live_frames)):
                toy = tickn(toy)
            _sync(toy[0])
        else:
            raise SystemExit(f"unknown variant {name}")
        _sync(ps.map.frame_trans)
        ms = (time.time() - t0) / len(live_frames) * 1000
        if extra:
            print(json.dumps({"variant": name, **extra}), flush=True)
        return ms

    for name in variants:
        t0 = time.time()
        ms_cold = run(name)       # includes any new compile
        compile_s = time.time() - t0
        ms = min(run(name), run(name))
        print(json.dumps({
            "variant": name,
            "live_step_ms": round(ms, 2),
            "live_fps": round(1000.0 / ms, 2),
            "first_pass_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
