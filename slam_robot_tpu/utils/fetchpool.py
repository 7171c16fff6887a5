"""Off-critical-path host fetches for live loops.

Through the axon remote relay a host fetch of ANY device value is a
synchronous ~24 ms round trip regardless of payload size (measured:
tools/probe_fetch.py — 24.3 ms for 8 floats), while dispatches are
~0.4 ms fire-and-forget and CONCURRENT fetches overlap fully (two threads:
24.4 ms total — it is latency, not occupancy). A robot loop that fetches
its per-frame scalars inline (the reference prints per-frame diagnostics,
main.cpp:510-517) is therefore fetch-latency-bound at ~35 fps no matter
how fast the device computes.

``FetchPool`` hands each fetch to a small thread pool so the loop keeps
dispatching at device rate; results arrive ~one fetch-latency late, in
submission order, via :meth:`drain`. On a locally-attached TPU (PCIe) the
fetch is microseconds and the pool is harmless overhead-free plumbing.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

import numpy as np


class FetchPool:
    """Fetch device arrays to host on background threads, delivering
    completed results in submission order."""

    def __init__(self, workers: int = 3,
                 fetch: Callable[[Any], np.ndarray] = np.asarray):
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._fetch = fetch
        self._queue: collections.deque = collections.deque()

    def submit(self, value, meta=None) -> None:
        """Queue ``value`` for fetching; ``meta`` is returned alongside."""
        self._queue.append((meta, self._pool.submit(self._fetch, value)))

    def drain(self) -> list:
        """Return [(meta, np.ndarray), ...] for every fetch completed so
        far, preserving submission order (a completed fetch behind a
        pending one waits for its turn)."""
        out = []
        while self._queue and self._queue[0][1].done():
            meta, fut = self._queue.popleft()
            out.append((meta, fut.result()))
        return out

    def join(self) -> list:
        """Block until every queued fetch completes; return the rest."""
        out = []
        while self._queue:
            meta, fut = self._queue.popleft()
            out.append((meta, fut.result()))
        return out

    def close(self) -> None:
        self._pool.shutdown(wait=True)


class BatchedFetchPool:
    """DEPRECATED for the axon relay: FetchPool with host-driven device-side
    batching — every ``k`` submits are stacked into ONE device array by a
    tiny jitted dispatch and fetched as one round trip.

    Measured on-chip (tools/probe_live.py, live_batchfetch): the extra
    stack-jit CALL through the relay costs ~5 ms/frame — far more than the
    ~0.9 ms/frame of per-frame pool fetches it was built to remove. Live
    loops should carry the telemetry ring INSIDE the jitted step instead
    (pipeline.step_live_ring: zero extra dispatches, one fetch per k
    frames). Kept for locally-attached backends where a dispatch is ~us.
    """

    def __init__(self, k: int = 4, workers: int = 2):
        import jax

        self._k = int(k)
        self._pool = FetchPool(workers=workers)
        self._buf: list = []
        self._stack = jax.jit(lambda vals: jax.numpy.stack(vals))

    def submit(self, value, meta=None) -> None:
        self._buf.append((meta, value))
        if len(self._buf) >= self._k:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        metas = [m for m, _ in self._buf]
        stacked = self._stack([v for _, v in self._buf])
        self._buf.clear()
        self._pool.submit(stacked, metas)

    def _unpack(self, batches) -> list:
        return [(meta, arr[i]) for metas, arr in batches
                for i, meta in enumerate(metas)]

    def drain(self) -> list:
        return self._unpack(self._pool.drain())

    def join(self) -> list:
        self.flush()
        return self._unpack(self._pool.join())

    def close(self) -> None:
        self._pool.close()
