"""Wall-clock scope timer (ScopedTimer, main.cpp:400-419) + a jax-aware
variant that blocks on device results so timings mean something."""

from __future__ import annotations

import time


class ScopedTimer:
    """Prints ``TIMER: <name>: <seconds>`` on exit, like the reference."""

    def __init__(self, name: str, sink=print, block_on=None):
        self.name = name
        self.sink = sink
        self.block_on = block_on
        self.elapsed = None

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.block_on is not None:
            import jax

            jax.block_until_ready(self.block_on)
        self.elapsed = time.perf_counter() - self.start
        self.sink(f"TIMER: {self.name}: {self.elapsed}")
        return False
