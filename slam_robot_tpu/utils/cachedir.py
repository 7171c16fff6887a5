"""Host-keyed persistent compile-cache directory.

XLA:CPU AOT executables are compiled against the BUILD host's machine
features and reloaded verbatim on cache hit: a cache populated on one host
reloads on a different host with mismatched features (cpu_aot_loader
"Compile machine features ... vs host machine features" errors, SIGILL
risk) and — worse for us — different fp codegen, which forks the
closed-loop trajectories the golden fixtures pin (PERF.md finding 26:
keyframe cadence is chaotically sensitive to fp deltas). Keying the CPU
cache directory by a host signature makes every entry native to the host
that replays it: one recompile pass per new host instead of a silent
numerics fork.

TPU (axon) executables are compiled remotely for the chip, not the host —
they keep the shared directory.
"""

from __future__ import annotations

import hashlib
import os

_BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def host_sig() -> str:
    """Stable signature of the host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def jax_cache_dir(platform: str = "") -> str:
    """Cache directory for the given jax platform ("cpu" is host-keyed)."""
    if platform == "cpu":
        return os.path.join(_BASE, f"cpu-{host_sig()}")
    return _BASE
