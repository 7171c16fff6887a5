"""Test config: run on an 8-device virtual CPU mesh so sharding tests work
anywhere (the real TPU has a single chip; multi-chip paths are validated on
host devices exactly like the driver's dryrun)."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (single real TPU
# chip behind a remote-compile tunnel) which is slow for unit tests and has
# no f64. Tests validate numerics + sharding on host devices; bench.py and
# __graft_entry__.entry() exercise the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize.py imports jax at interpreter startup (to register the axon
# TPU plugin), so the env var alone is too late — override the live config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the parity suite compiles the full pipeline for
# several distinct configs (~minutes each on this 1-CPU box); cached
# executables make repeat CI runs cheap. Host-keyed: an XLA:CPU AOT entry
# built on a different host reloads with mismatched machine features —
# SIGILL risk plus an fp-codegen numerics fork under the golden fixtures
# (utils/cachedir.py, PERF.md finding 26).
from slam_robot_tpu.utils.cachedir import jax_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
