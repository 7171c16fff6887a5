"""Rollout fleets: data-parallel closed-loop simulations.

BASELINE config 4: 64 parallel rollouts. ``fleet`` vmaps sim.rollout over a
goal batch and shards the batch axis over the mesh's 'data' axis — each
device integrates its own rollouts; no cross-device traffic except the
final gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_robot_tpu.models import sim


def fleet(mesh: Mesh, goals, n_steps: int = 200, data_axis: str = "data"):
    """goals [B,3] -> (trajectories [B,n_steps,2], final distances [B]).
    B must be divisible by the data-axis size."""
    goals = jax.device_put(goals, NamedSharding(mesh, P(data_axis)))

    @jax.jit
    def run(g):
        return jax.vmap(lambda goal: sim.rollout(goal, n_steps=n_steps))(g)

    return run(goals)
