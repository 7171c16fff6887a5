"""Mesh helpers: one place that builds jax.sharding.Mesh objects."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh. Default: all devices on one 'data' axis.

    make_mesh({'data': 4, 'model': 2}) lays 8 devices on a 4x2 grid —
    'data' shards rollouts/robots, 'model' shards BA observation work.
    """
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axes} needs {np.prod(shape)} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)


def shard(mesh: Mesh, spec: P):
    return NamedSharding(mesh, spec)
