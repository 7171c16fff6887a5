"""Map/pipeline state checkpointing (SURVEY §5: the reference has none —
only input record/replay). Orbax when available, npz fallback."""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(state):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def save(state, path: str) -> None:
    """Save any pytree (MapState, PipelineState, ...) to ``path``.

    Uses orbax if importable (directory checkpoint), else a flat .npz.
    """
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, _ = _flatten(state)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def restore(template, path: str):
    """Restore into the structure of ``template``."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(os.path.abspath(path), template)
    except Exception:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves, treedef = _flatten(template)
    new_leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, new_leaves)
