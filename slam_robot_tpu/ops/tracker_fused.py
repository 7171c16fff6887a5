"""Batched coarse-to-fine tracker driving the fused Newton level kernel.

Same semantics as ops/tracker.py's track_feature / track_bidirectional
(hessian.h:243-264 + matcher.cpp:173-206), restructured for the TPU:

- the pyramid level index is a STATIC Python int (one kernel per level), so
  each level's true extents are compile-time constants
- per level, every lane's 32x32 search window is gathered ONCE (one vmapped
  dynamic_slice), sized to cover the full Newton budget (<= max_iters px of
  motion + 13x13 patch + bilinear support — ops/pallas/newton.MARGIN_PX)
- all Newton iterations for all lanes then run inside ONE pallas_call
  (ops/pallas/newton.py), replacing the per-iteration per-lane gathers that
  made the tracker ~40 ms of the 51 ms round-1 step (PERF.md)
- levels with no active lane are skipped with lax.cond, like the matcher's
  empty find-steps

Numerically this matches the autodiff tracker: the kernel's hand-derived
gradient/Hessian are the exact derivatives of the same photometric score
(tests/test_tracker_fused.py checks both against jax.grad/jacfwd and
against ops/tracker.track_feature lane by lane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from slam_robot_tpu.ops import patch as patch_ops
from slam_robot_tpu.ops import tracker as tracker_ref
from slam_robot_tpu.ops.pallas.newton import MARGIN_PX, newton_level
from slam_robot_tpu.ops.pyramid import PAD, FlatPyramid, level_dims

WIN = 32  # search window (>= 13 + 1 bilinear + 2 * Newton budget, cap 32)


def default_backend() -> str:
    """pallas on real TPUs, plain XLA elsewhere (identical math)."""
    return "xla" if jax.default_backend() == "cpu" else "pallas"


def _static_dims(pyr: FlatPyramid):
    plane_h, plane_w = pyr.data.shape[-2] - 2 * PAD, pyr.data.shape[-1] - 2 * PAD
    return level_dims(plane_h, plane_w, pyr.depth)


def _gather_windows(pyr: FlatPyramid, level: int, pos, wh: int, ww: int):
    """Per-lane (wh x ww) windows around ``pos`` from one pyramid level.

    Returns (win [F,wh,ww], org [F,2] absolute level coords of win[0,0]).
    Window origins are clamped inside the level's padded extent, so edge
    windows stay flush with the padded border and the kernel's support
    clamp reproduces ops/patch.extract's replicate-edge behavior.
    """
    dims = _static_dims(pyr)
    h, w = dims[level]
    hp, wp = h + 2 * PAD, w + 2 * PAD
    j = pyr.offset + level

    p = jnp.clip(jnp.nan_to_num(pos), -1e6, 1e6)
    ox = jnp.clip(
        jnp.floor(p[:, 0]).astype(jnp.int32) - MARGIN_PX + PAD, 0, wp - ww
    )
    oy = jnp.clip(
        jnp.floor(p[:, 1]).astype(jnp.int32) - MARGIN_PX + PAD, 0, hp - wh
    )

    def one(oy1, ox1):
        return lax.dynamic_slice(pyr.data, (j, oy1, ox1), (1, wh, ww))[0]

    win = jax.vmap(one)(oy, ox)
    org = jnp.stack([ox - PAD, oy - PAD], -1).astype(jnp.float32)
    return win, org


def track_feature_batch(pyr: FlatPyramid, patches: patch_ops.Patch, pts,
                        lvls, weight, threshold: float = 0.001,
                        max_iters: int = 10, active=None,
                        backend: str | None = None):
    """Batched TrackFeature (hessian.h:243-264): coarse-to-fine cascade with
    per-lane dynamic level counts. pts [F,2]; patches: stacked per-level
    Patch with leading axes [F, L]. Returns (pos [F,2], ok [F] bool)."""
    backend = backend or default_backend()
    if max_iters > MARGIN_PX - (weight.shape[0] - 1) // 2:
        raise ValueError(
            f"max_iters={max_iters} exceeds the {WIN}x{WIN} window's Newton "
            f"budget ({MARGIN_PX - (weight.shape[0] - 1) // 2}); grow "
            "MARGIN_PX/WIN in ops/pallas/newton.py or lower the budget"
        )
    dims = _static_dims(pyr)
    L = pyr.depth
    F = pts.shape[0]
    lvls = jnp.asarray(lvls, jnp.int32)
    if active is None:
        active = jnp.ones((F,), bool)
    active = jnp.asarray(active, bool)

    scale0 = (2.0 ** (lvls - 1)).astype(jnp.float32)
    pos = jnp.asarray(pts, jnp.float32) / scale0[:, None]
    status = jnp.zeros((F,), jnp.float32)

    for k in range(L):
        i = L - 1 - k
        h, w = dims[i]
        wh, ww = min(WIN, h + 2 * PAD), min(WIN, w + 2 * PAD)
        lvl_on = i <= lvls - 1
        take = lvl_on & (status == 0.0) & active

        def run(args, _i=i, _wh=wh, _ww=ww, _h=h, _w=w):
            pos, status, take = args
            win, org = _gather_windows(pyr, _i, pos, _wh, _ww)
            new_pos, st = newton_level(
                win, pos, org,
                patches.data[:, _i], patches.valid[:, _i].astype(jnp.float32),
                patches.mean[:, _i], patches.sumsq[:, _i],
                take.astype(jnp.float32), weight,
                float(_w), float(_h), threshold=float(threshold),
                max_iters=int(max_iters), size=int(weight.shape[0]),
                backend=backend,
            )
            pos = jnp.where(take[:, None], new_pos, pos)
            status = jnp.where(take, st, status)
            return pos, status

        def skip(args):
            pos, status, _ = args
            return pos, status

        pos, status = lax.cond(jnp.any(take), run, skip, (pos, status, take))
        if i > 0:
            pos = jnp.where(lvl_on[:, None], pos * 2.0, pos)

    return pos, (status == 0.0) & active


def get_patch_stacks(pyr: FlatPyramid, pts, size: int = 13) -> patch_ops.Patch:
    """Per-lane per-level reference patches: Patch with axes [F, L, ...]."""
    return jax.vmap(lambda p: tracker_ref.get_patch_stack(pyr, p, size))(pts)


def track_bidirectional_batch(pyr_from: FlatPyramid, pyr_to: FlatPyramid,
                              from_pt, init_to_pt, lvls, weight,
                              threshold: float = 0.001, max_iters: int = 10,
                              roundtrip_px: float = 0.3,
                              min_variance: float = 1e-5,
                              active=None, backend: str | None = None,
                              p1: patch_ops.Patch | None = None):
    """Batched forward/backward consistency tracking (matcher.cpp:173-206)
    with the fused level kernel; mirrors ops/tracker.track_bidirectional.

    ``p1`` optionally supplies precomputed reference patch stacks at
    ``from_pt`` in ``pyr_from`` (the matcher caches them per view — they
    never change once a view is stored)."""
    F = from_pt.shape[0]
    if active is None:
        active = jnp.ones((F,), bool)
    active = jnp.asarray(active, bool)

    if p1 is None:
        p1 = get_patch_stacks(pyr_from, from_pt, weight.shape[0])
    to_pt, ok1 = track_feature_batch(
        pyr_to, p1, init_to_pt, lvls, weight, threshold, max_iters,
        active=active, backend=backend,
    )

    p2 = get_patch_stacks(pyr_to, to_pt, weight.shape[0])
    back_pt, ok2 = track_feature_batch(
        pyr_from, p2, from_pt, lvls, weight, threshold, max_iters,
        active=ok1, backend=backend,
    )

    textured = (p1.sumsq[:, 0] - p1.mean[:, 0] ** 2) >= min_variance
    dist = jnp.linalg.norm(from_pt - back_pt, axis=-1)
    ok = ok1 & ok2 & textured & (dist <= roundtrip_px)
    return to_pt, ok
