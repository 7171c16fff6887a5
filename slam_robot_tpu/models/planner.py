"""Dubins-style path planner (planner.cpp rebuilt, vmapped over all types).

The reference generates 18 candidate paths — 6 primitives {LSL, LSR, LRL}
x {+1,-1} parity, each in {forward, time-reversed, direction-flipped}
variants (planner.cpp:218-264) — and takes the arg-min by path length
(planner.cpp:266-282). The primitives are closed-form trigonometry: perfect
vmap material, so ``shortest_path`` evaluates all 18 at once.

Representation: a path is (dist[3], kind[3], valid) where kind is
-1 left / 0 straight / +1 right, matching the reference's Segment
(planner.cpp:32-38). ``interpolate_path`` walks segments with a fixed
per-segment sample capacity and a validity mask (replacing the dynamic
std::vector of planner.cpp:284-340).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

TURNING_RADIUS = 2.0  # planner.cpp:24
N_TYPES = 18


class Path(NamedTuple):
    dist: jnp.ndarray   # [3]
    kind: jnp.ndarray   # [3] -1 left, 0 straight, 1 right
    valid: jnp.ndarray  # scalar bool


def mod2pi(a):
    return jnp.mod(a, 2.0 * jnp.pi)


def modpi(a):
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def _rot(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([c, s])  # R(angle) @ [1,0]


def _lsl(cpos, cdir, gpos, gdir, parity, r):
    """planner.cpp:53-85."""
    ca = cpos + r * _rot(cdir + parity * jnp.pi / 2)
    cb = gpos + r * _rot(gdir + parity * jnp.pi / 2)
    heading = cb - ca
    dist = jnp.linalg.norm(heading)
    valid = dist > 0
    angle = jnp.arctan2(heading[1], heading[0])
    a1 = angle - cdir
    a2 = gdir - angle
    return Path(
        dist=jnp.stack([mod2pi(parity * a1), dist, mod2pi(parity * a2)]),
        kind=jnp.stack([-parity, jnp.zeros_like(parity), -parity]),
        valid=valid,
    )


def _lsr(cpos, cdir, gpos, gdir, parity, r):
    """planner.cpp:88-137."""
    ca = cpos + r * _rot(cdir + parity * jnp.pi / 2)
    cb = gpos + r * _rot(gdir - parity * jnp.pi / 2)
    heading = cb - ca
    dist = jnp.linalg.norm(heading)
    valid = dist >= r * 2
    sdist = jnp.maximum(dist, r * 2 + 1e-9)
    angle = jnp.arctan2(heading[1], heading[0])
    theta = jnp.arcsin(jnp.clip(r / (sdist / 2), -1.0, 1.0))
    tdist = jnp.sqrt(jnp.maximum(sdist * sdist - 4 * r * r, 0.0))
    angle1 = angle + parity * theta
    a1 = angle1 - cdir
    a2 = angle1 - gdir
    return Path(
        dist=jnp.stack([mod2pi(a1 * parity), tdist, mod2pi(a2 * parity)]),
        kind=jnp.stack([-parity, jnp.zeros_like(parity), parity]),
        valid=valid,
    )


def _lrl(cpos, cdir, gpos, gdir, parity, r):
    """planner.cpp:142-190."""
    ca = cpos + r * _rot(cdir + parity * jnp.pi / 2)
    cb = gpos + r * _rot(gdir + parity * jnp.pi / 2)
    heading = cb - ca
    dist = jnp.linalg.norm(heading)
    valid = dist <= r * 4
    sdist = jnp.minimum(dist, r * 4)
    angle = jnp.arctan2(heading[1], heading[0])
    theta = -jnp.arccos(jnp.clip((sdist / 2) / (r * 2), -1.0, 1.0))
    t1 = cdir - angle - jnp.pi / 2
    t2 = gdir - angle - jnp.pi / 2
    a1 = jnp.where(parity < 0, t1 - (jnp.pi - theta), theta - t1)
    a2 = jnp.pi + 2 * theta
    a3 = jnp.where(parity < 0, theta - t2, parity * (t2 - (jnp.pi - theta)))
    return Path(
        dist=jnp.stack([mod2pi(a1), mod2pi(a2), mod2pi(a3)]),
        kind=jnp.stack([-parity, parity, -parity]),
        valid=valid,
    )


def generate_path(cpos, cdir, gpos, gdir, ptype, r=TURNING_RADIUS):
    """Types 0-5: {LSL+, LSR+, LSL-, LSR-, LRL+, LRL-}
    (planner.cpp:218-236)."""
    one = jnp.float32(1.0)
    branches = [
        lambda: _lsl(cpos, cdir, gpos, gdir, one, r),
        lambda: _lsr(cpos, cdir, gpos, gdir, one, r),
        lambda: _lsl(cpos, cdir, gpos, gdir, -one, r),
        lambda: _lsr(cpos, cdir, gpos, gdir, -one, r),
        lambda: _lrl(cpos, cdir, gpos, gdir, one, r),
        lambda: _lrl(cpos, cdir, gpos, gdir, -one, r),
    ]
    return jax.lax.switch(ptype, branches)


def reverse_path(p: Path) -> Path:
    """planner.cpp:193-205: reversed order, negated distances."""
    return Path(dist=-p.dist[::-1], kind=p.kind[::-1], valid=p.valid)


def generate_mixed_path(cpos, cdir, gpos, gdir, mtype, r=TURNING_RADIUS):
    """Types 0-17 = 6 primitives x {forward, time-reversed, flipped}
    (planner.cpp:238-264)."""
    sub = jnp.mod(mtype, 6)
    major = mtype // 6

    def fwd():
        return generate_path(cpos, cdir, gpos, gdir, sub, r)

    def rev():
        return reverse_path(generate_path(gpos, gdir, cpos, cdir, sub, r))

    def flip():
        p = generate_path(cpos, mod2pi(cdir + jnp.pi), gpos, mod2pi(gdir + jnp.pi), sub, r)
        dist = -p.dist
        kind = -p.kind
        dist = jnp.where(kind != 0, mod2pi(dist), dist)
        return Path(dist=dist, kind=kind, valid=p.valid)

    return jax.lax.switch(major, [fwd, rev, flip])


def path_length(p: Path, r=TURNING_RADIUS):
    """planner.cpp:207-216."""
    seg = jnp.where(p.kind == 0, jnp.abs(p.dist), jnp.abs(modpi(p.dist)) * r)
    return jnp.sum(seg)


@functools.partial(jax.jit, static_argnames=())
def shortest_path(cpos, cdir, gpos, gdir, r=TURNING_RADIUS):
    """Arg-min over all 18 types at once (planner.cpp:266-282).
    Returns (Path, length, type_index)."""
    cpos = jnp.asarray(cpos, jnp.float32)
    gpos = jnp.asarray(gpos, jnp.float32)

    def one(i):
        p = generate_mixed_path(cpos, cdir, gpos, gdir, i, r)
        length = jnp.where(p.valid, path_length(p, r), jnp.inf)
        return p, length

    paths, lengths = jax.vmap(one)(jnp.arange(N_TYPES))
    best = jnp.argmin(lengths)
    pick = jax.tree.map(lambda a: a[best], paths)
    return pick, lengths[best], best


@functools.partial(jax.jit, static_argnames=("samples_per_seg",))
def interpolate_path(cpos, cdir, p: Path, step: float = 0.1,
                     samples_per_seg: int = 256, r=TURNING_RADIUS):
    """Polyline samples along a path (planner.cpp:284-340).

    Returns (points[3*N+1, 2], valid mask). Each segment contributes its
    start plus up to N-1 interior samples at arc-length ``step``; the final
    endpoint is appended last.
    """
    cpos = jnp.asarray(cpos, jnp.float32)

    def seg_points(carry, seg):
        pos, direction = carry
        d, kind = seg

        # straight (planner.cpp:293-308)
        heading = _rot(direction)
        sdist = jnp.abs(d)
        sheading = jnp.where(d < 0, -heading, heading)
        ts = (jnp.arange(samples_per_seg, dtype=jnp.float32)) * step  # 0, step, ...
        spts = pos[None, :] + ts[:, None] * sheading[None, :]
        svalid = ts < jnp.maximum(sdist, 1e-9)
        s_end = pos + sdist * sheading
        s_dir = direction

        # curve (planner.cpp:309-335)
        center = pos + r * _rot(direction - kind * jnp.pi / 2)
        cdist = modpi(d)
        order = jnp.where(cdist < 0, -kind, kind)
        cdist_a = jnp.abs(cdist)
        t1 = direction - kind * jnp.pi / 2 + jnp.pi
        angles = t1 - ts * order
        cpts = center[None, :] + r * jnp.stack(
            [jnp.cos(angles), jnp.sin(angles)], axis=1
        )
        cvalid = ts < jnp.maximum(cdist_a, 1e-9)
        c_end = center + r * _rot(t1 - d * kind)
        c_dir = direction - kind * d

        is_straight = kind == 0
        pts = jnp.where(is_straight, spts, cpts)
        # the segment start is always emitted (ts=0 row), matching the
        # reference's push_back(c.pos_) per segment
        valid = jnp.where(is_straight, svalid, cvalid).at[0].set(True)
        end = jnp.where(is_straight, s_end, c_end)
        ndir = jnp.where(is_straight, s_dir, c_dir)
        return (end, ndir), (pts, valid)

    (end, _), (pts, valid) = jax.lax.scan(
        seg_points, (cpos, jnp.asarray(cdir, jnp.float32)),
        (p.dist, p.kind.astype(jnp.float32)),
    )
    pts = pts.reshape(-1, 2)
    valid = valid.reshape(-1) & p.valid
    pts = jnp.concatenate([pts, end[None, :]], axis=0)
    valid = jnp.concatenate([valid, p.valid[None]], axis=0)
    return pts, valid


def path_endpoint(cpos, cdir, p: Path, r=TURNING_RADIUS):
    """Final (pos, dir) after following the path (for reachability checks)."""
    def seg(carry, s):
        pos, direction = carry
        d, kind = s
        heading = _rot(direction)
        s_end = pos + jnp.abs(d) * jnp.where(d < 0, -heading, heading)
        center = pos + r * _rot(direction - kind * jnp.pi / 2)
        t1 = direction - kind * jnp.pi / 2 + jnp.pi
        c_end = center + r * _rot(t1 - d * kind)
        is_straight = kind == 0
        return (
            jnp.where(is_straight, s_end, c_end),
            jnp.where(is_straight, direction, direction - kind * d),
        ), None

    (pos, direction), _ = jax.lax.scan(
        seg, (jnp.asarray(cpos, jnp.float32), jnp.asarray(cdir, jnp.float32)),
        (p.dist, p.kind.astype(jnp.float32)),
    )
    return pos, direction
