"""Closed-loop robot simulation: perceive -> plan -> act in one jitted scan.

The reference never closes this loop — its planner (planner.cpp) and vehicle
control (vehicle.cpp) are disconnected from SLAM, and actuation is an
open-loop scripted thread (TestMove, main.cpp:348-369). Here the loop
closes: a bicycle-model vehicle carries the camera through a landmark
world, frames are rendered, perception estimates pose (optionally full
SLAM), the Dubins planner replans to the goal, and a pure-pursuit
controller issues Turn/Speed commands with the same [-1,1] scaling the
Pololu shim uses.

``rollout`` is pure and vmappable: 64 parallel rollouts (BASELINE config 4)
are ``jax.vmap(rollout)`` over a batch of goals/keys.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_robot_tpu.config import SlamConfig
from slam_robot_tpu.models import planner, renderer, vehicle
from slam_robot_tpu.models import pipeline as pipeline_mod
from slam_robot_tpu.ops import quaternion as quat


class SimWorld(NamedTuple):
    points: jnp.ndarray      # [P,4] homogeneous landmarks (mm)
    brightness: jnp.ndarray  # [P]


def camera_pose(vstate: vehicle.VehicleState):
    """Vehicle ground pose (meters, heading from +X_2d) -> camera pose
    (mm, looking along the vehicle heading). 2D (x, y) maps to world
    (X, Z); yaw is about +Y."""
    t = jnp.array([1000.0, 0.0, 0.0]) * vstate.pos[0] + jnp.array(
        [0.0, 0.0, 1000.0]
    ) * vstate.pos[1]
    # camera forward (= R^-1 e_z) equals [cos h, 0, sin h] iff yaw = h - pi/2
    yaw = vstate.heading - jnp.pi / 2
    q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
    return q, t


def pure_pursuit(vstate: vehicle.VehicleState, goal, lookahead: float = 1.0,
                 cruise: float = 0.3):
    """Plan a Dubins path to the goal and steer at its first off-origin
    sample: turn command ~ heading error, speed ~ cruise until close."""
    p, length, _ = planner.shortest_path(
        vstate.pos, vstate.heading, goal[:2], goal[2]
    )
    pts, valid = planner.interpolate_path(vstate.pos, vstate.heading, p, 0.25,
                                          samples_per_seg=64)
    d = jnp.linalg.norm(pts - vstate.pos[None, :], axis=1)
    score = jnp.where(valid & (d > 0.05), -jnp.abs(d - lookahead), -1e9)
    target = pts[jnp.argmax(score)]
    to = target - vstate.pos
    desired = jnp.arctan2(to[1], to[0])
    err = planner.modpi(desired - vstate.heading)
    turn = jnp.clip(err / 0.45, -1.0, 1.0)
    dist_goal = jnp.linalg.norm(goal[:2] - vstate.pos)
    speed = jnp.where(dist_goal > 0.3, cruise, 0.0)
    return speed, turn, dist_goal


@functools.partial(jax.jit, static_argnames=("n_steps", "dt"))
def rollout(goal, n_steps: int = 200, dt: float = 0.1,
            params: vehicle.VehicleParams = vehicle.VehicleParams()):
    """Drive to ``goal`` = [x, y, heading] (meters/rad). Returns the
    trajectory [n_steps, 2] and final distance to goal. Perception-free
    control loop (ground-truth pose) — the SLAM-in-the-loop variant is
    ``rollout_slam``."""

    def step(vs, _):
        speed, turn, dist = pure_pursuit(vs, goal)
        vs = vehicle.step(vs, speed, turn, dt, params)
        return vs, (vs.pos, dist)

    vs0 = vehicle.init_state()
    vs, (traj, dists) = jax.lax.scan(step, vs0, None, length=n_steps)
    return traj, dists[-1]


def rollout_slam(goal, world: SimWorld, cfg: SlamConfig, intrinsics,
                 n_steps: int = 20, dt: float = 0.2,
                 params: vehicle.VehicleParams = vehicle.VehicleParams()):
    """Full closed loop: render -> SLAM pipeline -> plan from the SLAM pose
    estimate -> act. Expensive; use small SlamConfig capacities.

    Returns (vehicle trajectory [n,2], estimated camera positions [n,3] mm,
    final distance to goal)."""

    ps0 = pipeline_mod.init(cfg, intrinsics)

    def step(carry, _):
        vs, ps = carry
        q, t = camera_pose(vs)
        img = renderer.render(
            q, t, jnp.asarray(intrinsics[0]), world.points, world.brightness,
            height=cfg.image_height, width=cfg.image_width,
        )
        ps, metrics = pipeline_mod.step(ps, img, cfg)
        # SLAM pose estimate of the newest frame (mm -> meters, X/Z plane)
        est_t = ps.map.frame_trans[jnp.maximum(ps.map.n_frames - 1, 0)]
        est_vs = vehicle.VehicleState(
            pos=jnp.stack([est_t[0], est_t[2]]) / 1000.0,
            heading=vs.heading,  # heading from odometry; SLAM yaw optional
            speed=vs.speed,
        )
        speed, turn, dist = pure_pursuit(est_vs, goal)
        vs = vehicle.step(vs, speed, turn, dt, params)
        return (vs, ps), (vs.pos, est_t, dist)

    (vs, ps), (traj, est, dists) = jax.lax.scan(
        step, (vehicle.init_state(), ps0), None, length=n_steps
    )
    return traj, est, dists[-1]


def make_world(n_points: int = 300, seed: int = 0) -> SimWorld:
    pts, bright = renderer.make_world(n_points, seed)
    return SimWorld(points=pts, brightness=bright)
