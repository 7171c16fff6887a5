"""Synthetic scenes: ground-truth trajectories, landmarks and observations.

The reference validates against reality (live cameras) or recorded PNG
replays; we additionally need fully synthetic scenes with known ground truth
for BA/clean/epipolar unit tests and benchmarks. Geometry mirrors the
reference's rig: two cameras on a 150mm x-baseline, frames alternating
between them (main.cpp:474-507), y-flipped intrinsics, depths in millimeters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.config import SlamConfig
from slam_robot_tpu.models import localmap as lm
from slam_robot_tpu.ops import projection as proj
from slam_robot_tpu.ops import quaternion as quat


class Scene(NamedTuple):
    state: lm.MapState            # map populated with (possibly noisy) values
    true_quat: jnp.ndarray        # [F,4] ground-truth frame rotations
    true_trans: jnp.ndarray       # [F,3]
    true_points: jnp.ndarray      # [P,4] homogeneous, w=1


def reference_intrinsics(cfg: SlamConfig) -> np.ndarray:
    """Zero-distortion k with the reference's negative fy (main.cpp:474-482).

    cfg.focal/cx/cy describe the reference's 640x480 rig; when cfg uses a
    different resolution the camera scales with it (same field of view)."""
    s = cfg.image_width / 640.0
    return np.array(
        [0, 0, 0, cfg.focal * s, -cfg.focal * s,
         cfg.image_width / 2.0, cfg.image_height / 2.0],
        np.float32,
    )


def make_trajectory(n_frames: int, cfg: SlamConfig, yaw_rate: float = 0.01,
                    step_mm: float = 20.0):
    """Alternating-stereo trajectory: cameras 0/1 offset by the baseline along
    local x, slowly yawing and advancing in z."""
    qs, ts = [], []
    for i in range(n_frames):
        pair = i // 2
        yaw = yaw_rate * pair
        q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
        center = jnp.array([np.sin(yaw), 0.0, np.cos(yaw)]) * 0.0 + jnp.array(
            [0.0, 0.0, step_mm * pair]
        )
        off = quat.rotate_inverse(q, jnp.array([cfg.baseline_mm * (i % 2), 0.0, 0.0]))
        qs.append(q)
        ts.append(center + off)
    return jnp.stack(qs), jnp.stack(ts)


def make_points(n_points: int, rng: np.random.Generator,
                depth_range=(1500.0, 4000.0), spread: float = 1200.0):
    xy = rng.normal(scale=spread, size=(n_points, 2))
    z = rng.uniform(*depth_range, size=(n_points, 1))
    pts = np.concatenate([xy, z, np.ones((n_points, 1))], axis=1).astype(np.float32)
    return jnp.asarray(pts)


def build_scene(
    cfg: SlamConfig,
    n_frames: int = 6,
    n_points: int = 40,
    seed: int = 0,
    pixel_noise: float = 0.0,
    pose_noise: float = 0.0,
    point_noise: float = 0.0,
) -> Scene:
    """Populate a MapState with projected observations of a true scene.

    Noise arguments perturb what goes *into the state* (initial guesses);
    the returned ground truth stays exact. All points are observed by all
    frames where the cheirality test passes.
    """
    rng = np.random.default_rng(seed)
    tq, tt = make_trajectory(n_frames, cfg)
    pts = make_points(n_points, rng)
    k = jnp.asarray(reference_intrinsics(cfg))

    state = lm.empty(cfg)
    state = lm.set_camera(state, 0, k)
    state = lm.set_camera(state, 1, k)

    # initial (noisy) state values
    nq = tq
    nt = tt
    if pose_noise:
        # leave the first two frames exact (gauge anchor, like the ref's
        # pose init at main.cpp:540-552)
        dq = jnp.asarray(rng.normal(scale=pose_noise, size=(n_frames, 3)).astype(np.float32))
        dt = jnp.asarray(
            rng.normal(scale=pose_noise * 1000, size=(n_frames, 3)).astype(np.float32)
        )
        keep = (jnp.arange(n_frames) < 2)[:, None]
        nq = jax.vmap(quat.retract)(tq, jnp.where(keep, 0.0, dq))
        nt = tt + jnp.where(keep, 0.0, dt)
    npts = pts
    if point_noise:
        dp = jnp.asarray(
            rng.normal(scale=point_noise, size=(n_points, 3)).astype(np.float32)
        )
        npts = pts.at[:, :3].add(dp)

    state, _ = lm.add_points(state, npts, jnp.ones(n_points, bool))

    for f in range(n_frames):
        cam = f % 2
        state, fi = lm.add_frame(state, cam, nq[f], nt[f])
        px, valid = jax.vmap(lambda p: proj.project_point(tq[f], tt[f], k, p))(pts)
        if pixel_noise:
            px = px + jnp.asarray(
                rng.normal(scale=pixel_noise, size=px.shape).astype(np.float32)
            )
        state = lm.add_observations(state, fi, jnp.arange(n_points), px, valid)

    return Scene(state=state, true_quat=tq, true_trans=tt, true_points=pts)
