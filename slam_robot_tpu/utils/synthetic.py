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


def build_large_problem(
    n_frames: int,
    n_points: int,
    obs_per_frame: int = 100,
    seed: int = 0,
    point_noise: float = 30.0,
    pose_noise_mm: float = 10.0,
    pixel_noise: float = 0.3,
    cfg: SlamConfig | None = None,
):
    """Raw BA problem arrays at mapping scale (BASELINE config 5:
    10k keyframes / 500k landmarks). Skips MapState (whose per-point rings
    don't matter for batch BA) and writes the flat tables directly.

    Returns a dict of arrays + ground truth, ready for ops/ba_cg.solve.
    """
    cfg = cfg or SlamConfig()
    rng = np.random.default_rng(seed)
    k = jnp.asarray(reference_intrinsics(cfg))

    # a long survey trajectory over a large landmark field
    span = max(n_points / 50.0, 100.0)  # mm per frame step scales with map
    t_true = np.zeros((n_frames, 3), np.float32)
    t_true[:, 0] = np.cumsum(rng.normal(20.0, 5.0, n_frames))
    t_true[:, 2] = np.cumsum(rng.normal(15.0, 5.0, n_frames))
    yaw = np.cumsum(rng.normal(0.0, 0.002, n_frames)).astype(np.float32)
    q_true = np.asarray(
        jax.vmap(lambda a: quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), a))(
            jnp.asarray(yaw)
        )
    )

    pts = np.zeros((n_points, 4), np.float32)
    pts[:, 0] = rng.uniform(t_true[:, 0].min() - 2000, t_true[:, 0].max() + 2000, n_points)
    pts[:, 1] = rng.normal(0.0, 800.0, n_points)
    pts[:, 2] = rng.uniform(t_true[:, 2].min() + 1500, t_true[:, 2].max() + 6000, n_points)
    pts[:, 3] = 1.0

    # each frame observes obs_per_frame random landmarks ahead of it
    O = n_frames * obs_per_frame
    obs_frame = np.repeat(np.arange(n_frames, dtype=np.int32), obs_per_frame)
    obs_point = rng.integers(0, n_points, O).astype(np.int32)

    px, valid = jax.vmap(proj.project_point)(
        jnp.asarray(q_true)[obs_frame],
        jnp.asarray(t_true)[obs_frame],
        jnp.tile(k, (O, 1)),
        jnp.asarray(pts)[obs_point],
    )
    px = np.asarray(px) + rng.normal(0, pixel_noise, (O, 2)).astype(np.float32)
    inb = (
        np.asarray(valid)
        & (px[:, 0] > 0) & (px[:, 0] < cfg.image_width)
        & (px[:, 1] > 0) & (px[:, 1] < cfg.image_height)
    )

    # noisy initial values (first two frames anchored)
    t0 = t_true + rng.normal(0, pose_noise_mm, (n_frames, 3)).astype(np.float32)
    t0[:2] = t_true[:2]
    q0 = q_true
    p0 = pts.copy()
    p0[:, :3] += rng.normal(0, point_noise, (n_points, 3)).astype(np.float32)

    return dict(
        frame_quat=jnp.asarray(q0),
        frame_trans=jnp.asarray(t0),
        frame_cam=jnp.zeros(n_frames, jnp.int32),
        cam_k=jnp.asarray(reference_intrinsics(cfg))[None],
        point_loc=jnp.asarray(p0),
        point_uncertainty=jnp.full(n_points, 1e8, jnp.float32),
        obs_frame=jnp.asarray(obs_frame),
        obs_point=jnp.asarray(obs_point),
        obs_px=jnp.asarray(px),
        obs_ok=jnp.asarray(inb),
        present=jnp.ones(n_frames, bool),
        free_frame=jnp.ones(n_frames, bool).at[:2].set(False),
        true_trans=jnp.asarray(t_true),
        true_points=jnp.asarray(pts),
    )


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
