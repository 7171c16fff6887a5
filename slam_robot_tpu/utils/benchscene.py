"""The headline-bench scene, shared by bench.py and tools/profile_scan.py.

A panoramic alternating-stereo sweep over a 360-degree ring world dense
enough that keyframes keep seeding until the map holds ~1k live landmarks
(the BASELINE.md 1k-landmark working set). The warm phase yaws briskly to
populate the map; the timed continuation runs at the reference's
slow-robot per-frame motion (video.cpp:147-155 configures 5 fps capture on
a crawling platform).
"""

from __future__ import annotations

import numpy as np


def sweep_pose(i: int):
    """Ground-truth pose of sweep frame ``i`` (alternating stereo pair)."""
    pair = i // 2
    yaw = 0.03 * min(pair, 48) + 0.02 * max(pair - 48, 0)
    t = np.array([150.0 * (i % 2), 0.0, 10.0 * pair], np.float32)
    return yaw, t


def make_frames(cfg, n_frames: int, seed: int = 0):
    """Render the sweep's frames on-device. Returns a list of [H,W] f32."""
    import jax
    import jax.numpy as jnp

    from slam_robot_tpu.models import renderer
    from slam_robot_tpu.ops import quaternion as quat
    from slam_robot_tpu.utils import synthetic

    k = jnp.asarray(synthetic.reference_intrinsics(cfg))
    rng = np.random.default_rng(seed)
    n_world = 14000
    ang = rng.uniform(0, 2 * np.pi, n_world)
    rad = rng.uniform(2500.0, 9000.0, n_world)
    wx = rad * np.sin(ang)
    wz = rad * np.cos(ang)
    wy = rng.uniform(-2500.0, 2500.0, n_world)
    world = jnp.asarray(
        np.stack([wx, wy, wz, np.ones(n_world)], -1).astype(np.float32)
    )
    bright = jnp.asarray(rng.uniform(0.35, 0.75, n_world).astype(np.float32))

    frames = []
    for i in range(n_frames):
        yaw, tnp = sweep_pose(i)
        q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
        frames.append(
            renderer.render(q, jnp.asarray(tnp), k, world, bright,
                            height=cfg.image_height, width=cfg.image_width)
        )
    frames = [jax.device_put(f) for f in frames]
    jax.block_until_ready(frames)
    return frames
