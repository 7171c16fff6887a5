"""Synthetic camera renderer: images from a landmark world.

The reference consumes real camera frames (video.cpp); the closed-loop
simulator needs to manufacture them. We render a world of point landmarks as
Gaussian sprites splatted at their projected sub-pixel locations over a
low-frequency background, which gives the tracker/detector exactly the kind
of corner-like texture it expects. Pure JAX, so a whole rollout
(render -> perceive -> plan -> act) stays inside one jit/vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from slam_robot_tpu.ops import projection as proj

STAMP = 9  # sprite support (pixels), odd


def _background(height: int, width: int, seed: int = 0):
    """Fixed low-frequency background so images aren't flat."""
    y = jnp.linspace(0, 2.5 * jnp.pi, height)[:, None]
    x = jnp.linspace(0, 2.5 * jnp.pi, width)[None, :]
    return 0.45 + 0.08 * jnp.sin(x + seed) * jnp.cos(0.7 * y - seed)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render(
    q, t, k, world_points, brightness,
    height: int = 480, width: int = 640,
    sigma: float = 1.3,
):
    """Render [H,W] f32 image of homogeneous ``world_points`` [P,4] with
    per-point ``brightness`` [P] from camera pose (q, t), intrinsics k."""
    px, valid = jax.vmap(proj.project_point, in_axes=(None, None, None, 0))(
        q, t, k, world_points
    )
    inb = (
        valid
        & (px[:, 0] > -STAMP)
        & (px[:, 1] > -STAMP)
        & (px[:, 0] < width + STAMP)
        & (px[:, 1] < height + STAMP)
    )

    half = STAMP // 2
    x0 = jnp.floor(px[:, 0]).astype(jnp.int32) - half
    y0 = jnp.floor(px[:, 1]).astype(jnp.int32) - half
    fx = px[:, 0] - x0.astype(jnp.float32)
    fy = px[:, 1] - y0.astype(jnp.float32)

    gx = jnp.arange(STAMP, dtype=jnp.float32)[None, :]  # stamp grid
    dx = gx[None] - fx[:, None, None]                    # [P,1,S]
    dy = (gx[None] - fy[:, None, None]).transpose(0, 2, 1)[:, :, :1]  # [P,S,1]
    stamp = jnp.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
    stamp = stamp * (brightness * inb)[:, None, None]

    # scatter-add stamps; pad so edge stamps land in-bounds then crop
    pad = STAMP
    img = jnp.zeros((height + 2 * pad, width + 2 * pad))
    ys = (y0 + pad).clip(0, height + 2 * pad - STAMP)
    xs = (x0 + pad).clip(0, width + 2 * pad - STAMP)
    rows = ys[:, None, None] + jnp.arange(STAMP)[None, :, None]
    cols = xs[:, None, None] + jnp.arange(STAMP)[None, None, :]
    img = img.at[rows, cols].add(stamp)
    img = img[pad:-pad, pad:-pad]
    return jnp.clip(_background(height, width) + img, 0.0, 1.0)


def make_world(n_points: int = 400, seed: int = 0, extent: float = 6000.0,
               depth=(1500.0, 8000.0)):
    """Random landmark field in front of the origin looking +z."""
    import numpy as np

    rng = np.random.default_rng(seed)
    xy = rng.uniform(-extent, extent, size=(n_points, 2))
    z = rng.uniform(*depth, size=(n_points, 1))
    pts = np.concatenate([xy, z, np.ones((n_points, 1))], axis=1).astype(np.float32)
    bright = rng.uniform(0.25, 0.6, size=n_points).astype(np.float32)
    return jnp.asarray(pts), jnp.asarray(bright)
