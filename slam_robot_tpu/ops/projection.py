"""Camera model: radial distortion, plane<->pixel maps, project/unproject.

Semantics match the reference exactly:

- intrinsics vector k = [k1, k2, k3, fx, fy, cx, cy] (localmap.h:29). Note the
  reference runs with fy = -fx (y-axis flip baked into intrinsics,
  main.cpp:474-482) — we keep that a data choice, not a code choice.
- ``plane_to_pixel`` polynomial radial distortion (localmap.h:40-56)
- ``pixel_to_plane`` 3-iteration fixed-point inverse (localmap.h:58-80)
- ``project_point`` world->pixel through a frame pose, with the cancelled-w
  perspective divide and the cheirality gate p_z < 0.001*w (project.h:11-54).
  Instead of C++'s bool-return-and-abort, we return a validity mask and a
  safe (clamped-denominator) pixel so the whole thing vmaps and autodiffs.
- ``unproject`` plane-point + depth guess -> homogeneous world point
  (localmap.cpp:28-37).

All functions are single-instance and broadcast-friendly; batch with vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from slam_robot_tpu.ops import quaternion as quat


def distort_factor(xy, k):
    """1 + r2*(k1 + r2*(k2 + r2*k3)) for plane point xy (localmap.h:44-45)."""
    r2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
    return 1.0 + r2 * (k[..., 0:1] + r2 * (k[..., 1:2] + r2 * k[..., 2:3]))


def plane_to_pixel(xy, k):
    """[-1,1]^2 projective plane -> pixel space (localmap.h:40-56)."""
    p = xy * distort_factor(xy, k)
    f = jnp.stack([k[..., 3], k[..., 4]], axis=-1)
    c = jnp.stack([k[..., 5], k[..., 6]], axis=-1)
    return p * f + c


def pixel_to_plane(px, k):
    """Pixel -> plane via 3 fixed-point undistort iterations (localmap.h:58-80)."""
    f = jnp.stack([k[..., 3], k[..., 4]], axis=-1)
    c = jnp.stack([k[..., 5], k[..., 6]], axis=-1)
    p0 = (px - c) / f
    p = p0
    for _ in range(3):
        p = p0 / distort_factor(p, k)
    return p


def transform_to_camera(q, t, point4):
    """World homogeneous point -> camera-space [x*w, y*w, z*w].

    p_cam = q * (point.xyz - t * point.w) (project.h:24). The frame pose is
    (rotation q, translation t) with t being the camera position in world
    coordinates.
    """
    return quat.rotate(q, point4[..., :3] - t * point4[..., 3:4])


def project_point(q, t, k, point4, cheirality_eps: float = 0.001):
    """World point -> pixel. Returns (pixel[2], valid mask).

    valid is False when the point is behind / on the lens plane:
    p_cam_z < eps * w (project.h:27-30). The pixel is still computed with a
    clamped denominator so downstream code stays NaN-free; callers must gate
    on ``valid``.
    """
    p = transform_to_camera(q, t, point4)
    w = point4[..., 3]
    valid = p[..., 2] >= cheirality_eps * w
    # Perspective divide; the homogeneous w cancels (project.h:33-35).
    denom = jnp.where(jnp.abs(p[..., 2:3]) > 1e-12, p[..., 2:3], 1e-12)
    xy = p[..., :2] / denom
    return plane_to_pixel(xy, k), valid


def reprojection_error(q, t, k, point4, observed_px, cheirality_eps: float = 0.001):
    """projected - observed, plus validity (slam.cpp:60-84 ReprojectionError)."""
    px, valid = project_point(q, t, k, point4, cheirality_eps)
    return px - observed_px, valid


def unproject(q, t, plane_xy, distance):
    """Plane point + depth guess -> normalized homogeneous world point.

    result = [plane*d, d, 1]; xyz = q^-1 * xyz + t; normalize (localmap.cpp:28-37).
    """
    d = jnp.asarray(distance)[..., None]
    cam = jnp.concatenate([plane_xy * d, d], axis=-1)
    world = quat.rotate_inverse(q, cam) + t
    h = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


def point_position(point4, w_min: float = 1e-12):
    """Homogeneous -> world 3-vector: xyz / w (localmap.h:221-223)."""
    w = point4[..., 3:4]
    w = jnp.where(jnp.abs(w) > w_min, w, jnp.where(w >= 0, w_min, -w_min))
    return point4[..., :3] / w
