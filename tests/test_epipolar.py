import jax
import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.ops import epipolar as epi
from slam_robot_tpu.ops import projection as proj
from slam_robot_tpu.ops import quaternion as quat

K = jnp.array([0.0, 0.0, 0.0, 416.0, -416.0, 320.0, 240.0])


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    u = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(epi.skew(v) @ u, jnp.cross(v, u), atol=1e-6)


def test_epipolar_zero_for_true_correspondences(rng):
    # Build two frames and project real 3D points: residuals must vanish
    # (this is what ApplyEpipolarConstraint checks, localmap.cpp:232-276).
    q1 = quat.identity()
    t1 = jnp.zeros(3)
    q2 = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.05)
    t2 = jnp.array([150.0, 0.0, 0.0])

    pts = np.concatenate(
        [
            rng.normal(scale=400, size=(20, 2)),
            rng.uniform(1500, 4000, size=(20, 1)),
            np.ones((20, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    pts = jnp.asarray(pts)

    px1, v1 = jax.vmap(lambda p: proj.project_point(q1, t1, K, p))(pts)
    px2, v2 = jax.vmap(lambda p: proj.project_point(q2, t2, K, p))(pts)
    assert bool(jnp.all(v1 & v2))

    h1 = proj.pixel_to_plane(px1, K)
    h2 = proj.pixel_to_plane(px2, K)
    # Residual convention from localmap.cpp:253-262: obs1 is the newer
    # observation; E maps from frame1 to frame2 with h2' E h1.
    r = epi.epipolar_residual_frames(q1, t1, q2, t2, h1, h2)
    np.testing.assert_allclose(r, np.zeros(20), atol=1e-5)


def test_epipolar_nonzero_for_bad_correspondence(rng):
    q1 = quat.identity()
    t1 = jnp.zeros(3)
    q2 = quat.identity()
    t2 = jnp.array([150.0, 0.0, 0.0])
    p = jnp.array([500.0, 300.0, 2500.0, 1.0])
    px1, _ = proj.project_point(q1, t1, K, p)
    px2, _ = proj.project_point(q2, t2, K, p)
    h1 = proj.pixel_to_plane(px1, K)
    # Perturb the second observation off the epipolar line (y direction).
    h2 = proj.pixel_to_plane(px2 + jnp.array([0.0, 25.0]), K)
    r = epi.epipolar_residual_frames(q1, t1, q2, t2, h1, h2)
    assert abs(float(r)) > 0.0015  # over the ref's threshold (localmap.cpp:260)
