import jax
import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.ops import projection as proj
from slam_robot_tpu.ops import quaternion as quat

# The reference camera: zero distortion, f=416, fy negative (main.cpp:474-482).
K_REF = jnp.array([0.0, 0.0, 0.0, 416.0, -416.0, 320.0, 240.0])
K_DIST = jnp.array([-0.11, 0.18, -0.001, 512.0, -515.0, 314.0, 241.0])


def test_plane_pixel_roundtrip_zero_distortion():
    xy = jnp.array([[0.1, -0.2], [0.0, 0.0], [0.5, 0.4]])
    px = proj.plane_to_pixel(xy, K_REF)
    np.testing.assert_allclose(px[1], [320.0, 240.0], atol=1e-5)
    back = proj.pixel_to_plane(px, K_REF)
    np.testing.assert_allclose(back, xy, atol=1e-5)


def test_plane_pixel_roundtrip_with_distortion():
    # 3 fixed-point iterations invert the distortion to sub-0.1% for
    # moderate radii (localmap.h:68-77).
    xy = jnp.array([[0.1, -0.15], [0.05, 0.0], [-0.2, 0.1]])
    px = proj.plane_to_pixel(xy, K_DIST)
    back = proj.pixel_to_plane(px, K_DIST)
    np.testing.assert_allclose(back, xy, atol=2e-4)


def test_project_identity_pose_center_point():
    # Point straight ahead projects to the principal point.
    q = quat.identity()
    t = jnp.zeros(3)
    px, valid = proj.project_point(q, t, K_REF, jnp.array([0.0, 0.0, 1000.0, 1.0]))
    assert bool(valid)
    np.testing.assert_allclose(px, [320.0, 240.0], atol=1e-4)


def test_project_cheirality():
    q = quat.identity()
    t = jnp.zeros(3)
    _, valid = proj.project_point(q, t, K_REF, jnp.array([0.0, 0.0, -10.0, 1.0]))
    assert not bool(valid)
    # z < 0.001*w also fails (project.h:27)
    _, valid = proj.project_point(q, t, K_REF, jnp.array([0.0, 0.0, 0.0005, 1.0]))
    assert not bool(valid)


def test_project_homogeneous_scale_invariant():
    # Projection is invariant to scaling the homogeneous point.
    q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.2)
    t = jnp.array([100.0, -50.0, 20.0])
    p = jnp.array([300.0, 200.0, 2000.0, 1.0])
    px1, v1 = proj.project_point(q, t, K_REF, p)
    px2, v2 = proj.project_point(q, t, K_REF, p * 3.7)
    assert bool(v1) and bool(v2)
    np.testing.assert_allclose(px1, px2, rtol=1e-5)


def test_unproject_project_roundtrip():
    # Unproject then project must land on the same pixel (matcher seeds
    # points this way, matcher.cpp:376-385).
    q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.3)
    t = jnp.array([50.0, 10.0, -5.0])
    px = jnp.array([411.0, 193.0])
    plane = proj.pixel_to_plane(px, K_REF)
    point = proj.unproject(q, t, plane, 2000.0)
    out, valid = proj.project_point(q, t, K_REF, point)
    assert bool(valid)
    np.testing.assert_allclose(out, px, atol=1e-2)


def test_unproject_depth():
    # Depth of the unprojected point in camera space equals the guess.
    q = quat.identity()
    t = jnp.zeros(3)
    point = proj.unproject(q, t, jnp.array([0.1, -0.2]), 2000.0)
    pos = proj.point_position(point)
    np.testing.assert_allclose(pos[2], 2000.0, rtol=1e-4)


def test_projection_is_differentiable():
    q = quat.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), 0.1)
    t = jnp.array([10.0, 20.0, 30.0])
    p = jnp.array([100.0, 50.0, 3000.0, 1.0])

    def f(t_, p_):
        px, _ = proj.project_point(q, t_, K_REF, p_)
        return px

    jt = jax.jacfwd(f, argnums=(0, 1))(t, p)
    assert np.all(np.isfinite(jt[0])) and np.all(np.isfinite(jt[1]))
    assert jt[0].shape == (2, 3) and jt[1].shape == (2, 4)


def test_vmap_batch():
    n = 16
    rng = np.random.default_rng(1)
    pts = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=500, size=(n, 2)), rng.uniform(1000, 4000, size=(n, 1)), np.ones((n, 1))],
            axis=1,
        ).astype(np.float32)
    )
    q = quat.identity()
    t = jnp.zeros(3)
    px, valid = jax.vmap(lambda p: proj.project_point(q, t, K_REF, p))(pts)
    assert px.shape == (n, 2)
    assert bool(jnp.all(valid))
