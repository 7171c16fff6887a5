import jax
import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.config import SlamConfig
from slam_robot_tpu.models import renderer, sim, vehicle


def test_camera_pose_convention():
    # vehicle at origin heading +x_2d: camera looks along world +X
    vs = vehicle.init_state(heading=0.0)
    q, t = sim.camera_pose(vs)
    from slam_robot_tpu.ops import quaternion as quat

    fwd = quat.rotate_inverse(q, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(fwd), [1.0, 0.0, 0.0], atol=1e-6)
    # heading pi/2 (+y_2d): camera looks along world +Z
    q, t = sim.camera_pose(vehicle.init_state(heading=np.pi / 2))
    fwd = quat.rotate_inverse(q, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(fwd), [0.0, 0.0, 1.0], atol=1e-6)


def test_rollout_reaches_goal():
    traj, dist = sim.rollout(jnp.array([4.0, 3.0, 0.0]), n_steps=400)
    assert traj.shape == (400, 2)
    assert float(dist) < 0.5


def test_rollout_behind_goal():
    # goal behind the start: needs the Dubins turn-around types
    traj, dist = sim.rollout(jnp.array([-4.0, -1.0, 3.14]), n_steps=600)
    assert float(dist) < 0.8


def test_rollout_vmap():
    goals = jnp.array([[3.0, 2.0, 0.0], [5.0, -1.0, 1.0]])
    traj, dist = jax.vmap(lambda g: sim.rollout(g, n_steps=300))(goals)
    assert traj.shape == (2, 300, 2)
    assert np.all(np.isfinite(np.asarray(dist)))


def test_render_world_visible():
    world = sim.make_world(200, seed=1)
    cfg = SlamConfig(image_width=160, image_height=120)
    from slam_robot_tpu.utils import synthetic

    k = jnp.asarray(synthetic.reference_intrinsics(cfg))
    vs = vehicle.init_state(heading=np.pi / 2)  # looking +Z where points are
    q, t = sim.camera_pose(vs)
    img = renderer.render(q, t, k, world.points, world.brightness,
                          height=120, width=160)
    arr = np.asarray(img)
    assert arr.shape == (120, 160)
    assert arr.std() > 0.02  # sprites visible over the background
