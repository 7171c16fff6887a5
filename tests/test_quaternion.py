import jax
import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.ops import quaternion as quat


def random_unit_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.normal(size=shape).astype(np.float32)
    return np.asarray(quat.normalize(jnp.asarray(q)))


def test_identity_rotation(rng):
    v = rng.normal(size=(5, 3)).astype(np.float32)
    out = quat.rotate(quat.identity(), jnp.asarray(v))
    np.testing.assert_allclose(out, v, atol=1e-6)


def test_rotate_matches_matrix(rng):
    q = random_unit_quat(rng, 8)
    v = rng.normal(size=(8, 3)).astype(np.float32)
    r1 = quat.rotate(jnp.asarray(q), jnp.asarray(v))
    r2 = jnp.einsum("nij,nj->ni", quat.to_matrix(jnp.asarray(q)), jnp.asarray(v))
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_multiply_compose(rng):
    a = random_unit_quat(rng)
    b = random_unit_quat(rng)
    v = rng.normal(size=3).astype(np.float32)
    lhs = quat.rotate(quat.multiply(jnp.asarray(a), jnp.asarray(b)), jnp.asarray(v))
    rhs = quat.rotate(jnp.asarray(a), quat.rotate(jnp.asarray(b), jnp.asarray(v)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_conjugate_inverse(rng):
    q = random_unit_quat(rng)
    v = rng.normal(size=3).astype(np.float32)
    out = quat.rotate(jnp.asarray(q), quat.rotate_inverse(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_axis_angle_90deg():
    # 90 degrees about z maps x->y.
    q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    out = quat.rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-6)


def test_exp_map_matches_reference_formula():
    # exp(d) = [sin|d|/|d| d, cos|d|] (slam.cpp:37-44)
    d = jnp.array([0.1, -0.2, 0.3])
    n = float(jnp.linalg.norm(d))
    expect = np.concatenate([np.sin(n) / n * np.asarray(d), [np.cos(n)]])
    np.testing.assert_allclose(quat.exp_map(d), expect, atol=1e-6)
    # zero delta -> identity, and differentiable there
    np.testing.assert_allclose(quat.exp_map(jnp.zeros(3)), [0, 0, 0, 1], atol=1e-7)
    g = jax.jacfwd(quat.exp_map)(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_retract_small_step_is_rotation(rng):
    q = jnp.asarray(random_unit_quat(rng))
    d = jnp.array([1e-3, 2e-3, -1e-3])
    q2 = quat.retract(q, d)
    np.testing.assert_allclose(jnp.linalg.norm(q2), 1.0, atol=1e-6)
    assert float(quat.angle_between(q, q2)) < 0.01


def test_retract_zero_is_identity(rng):
    q = jnp.asarray(random_unit_quat(rng))
    np.testing.assert_allclose(quat.retract(q, jnp.zeros(3)), q, atol=1e-6)
