import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_robot_tpu.models import planner


def endpoint_error(cpos, cdir, gpos, gdir, p):
    pos, direction = planner.path_endpoint(cpos, cdir, p)
    perr = float(jnp.linalg.norm(pos - jnp.asarray(gpos, jnp.float32)))
    derr = abs(float(planner.modpi(direction - gdir)))
    return perr, derr


CASES = [
    ((0.0, 0.0), jnp.pi / 2, (-2.0, 5.0), jnp.pi / 2),   # the ref demo goal
    ((0.0, 0.0), jnp.pi / 2, (6.0, 3.0), 0.0),
    ((0.0, 0.0), 0.0, (10.0, 0.0), 0.0),                 # straight ahead
    ((0.0, 0.0), 0.0, (0.0, 8.0), jnp.pi),
    ((1.0, -2.0), 2.1, (-4.0, -7.0), -1.0),
]


@pytest.mark.parametrize("cpos,cdir,gpos,gdir", CASES)
def test_shortest_path_reaches_goal(cpos, cdir, gpos, gdir):
    p, length, ptype = planner.shortest_path(
        jnp.asarray(cpos), cdir, jnp.asarray(gpos), gdir
    )
    assert bool(p.valid)
    assert np.isfinite(float(length))
    perr, derr = endpoint_error(cpos, cdir, gpos, gdir, p)
    assert perr < 0.05, f"type {int(ptype)}: endpoint off by {perr}"
    assert derr < 0.05, f"type {int(ptype)}: heading off by {derr}"


def test_straight_line_length():
    p, length, _ = planner.shortest_path(
        jnp.array([0.0, 0.0]), 0.0, jnp.array([10.0, 0.0]), 0.0
    )
    np.testing.assert_allclose(float(length), 10.0, atol=0.05)


def test_length_lower_bound():
    # path length can never beat the euclidean distance
    rng = np.random.default_rng(0)
    for _ in range(10):
        c = rng.uniform(-8, 8, 2)
        g = rng.uniform(-8, 8, 2)
        cd, gd = rng.uniform(-np.pi, np.pi, 2)
        _, length, _ = planner.shortest_path(jnp.asarray(c), cd, jnp.asarray(g), gd)
        assert float(length) >= np.linalg.norm(c - g) - 0.05


def test_lsl_segments_reference_formula():
    # LSL with parity 1 between two poses on a straight line with the same
    # heading: both arcs should be ~0, middle segment = distance
    p = planner._lsl(
        jnp.array([0.0, 0.0]), jnp.float32(0.0),
        jnp.array([5.0, 0.0]), jnp.float32(0.0), jnp.float32(1.0), 2.0
    )
    assert bool(p.valid)
    d = np.asarray(p.dist)
    assert min(d[0], 2 * np.pi - d[0]) < 1e-5
    np.testing.assert_allclose(d[1], 5.0, atol=1e-5)
    assert min(d[2], 2 * np.pi - d[2]) < 1e-5


def test_interpolate_path_follows_endpoint():
    cpos = jnp.array([0.0, 0.0])
    cdir = jnp.float32(jnp.pi / 2)
    gpos = jnp.array([-2.0, 5.0])
    p, _, _ = planner.shortest_path(cpos, cdir, gpos, jnp.pi / 2)
    pts, valid = planner.interpolate_path(cpos, cdir, p, 0.1)
    v = np.asarray(valid)
    arr = np.asarray(pts)[v]
    # starts at start, ends at goal
    np.testing.assert_allclose(arr[0], [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(arr[-1], np.asarray(gpos), atol=0.05)
    # consecutive samples are ~step apart (within a segment)
    steps = np.linalg.norm(np.diff(arr, axis=0), axis=1)
    assert np.median(steps) < 0.2


def test_reverse_path_shares_length():
    cpos, gpos = jnp.array([0.0, 0.0]), jnp.array([3.0, 4.0])
    p = planner.generate_path(cpos, 0.5, gpos, 1.0, 0)
    rp = planner.reverse_path(p)
    np.testing.assert_allclose(
        float(planner.path_length(p)), float(planner.path_length(rp)), atol=1e-5
    )


def test_vmapped_goal_batch():
    goals = jnp.asarray(np.random.default_rng(1).uniform(-8, 8, (16, 2)).astype(np.float32))

    def plan(g):
        _, length, _ = planner.shortest_path(jnp.array([0.0, 0.0]), 0.0, g, 0.0)
        return length

    lengths = jax.jit(jax.vmap(plan))(goals)
    assert np.all(np.isfinite(np.asarray(lengths)))
