import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_robot_tpu.config import SlamConfig
from slam_robot_tpu.models import localmap as lm
from slam_robot_tpu.models import slam
from slam_robot_tpu.ops import ba
from slam_robot_tpu.parallel import mesh as mesh_mod
from slam_robot_tpu.parallel import multi_robot, rollouts, sharded_ba
from slam_robot_tpu.utils import synthetic

CFG = SlamConfig(max_frames=16, max_points=64, max_obs=2048, max_obs_per_point=16)


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh({"model": 8})


def _problem(scene):
    s = scene.state
    free, present = slam.window_masks(s, 4, 8)
    obs_ok = slam._obs_ok(s, s.n_frames - 8)
    return s, free, present, obs_ok


def test_sharded_ba_matches_single_device(mesh8):
    scene = synthetic.build_scene(CFG, n_frames=8, n_points=30, point_noise=40.0)
    s, free, present, obs_ok = _problem(scene)
    args = (
        s.frame_quat, s.frame_trans, s.frame_cam, s.cam_k,
        s.point_loc, s.point_uncertainty,
        s.obs_frame, s.obs_point, s.obs_px, obs_ok, present, free,
    )
    ref = ba.solve(*args, ba.BAConfig())
    shd = sharded_ba.solve_sharded(mesh8, *args, cfg=ba.BAConfig())
    assert bool(ref.ok) and bool(shd.ok)
    # same optimum (iteration paths may differ slightly in f32)
    np.testing.assert_allclose(
        np.asarray(shd.frame_trans[:8]), np.asarray(ref.frame_trans[:8]), atol=1.0
    )
    s_ref = s._replace(frame_quat=ref.frame_quat, frame_trans=ref.frame_trans,
                       point_loc=ref.point_loc)
    s_shd = s._replace(frame_quat=shd.frame_quat, frame_trans=shd.frame_trans,
                       point_loc=shd.point_loc)
    _, e_ref = lm.reproject(s_ref)
    _, e_shd = lm.reproject(s_shd)
    assert abs(float(e_ref) - float(e_shd)) < 0.1


def test_sharded_cg_matches_single_device(mesh8):
    """ba_cg.solve_sharded (the SURVEY §5 large-map scale-out: obs tables
    sharded over 'model', landmark sums + the reduced camera system psum'd
    over the axis) must match the single-device implicit-Schur CG solver
    up to f32 reduction order."""
    from slam_robot_tpu.ops import ba_cg

    scene = synthetic.build_scene(CFG, n_frames=8, n_points=30,
                                  point_noise=40.0)
    s, free, present, obs_ok = _problem(scene)
    args = (
        s.frame_quat, s.frame_trans, s.frame_cam, s.cam_k,
        s.point_loc, s.point_uncertainty,
        s.obs_frame, s.obs_point, s.obs_px, obs_ok, present, free,
    )
    cfg = ba_cg.CGConfig(max_free_frames=8)
    ref = ba_cg.solve(*args, cfg)
    shd = ba_cg.solve_sharded(mesh8, *args, cfg=cfg)
    assert bool(ref.ok) and bool(shd.ok)
    np.testing.assert_allclose(np.asarray(shd.cost), np.asarray(ref.cost),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(shd.frame_trans[:8]), np.asarray(ref.frame_trans[:8]),
        atol=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(shd.point_loc), np.asarray(ref.point_loc), atol=1.0,
    )
    # padding path: an obs count not divisible by the mesh still shards
    O = int(s.n_obs)
    odd = args[:6] + (
        s.obs_frame[: O - 3], s.obs_point[: O - 3], s.obs_px[: O - 3],
        obs_ok[: O - 3], present, free,
    )
    shd_odd = ba_cg.solve_sharded(mesh8, *odd, cfg=cfg)
    assert bool(shd_odd.ok)
    assert np.isfinite(float(shd_odd.cost))


def test_shard_map_partials_match_dense(mesh8):
    rng = np.random.default_rng(0)
    O, P_, W = 64, 10, 4
    r = jnp.asarray(rng.normal(size=(O, 2)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.1, 1.0, size=O).astype(np.float32))
    jf = jnp.asarray(rng.normal(size=(O, 2, 6)).astype(np.float32))
    jp = jnp.asarray(rng.normal(size=(O, 2, 4)).astype(np.float32))
    pidx = jnp.asarray(rng.integers(0, P_, size=O).astype(np.int32))
    slot = jnp.asarray(rng.integers(0, W, size=O).astype(np.int32))

    hff, bf, c, bp = sharded_ba.assemble_partials(
        mesh8, r, w, jf, jp, pidx, slot, P_, W
    )
    # dense reference
    hff_d = jnp.zeros((W + 1, 6, 6)).at[slot].add(
        jnp.einsum("oia,oib,o->oab", jf, jf, w))[:W]
    np.testing.assert_allclose(np.asarray(hff), np.asarray(hff_d), atol=1e-3)
    c_d = jnp.zeros((P_, 4, 4)).at[pidx].add(
        jnp.einsum("oia,oib,o->oab", jp, jp, w))
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_d), atol=1e-3)


def test_rollout_fleet():
    m = mesh_mod.make_mesh({"data": 8})
    goals = jnp.asarray(
        np.concatenate(
            [np.random.default_rng(2).uniform(2, 6, (16, 2)),
             np.zeros((16, 1))], axis=1
        ).astype(np.float32)
    )
    traj, dist = rollouts.fleet(m, goals, n_steps=400)
    assert traj.shape == (16, 400, 2)
    d = np.asarray(dist)
    assert (d < 0.5).mean() > 0.7, f"fleet reach rate low: {d}"


def test_multi_robot_shared_map():
    # two robots observing the same landmarks from different trajectories
    sc0 = synthetic.build_scene(CFG, n_frames=6, n_points=25, seed=0)
    sc1 = synthetic.build_scene(CFG, n_frames=6, n_points=25, seed=0)
    # both share the same true points; perturb the shared table
    rng = np.random.default_rng(3)
    locs = sc0.state.point_loc.at[:25, :3].add(
        jnp.asarray(rng.normal(scale=60.0, size=(25, 3)).astype(np.float32))
    )

    def stack(a, b):
        return jnp.stack([a, b])

    s0, s1 = sc0.state, sc1.state
    free0, present0 = slam.window_masks(s0, 4, 6)
    obs_ok0 = slam._obs_ok(s0, s0.n_frames - 6)
    free1, present1 = slam.window_masks(s1, 4, 6)
    obs_ok1 = slam._obs_ok(s1, s1.n_frames - 6)

    fq, ft, new_locs = multi_robot.solve_shared_map(
        stack(s0.frame_quat, s1.frame_quat),
        stack(s0.frame_trans, s1.frame_trans),
        stack(s0.frame_cam, s1.frame_cam),
        s0.cam_k,
        locs,
        s0.point_uncertainty,
        stack(s0.obs_frame, s1.obs_frame),
        stack(s0.obs_point, s1.obs_point),
        stack(s0.obs_px, s1.obs_px),
        stack(obs_ok0, obs_ok1),
        stack(present0, present1),
        stack(free0, free1),
        sweeps=8,
    )
    pos = np.asarray(new_locs[:25, :3] / new_locs[:25, 3:])
    np.testing.assert_allclose(pos, np.asarray(sc0.true_points[:, :3]), atol=10.0)
