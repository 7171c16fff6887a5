"""Bundle-adjustment windows over the map (slam.{h,cpp} rebuilt).

- ``solve_frames(map, S, P)``: sliding window — newest S frames free, next
  P-S presented-but-const (slam.cpp:417-443); cameras always const
- ``solve_all_frames``: every frame free; optionally solve camera
  intrinsics with the CameraStabilization regularizer (slam.cpp:447-480)
- ``reproject`` lives on the map (models/localmap.reproject)
- ``solve_frame_pose``: the reference's 2-frame epipolar pose solver is
  dead code (unconditional ``return false`` at slam.cpp:182 before any
  work); we expose the same no-op contract by default and keep the
  intended behavior available through full BA windows instead

Cumulative iteration/error counters (slam.h:48-49) are returned in the
result for the caller's metrics instead of hidden mutable state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_robot_tpu.config import SlamConfig
from slam_robot_tpu.models import localmap as lm
from slam_robot_tpu.ops import ba


def _ba_cfg(cfg: SlamConfig, range_: float, solve_cameras: bool = False,
            fine: bool = False) -> ba.BAConfig:
    return ba.BAConfig(
        range=range_,
        max_iters=cfg.ba_max_iters,
        ftol=cfg.ba_ftol_fine if fine else cfg.ba_ftol,
        baseline=cfg.baseline_mm,
        frame_dist_weight=cfg.frame_dist_weight,
        frame_dist_loss=cfg.frame_dist_loss,
        uncertainty_free=cfg.uncertainty_confident,
        lm_lambda_init=cfg.lm_lambda_init,
        lm_lambda_up=cfg.lm_lambda_up,
        lm_lambda_down=cfg.lm_lambda_down,
        max_free_frames=16,
        cheirality_eps=cfg.cheirality_eps,
        solve_cameras=solve_cameras,
        camera_loss=cfg.camera_loss,
        stab_focal=cfg.focal,
        stab_cx=cfg.cx,
        stab_cy=cfg.cy,
    )


def window_masks(state: lm.MapState, num_to_solve: int, num_to_present: int):
    """Newest ``num_to_solve`` frames free, next presented const
    (slam.cpp:425-434)."""
    idx = jnp.arange(state.frame_quat.shape[0])
    age = state.n_frames - 1 - idx
    free = (age >= 0) & (age < num_to_solve)
    present = (age >= 0) & (age < num_to_present)
    return free, present


def _obs_ok(state: lm.MapState, present):
    """Participating observations: enabled, of slam-usable points, in a
    presented frame (slam.cpp:279-299)."""
    usable = lm.slam_usable(state.point_flags)
    return (
        state.obs_mask
        & ~state.obs_disabled
        & usable[state.obs_point.clip(0)]
        & present[state.obs_frame.clip(0)]
        & (state.obs_point >= 0)
    )


def _run(state: lm.MapState, free, present, bcfg: ba.BAConfig,
         window_obs: int | None = None):
    obs_frame, obs_point, obs_px = state.obs_frame, state.obs_point, state.obs_px
    obs_ok = _obs_ok(state, present)
    if window_obs is not None and window_obs < state.obs_frame.shape[0]:
        # The obs table is append-ordered by frame, so every observation of
        # the presented (= newest) frames lives in the table's tail. Slice a
        # fixed-size tail window: same solution, a fraction of the per-LM-
        # iteration residual/Jacobian work.
        start = jnp.maximum(state.n_obs - window_obs, 0)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, window_obs, 0)
        obs_frame, obs_point, obs_px, obs_ok = (
            sl(obs_frame), sl(obs_point), sl(obs_px), sl(obs_ok),
        )
    res = ba.solve(
        state.frame_quat,
        state.frame_trans,
        state.frame_cam,
        state.cam_k,
        state.point_loc,
        state.point_uncertainty,
        obs_frame,
        obs_point,
        obs_px,
        obs_ok,
        present,
        free,
        bcfg,
    )
    new_state = state._replace(
        frame_quat=res.frame_quat,
        frame_trans=res.frame_trans,
        point_loc=res.point_loc,
        cam_k=res.cam_k,
    )
    return new_state, res


def solve_frames(state: lm.MapState, num_to_solve: int, num_to_present: int,
                 range_: float = 2.0, cfg: SlamConfig | None = None):
    """Slam::SolveFrames: solve the newest ``num_to_solve`` frame poses (and
    the points they see) against ``num_to_present`` presented frames.
    Returns (state, BAResult)."""
    cfg = cfg or SlamConfig()
    free, present = window_masks(state, num_to_solve, num_to_present)
    return _run(state, free, present, _ba_cfg(cfg, range_),
                window_obs=cfg.window_obs)


def solve_all_frames(state: lm.MapState, range_: float = 2.0,
                     solve_cameras: bool = False,
                     cfg: SlamConfig | None = None):
    """Slam::SolveAllFrames: every frame free; optionally also the camera
    intrinsics (with stabilization residuals)."""
    cfg = cfg or SlamConfig()
    present = state.frame_mask
    free = present
    bcfg = _ba_cfg(cfg, range_, solve_cameras=solve_cameras, fine=solve_cameras)
    # full solves need slots for every frame
    bcfg = bcfg._replace(max_free_frames=int(state.frame_quat.shape[0]))
    return _run(state, free, present, bcfg)


def solve_frame_pose(state: lm.MapState, *_args, **_kw):
    """Slam::SolveFramePose parity: the reference short-circuits to false
    (slam.cpp:177-182), so the matcher's mid-frame re-solve never fires.
    Kept as an explicit no-op for API completeness."""
    return state, False
