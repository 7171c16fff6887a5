"""Map dumps in the reference's /tmp/z gnuplot format (main.cpp:47-73):
even-camera frame positions, blank line, odd-camera frame positions, blank
line, then slam-usable point positions (norm < 4000) as isolated pairs."""

from __future__ import annotations

import numpy as np

from slam_robot_tpu.models import localmap as lm


def dump_map(state: lm.MapState, path: str) -> None:
    n_frames = int(state.n_frames)
    trans = np.asarray(state.frame_trans[:n_frames])
    with open(path, "w") as out:
        for parity in (0, 1):
            for fid in range(n_frames):
                if (fid & 1) != parity:
                    continue
                p = trans[fid]
                out.write(f"{p[0]:f}  {p[1]:f}  {p[2]:f}\n")
            out.write("\n")
        usable = np.asarray(lm.slam_usable(state.point_flags) & state.point_mask)
        pos = np.asarray(state.point_position())
        for i in range(int(state.n_points)):
            if not usable[i]:
                continue
            if np.linalg.norm(pos[i]) > 4000:
                continue
            out.write(f"{pos[i,0]:f} {pos[i,1]:f} {pos[i,2]:f}\n\n")


def trajectory(state: lm.MapState) -> np.ndarray:
    """[N,3] frame positions (for ATE comparisons)."""
    return np.asarray(state.frame_trans[: int(state.n_frames)])


def ate(traj_a: np.ndarray, traj_b: np.ndarray) -> float:
    """Absolute trajectory error (RMSE of positions, no alignment — both
    trajectories are already anchored by Normalize)."""
    n = min(len(traj_a), len(traj_b))
    d = traj_a[:n] - traj_b[:n]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))
