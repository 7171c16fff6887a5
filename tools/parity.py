"""Reference-parity trajectory harness.

The north star is "trajectory ATE within 1% of the C++ reference on
recorded sequences" (BASELINE.md). The reference's own integration method
is record/replay (main.cpp:371-398 + video.h:24-38): record a sequence,
replay it deterministically, compare trajectories.

**Why the C++ side is not run here:** the reference needs Ceres 1.8 (it
vendors only the include path, Makefile:7-8), Eigen, glog, gflags, CHOLMOD
and OpenCV 2-era APIs. This container has OpenCV 4 only — no Ceres, no
Eigen headers, no glog/gflags/cholmod (verified: `ldconfig -p | grep
ceres` empty, `/usr/include/eigen3` absent) — and package installation is
unavailable (zero egress). The harness therefore gates on a **pinned
golden trajectory**: a frozen deterministic sequence (fixed seed, fixed
config) replayed through the full pipeline, compared against the committed
fixture `tests/fixtures/golden_trajectory.json`. Any change that moves the
trajectory by more than the gate shows up as ATE drift; when a built
reference becomes available, point --golden at a dump of its /tmp/z
trajectory instead (utils/dump.py reads/writes that format).

Usage:
    python tools/parity.py                 # replay + compare, print JSON
    python tools/parity.py --regen         # regenerate the golden fixture
    python tools/parity.py --out ate.json  # also write the JSON artifact

CI gate: tests/test_parity.py runs the same comparison.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures",
    "golden_trajectory.json",
)

# the frozen sequence: deterministic synthetic replay (seed + config pinned)
SEQ = dict(n_frames=24, seed=7, n_points=700, step_mm=15.0, yaw_rate=0.004)
CFG_KW = dict(
    image_width=320, image_height=240, pyramid_depth=5, levels_unsure=5,
    max_features=192, max_corners=96, min_matches=20, max_frames=32,
    max_points=512, max_obs=8192, max_obs_per_point=16,
    # reference-exact retry semantics: every stored view of every failing
    # feature re-attempted every frame (matcher.cpp:221-248); the
    # production default rate-limits stragglers (find_fail_backoff=4),
    # which is a deliberate deviation the golden must not absorb
    find_fail_backoff=1,
    # ... likewise: the full per-frame retry walk and the symmetric
    # backward cascade, not the rate-limited production defaults
    retry_mode="ladder",
    roundtrip_levels=0,
    find_fail_give_up=0,
    find_fail_backoff_deep=1,
    bwd_ref_from_window=False,
    bwd_window_cache=False,
    adaptive_fwd_px=0.0,
    track_iters_coarse=0,
)


def run_sequence():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from slam_robot_tpu.config import SlamConfig
    from slam_robot_tpu.io import sources
    from slam_robot_tpu.models import pipeline
    from slam_robot_tpu.utils import dump as dump_util

    cfg = SlamConfig(**CFG_KW)
    src = sources.SyntheticSource(cfg, **SEQ)
    ps = pipeline.init(cfg, [jnp.asarray(src.k)] * 2)
    for i in range(SEQ["n_frames"]):
        ps, _ = pipeline.step(ps, jnp.asarray(src.get(i % 2, i)), cfg)
    est = dump_util.trajectory(ps.map)
    true = np.asarray(src.true_trans[: SEQ["n_frames"]])
    return est, true


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true",
                    help="regenerate the golden fixture from this build")
    ap.add_argument("--golden", default=GOLDEN)
    ap.add_argument("--out", default="", help="write the JSON ATE artifact")
    ap.add_argument("--gate-mm", type=float, default=3.0,
                    help="max ATE vs golden (mm) before failing")
    args = ap.parse_args(argv)

    import numpy as np

    from slam_robot_tpu.utils import dump as dump_util

    est, true = run_sequence()

    if args.regen:
        os.makedirs(os.path.dirname(args.golden), exist_ok=True)
        with open(args.golden, "w") as f:
            json.dump(
                {"sequence": SEQ, "config": CFG_KW,
                 "trajectory": est.tolist()}, f, indent=1,
            )
        print(f"golden fixture written: {args.golden} ({len(est)} poses)")
        return 0

    with open(args.golden) as f:
        golden = json.load(f)
    gold = np.asarray(golden["trajectory"], np.float32)

    ate_golden = dump_util.ate(est, gold)
    ate_true = dump_util.ate(est, true)
    path = float(np.linalg.norm(true[-1] - true[0]))
    report = {
        "ate_vs_golden_mm": round(ate_golden, 3),
        "ate_vs_ground_truth_mm": round(ate_true, 3),
        "ate_pct_of_path": round(100.0 * ate_true / path, 3),
        "path_mm": round(path, 1),
        "frames": len(est),
        "gate_mm": args.gate_mm,
        "ok": bool(ate_golden <= args.gate_mm),
        "reference_cpp": "unbuildable here: no ceres/eigen/glog/gflags/"
                         "cholmod and zero egress; golden fixture gates "
                         "drift instead (see module docstring)",
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
