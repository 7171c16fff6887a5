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
unavailable (zero egress). The harness therefore gates on **pinned golden
trajectories**: frozen deterministic sequences (fixed seed, fixed config)
replayed through the full pipeline, compared against committed fixtures in
tests/fixtures/. Any change that moves a trajectory beyond its gate shows
up as ATE drift; when a built reference becomes available, point --golden
at a dump of its /tmp/z trajectory instead (utils/dump.py reads/writes
that format).

Sequences (VERDICT r2 item 5 — the regimes where cadence-sensitive caches
bite):
  forward_yaw          24f 320x240, gentle forward+yaw (the original golden)
  rotation_heavy       40f 640x480 (production res), 5x yaw rate: stored
                       views age fast, retry ladder and keyframe cadence
                       dominate
  long_forward         100f 320x240: long-horizon windowed-BA drift
  production_defaults  the rotation_heavy sequence under the config users
                       actually run (production deviations ON) — the
                       shipped defaults get their own accuracy gate

Gates scale with path length: max(1.5 mm, 1% of path) per sequence, so a
short path cannot hide a >1% regression behind an absolute gate.

Usage:
    python tools/parity.py                  # replay all + compare, JSON
    python tools/parity.py --seq rotation_heavy
    python tools/parity.py --regen          # regenerate golden fixtures
    python tools/parity.py --out PARITY.json

CI gate: tests/test_parity.py runs the same comparisons.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

# reference-exact semantics come from the SINGLE shared pin list
# (config.REFERENCE_EXACT_KW) so production deviations and the goldens'
# pins cannot drift apart; only capacities/resolution are set per sequence
from slam_robot_tpu.config import REFERENCE_EXACT_KW  # noqa: E402

_SMALL = dict(
    image_width=320, image_height=240, pyramid_depth=5, levels_unsure=5,
    max_features=192, max_corners=96, min_matches=20,
    max_points=512, max_obs=8192, max_obs_per_point=16,
)

SEQUENCES = {
    "forward_yaw": dict(
        seq=dict(n_frames=24, seed=7, n_points=700, step_mm=15.0,
                 yaw_rate=0.004),
        cfg=dict(_SMALL, max_frames=32, **REFERENCE_EXACT_KW),
        golden="golden_trajectory.json",
        truth_pct=1.0,
    ),
    "rotation_heavy": dict(
        # production resolution; ~0.57 deg/frame-pair yaw — stored views
        # age out of appearance fast, exercising the retry ladder, the
        # backward caches' margins and the keyframe cadence
        seq=dict(n_frames=40, seed=11, n_points=1400, step_mm=4.0,
                 yaw_rate=0.02),
        cfg=dict(max_frames=64, **REFERENCE_EXACT_KW),
        golden="golden_rotation.json",
        # rotation-dominant motion is low-parallax (weak triangulation);
        # the windowed solver genuinely drifts more here (measured 1.7%)
        truth_pct=2.5,
    ),
    "long_forward": dict(
        # 100 frames: long-horizon windowed-BA drift accumulation
        seq=dict(n_frames=100, seed=3, n_points=900, step_mm=12.0,
                 yaw_rate=0.006),
        cfg=dict(_SMALL, max_frames=128, **REFERENCE_EXACT_KW),
        golden="golden_long.json",
        truth_pct=1.0,
    ),
    "production_defaults": dict(
        # SAME rendered sequence as rotation_heavy under the SHIPPED
        # defaults (backoff, give-up, window caches all ON): the config
        # users run is CI-guarded, not just the reference-exact one
        seq=dict(n_frames=40, seed=11, n_points=1400, step_mm=4.0,
                 yaw_rate=0.02),
        cfg=dict(max_frames=64),
        golden="golden_production.json",
        truth_pct=2.5,
    ),
}

# legacy single-sequence aliases (tests/test_parity.py pre-r3 API)
SEQ = SEQUENCES["forward_yaw"]["seq"]
CFG_KW = SEQUENCES["forward_yaw"]["cfg"]
GOLDEN = os.path.join(FIXTURES, SEQUENCES["forward_yaw"]["golden"])


def run_sequence(name: str = "forward_yaw"):
    # EXACTLY the test env (tests/conftest.py): the 8-virtual-device flag
    # changes XLA:CPU compilation enough that a trajectory replayed with it
    # drifts ~2 mm from one generated without it on the cadence-chaotic
    # rotation sequence (each env is internally deterministic). Goldens
    # must be generated under the env that replays them.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np

    from slam_robot_tpu.config import SlamConfig
    from slam_robot_tpu.io import sources
    from slam_robot_tpu.models import pipeline
    from slam_robot_tpu.utils import dump as dump_util

    spec = SEQUENCES[name]
    cfg = SlamConfig(**spec["cfg"])
    src = sources.SyntheticSource(cfg, **spec["seq"])
    ps = pipeline.init(cfg, [jnp.asarray(src.k)] * 2)
    for i in range(spec["seq"]["n_frames"]):
        ps, _ = pipeline.step(ps, jnp.asarray(src.get(i % 2, i)), cfg)
        ps = pipeline.maybe_polish(ps, i, cfg)
    est = dump_util.trajectory(ps.map)
    true = np.asarray(src.true_trans[: spec["seq"]["n_frames"]])
    return est, true


def gate_mm(path_mm: float) -> float:
    """Drift gate: 1% of path, floored at 1.5 mm for very short paths."""
    return max(1.5, 0.01 * path_mm)


def compare(name: str, est, true):
    import numpy as np

    from slam_robot_tpu.utils import dump as dump_util

    spec = SEQUENCES[name]
    with open(os.path.join(FIXTURES, spec["golden"])) as f:
        golden = json.load(f)
    assert golden["sequence"] == spec["seq"], f"{name}: fixture mismatch"
    gold = np.asarray(golden["trajectory"], np.float32)

    ate_golden = dump_util.ate(est, gold)
    ate_true = dump_util.ate(est, true)
    path = float(np.linalg.norm(true[-1] - true[0]))
    g = gate_mm(path)
    return {
        "sequence": name,
        "ate_vs_golden_mm": round(ate_golden, 3),
        "ate_vs_ground_truth_mm": round(ate_true, 3),
        "ate_pct_of_path": round(100.0 * ate_true / path, 3),
        "path_mm": round(path, 1),
        "gate_mm": round(g, 2),
        "truth_gate_pct": spec.get("truth_pct", 1.0),
        "ok": bool(ate_golden <= g),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true",
                    help="regenerate the golden fixtures from this build")
    ap.add_argument("--seq", default="",
                    help="comma-separated sequence names (default: all)")
    ap.add_argument("--out", default="", help="write the JSON ATE artifact")
    args = ap.parse_args(argv)

    import numpy as np

    names = args.seq.split(",") if args.seq else list(SEQUENCES)
    reports = []
    for name in names:
        est, true = run_sequence(name)
        if args.regen:
            spec = SEQUENCES[name]
            path = os.path.join(FIXTURES, spec["golden"])
            os.makedirs(FIXTURES, exist_ok=True)
            with open(path, "w") as f:
                json.dump(
                    {"sequence": spec["seq"], "config": spec["cfg"],
                     "trajectory": est.tolist()}, f, indent=1,
                )
            p = float(np.linalg.norm(true[-1] - true[0]))
            from slam_robot_tpu.utils import dump as dump_util

            print(f"golden written: {path} ({len(est)} poses, "
                  f"path {p:.0f} mm, "
                  f"ATE vs truth {dump_util.ate(est, true):.2f} mm)",
                  flush=True)
            continue
        rep = compare(name, est, true)
        reports.append(rep)
        print(json.dumps(rep), flush=True)

    if args.regen:
        return 0
    report = {
        "sequences": reports,
        "ok": all(r["ok"] for r in reports),
        "reference_cpp": "unbuildable here: no ceres/eigen/glog/gflags/"
                         "cholmod and zero egress; golden fixtures gate "
                         "drift instead (see module docstring)",
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
