"""Trajectory parity gate: the frozen sequence must replay within the ATE
gate of the committed golden fixture (tools/parity.py; the C++ reference is
unbuildable in this container, so the golden trajectory stands in — see the
tools/parity.py docstring). Also enforces the north star's 'ATE within 1%'
against ground truth."""

import json
import os

import numpy as np


def test_golden_trajectory_parity():
    from tools import parity
    from slam_robot_tpu.utils import dump as dump_util

    est, true = parity.run_sequence()

    with open(parity.GOLDEN) as f:
        golden = json.load(f)
    assert golden["sequence"] == parity.SEQ, "fixture/sequence mismatch"
    gold = np.asarray(golden["trajectory"], np.float32)

    ate_golden = dump_util.ate(est, gold)
    assert ate_golden <= 3.0, f"trajectory drifted {ate_golden:.2f}mm vs golden"

    ate_true = dump_util.ate(est, true)
    path = float(np.linalg.norm(true[-1] - true[0]))
    assert ate_true / path <= 0.01, (
        f"ATE {ate_true:.2f}mm is {100*ate_true/path:.2f}% of path (>1%)"
    )
