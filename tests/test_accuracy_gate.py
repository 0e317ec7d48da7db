"""Accuracy acceptance gate (VERDICT r3 item 7): the on-mesh accuracy
report must FAIL, not just report, when the replay error regresses past
the committed thresholds (2x the round-3 artifact values)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from accuracy_report import (  # noqa: E402
    NORMAL_ANGLE_GATE,
    REL_L2_GATE,
    check_gates,
)


def test_gate_passes_at_round3_values():
    gates = check_gates(3.071e-3, 0.0989)       # BENCH_accuracy_r03
    assert gates["gate_passed"] is True
    assert gates["rel_l2_gate"] == REL_L2_GATE
    assert gates["normal_angle_gate_rad"] == NORMAL_ANGLE_GATE


def test_gate_fails_on_rel_l2_regression():
    with pytest.raises(AssertionError, match="rel-L2"):
        check_gates(2.1 * REL_L2_GATE, 0.05)


def test_gate_fails_on_normal_angle_regression():
    with pytest.raises(AssertionError, match="normal angle"):
        check_gates(1e-3, 1.5 * NORMAL_ANGLE_GATE)


def test_gates_are_twice_the_committed_round3_artifact():
    # the gate definition is part of the contract: 2x r03, not drifting
    assert REL_L2_GATE == pytest.approx(2 * 3.071e-3, rel=0.02)
    assert NORMAL_ANGLE_GATE == pytest.approx(2 * 0.0989, rel=0.02)
