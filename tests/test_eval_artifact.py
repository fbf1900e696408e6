"""Re-assert the committed EVAL artifact's gates.

tools/run_eval.py runs the full 640x480 accuracy suite (System path +
chunked real-time path on identical frames) and writes EVAL_r*.json; this
test reads the NEWEST committed artifact and fails if any gate it claims
to pass no longer holds internally — i.e. the recorded numbers must be
consistent with the recorded pass booleans, and the suite-level gates
(static 0.03 m / dynamic 0.05 m ATE, parity floor) must actually be met
by every non-stress row. This keeps the headline artifact honest: CI
fails if someone regenerates it with regressed numbers (the reference has
no tests at all, SURVEY.md §4 — the artifact IS its evidence tier).
"""

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_eval():
    paths = glob.glob(os.path.join(ROOT, "EVAL_r*.json"))
    if not paths:
        pytest.skip("no EVAL_r*.json artifact committed")
    def round_no(p):
        m = re.search(r"EVAL_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    return max(paths, key=round_no)


def test_eval_artifact_gates():
    path = _newest_eval()
    with open(path) as f:
        art = json.load(f)
    assert art.get("all_pass") is True, f"{path}: all_pass is not true"
    gates = art["gates"]
    static_gate = float(gates["static_ate_m"])
    dynamic_gate = float(gates["dynamic_ate_m"])
    assert static_gate <= 0.03 + 1e-9, "static gate looser than 0.03 m"
    assert dynamic_gate <= 0.05 + 1e-9, "dynamic gate looser than 0.05 m"
    seqs = art["sequences"]
    assert len(seqs) >= 7, "suite shrank below seven sequences"
    kinds = {row["kind"] for row in seqs.values()}
    assert {"dynamic", "static", "stereo"} <= kinds, \
        "suite must cover static, dynamic, AND stereo modes"
    for name, row in seqs.items():
        a = float(row["system"]["ate"])
        b = float(row["chunked"]["ate"])
        gate = float(row["gate_ate_m"])
        assert row["pass"] is True, f"{name}: row not passing"
        assert a <= gate, f"{name}: system ATE {a} exceeds gate {gate}"
        # EVERY row gates the chunked path too — the r4 stress exemption
        # is gone (the multi-lap convergence gap was fixed in r5)
        assert b <= gate, f"{name}: chunked ATE {b} exceeds gate {gate}"
        assert abs(a - b) <= max(0.2 * max(a, b), 0.01) + 1e-9, \
            f"{name}: System/chunked parity broken (|{a}-{b}|)"
        if row.get("stress"):
            # stress rows must additionally stay lossless in real time
            assert row["chunked"].get("lost_frames", 0) == 0, \
                f"{name}: chunked path lost frames on the stress row"


def test_eval_artifact_difficulty_class():
    """The dynamic rows must certify reference-class difficulty: real
    occlusion (walkers covering a large image fraction), not token
    sprites (fr3/walking_* analogue, README.md lines 5-9)."""
    path = _newest_eval()
    with open(path) as f:
        art = json.load(f)
    assert art.get("resolution") == "640x480"
    dyn = [r for r in art["sequences"].values() if r["kind"] == "dynamic"]
    assert dyn, "no dynamic sequences in the artifact"
    for row in dyn:
        assert row.get("max_person_coverage", 0) >= 0.3, \
            "dynamic row without substantial occlusion"
