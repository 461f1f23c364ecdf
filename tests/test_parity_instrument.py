"""Parity-instrument bookkeeping: seed-keyed aggregation and the accept rule.

The instrument's training runs are TPU-scale; what CPU CI pins is the
adjudication machinery that sets bench.py's default — --aggregate-only must
pair by seed (advisor r3: positional zip could misalign), drop truncated
runs, and apply the written ACCEPT rule (mean ≥ −1 pp AND CI floor ≥ −3 pp)
mechanically.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "parity_instrument.py")


def _write_run(root, arm, seed, accs):
    d = os.path.join(root, f"{arm}_seed{seed}")
    os.makedirs(d, exist_ok=True)
    rows = ["epoch,train_loss,train_accuracy,test_loss,test_accuracy"]
    rows += [f"{i+1},1.0,0.5,1.0,{a}" for i, a in enumerate(accs)]
    with open(os.path.join(d, "training_metrics.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def _aggregate(root, arms, epochs=3):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, SCRIPT, "--aggregate-only", "--epochs", str(epochs),
         "--arms", arms, "--out", root],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    return json.load(open(os.path.join(root, "summary.json")))


def test_accept_rule_applied_mechanically(tmp_path):
    root = str(tmp_path / "pi")
    # good: +1 pp on every seed → ACCEPT. bad: −8 pp on every seed → REJECT.
    for s, e in enumerate([0.74, 0.72, 0.75, 0.73]):
        _write_run(root, "exact", s, [0.5, 0.6, e])
        _write_run(root, "good", s, [0.5, 0.6, e + 0.01])
        _write_run(root, "bad", s, [0.5, 0.6, e - 0.08])
    summary = _aggregate(root, "exact,good,bad")
    assert summary["arms"]["good"]["accepted"] is True
    assert summary["arms"]["bad"]["accepted"] is False
    assert summary["arms"]["good"]["paired_diff_vs_exact"]["paired_seeds"] == [0, 1, 2, 3]


def test_truncated_run_excluded_and_pairing_by_seed(tmp_path):
    root = str(tmp_path / "pi")
    for s, e in enumerate([0.74, 0.72, 0.75, 0.73]):
        _write_run(root, "exact", s, [0.5, 0.6, e])
        _write_run(root, "arm", s, [0.5, 0.6, e + 0.01])
    # truncate arm seed 1 (crashed mid-run) and drop exact seed 2 entirely:
    # positional pairing would mispair arm(0,2,3) with exact(0,1,3)
    _write_run(root, "arm", 1, [0.5, 0.6])
    os.remove(os.path.join(root, "exact_seed2", "training_metrics.csv"))
    summary = _aggregate(root, "exact,arm")
    d = summary["arms"]["arm"]["paired_diff_vs_exact"]
    assert d["paired_seeds"] == [0, 3]
    assert abs(d["mean"] - 0.01) < 1e-9
    # all complete runs still reported per arm
    assert summary["arms"]["arm"]["seeds"] == [0, 2, 3]
    assert summary["arms"]["exact"]["seeds"] == [0, 1, 3]


def test_single_pair_yields_no_verdict(tmp_path):
    root = str(tmp_path / "pi")
    _write_run(root, "exact", 0, [0.5, 0.6, 0.74])
    _write_run(root, "arm", 0, [0.5, 0.6, 0.75])
    summary = _aggregate(root, "exact,arm")
    assert "accepted" not in summary["arms"]["arm"]
    assert summary["arms"]["arm"]["paired_diff_vs_exact"]["n"] == 1
