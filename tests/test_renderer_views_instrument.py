"""Renderer views instrument: aggregation, pairing, and verdict logic.

The training runs themselves are TPU-scale (ViT-B at 224²); what CPU CI can
and should pin is the instrument's bookkeeping — that --aggregate-only pairs
seeds correctly, drops incomplete runs, and applies the written
reproduction rule mechanically.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "renderer_views_instrument.py")


def _write_run(root, arm, seed, accs):
    d = os.path.join(root, f"{arm}_seed{seed}")
    os.makedirs(d, exist_ok=True)
    rows = ["epoch,train_loss,train_accuracy,test_loss,test_accuracy"]
    rows += [f"{i+1},1.0,0.5,1.0,{a}" for i, a in enumerate(accs)]
    with open(os.path.join(d, "training_metrics.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def _aggregate(root, epochs=3):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no device needed; outage-proof
    out = subprocess.run(
        [sys.executable, SCRIPT, "--aggregate-only", "--epochs", str(epochs),
         "--out", root],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    return json.load(open(os.path.join(root, "summary.json")))


def test_aggregate_pairs_and_reproduces(tmp_path):
    root = str(tmp_path / "rvi")
    # fixed beats learned by ~2 pp on every seed → finding reproduced
    for s, (f, l) in enumerate([(0.80, 0.78), (0.82, 0.80), (0.79, 0.77)]):
        _write_run(root, "fixed", s, [0.5, 0.6, f])
        _write_run(root, "learned", s, [0.5, 0.6, l])
    summary = _aggregate(root)
    assert summary["arms"]["fixed"]["n"] == 3
    d = summary["arms"]["learned"]["paired_diff_vs_fixed"]
    assert abs(d["mean"] - (-0.02)) < 1e-9
    assert summary["arms"]["learned"]["reference_finding_reproduced"] is True


def test_aggregate_drops_incomplete_and_unpaired(tmp_path):
    root = str(tmp_path / "rvi")
    _write_run(root, "fixed", 0, [0.5, 0.6, 0.80])
    _write_run(root, "learned", 0, [0.5, 0.6, 0.78])
    _write_run(root, "fixed", 1, [0.5, 0.6, 0.82])
    _write_run(root, "learned", 1, [0.5, 0.6])  # incomplete (2 < 3 epochs)
    _write_run(root, "fixed", 2, [0.5, 0.6, 0.81])  # unpaired (no learned)
    summary = _aggregate(root)
    # every complete run is reported per arm …
    assert summary["arms"]["fixed"]["seeds"] == [0, 1, 2]
    assert summary["arms"]["fixed"]["accs"] == [0.80, 0.82, 0.81]
    # … but pairing is restricted to the seed intersection
    d = summary["arms"]["learned"]["paired_diff_vs_fixed"]
    assert d["paired_seeds"] == [0]
    assert d["n"] == 1
    # no verdict at n=1 (the rule needs a CI)
    assert "reference_finding_reproduced" not in summary["arms"]["learned"]


def test_aggregate_pairs_by_seed_not_position(tmp_path):
    """Advisor r3 medium finding: one failure per arm at *different* seeds
    must not shift pairs into misalignment."""
    root = str(tmp_path / "rvi")
    accs = {0: (0.80, 0.78), 2: (0.60, 0.90), 3: (0.82, 0.80)}
    for s, (f, l) in accs.items():
        _write_run(root, "fixed", s, [0.5, 0.5, f])
        _write_run(root, "learned", s, [0.5, 0.5, l])
    # fixed missing seed 2, learned missing seed 3: positional zip would
    # pair fixed(0,3) with learned(0,2) — seed-keyed pairing keeps only 0
    os.remove(os.path.join(root, "fixed_seed2", "training_metrics.csv"))
    os.remove(os.path.join(root, "learned_seed3", "training_metrics.csv"))
    summary = _aggregate(root)
    d = summary["arms"]["learned"]["paired_diff_vs_fixed"]
    assert d["paired_seeds"] == [0]
    assert abs(d["mean"] - (-0.02)) < 1e-9


def test_negative_control_verdict(tmp_path):
    """neg_* arms get a power verdict (regression detected), never the
    reproduction key — and a non-regressing control reports False."""
    root = str(tmp_path / "rvi")
    for s, (f, l, n1) in enumerate(
            [(0.80, 0.78, 0.60), (0.82, 0.80, 0.62), (0.79, 0.77, 0.58)]):
        _write_run(root, "fixed", s, [0.5, 0.6, f])
        _write_run(root, "learned", s, [0.5, 0.6, l])
        _write_run(root, "neg_views1", s, [0.5, 0.5, n1])
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, SCRIPT, "--aggregate-only", "--epochs", "3",
         "--arms", "fixed,learned,neg_views1", "--out", root],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    summary = json.load(open(os.path.join(root, "summary.json")))
    neg = summary["arms"]["neg_views1"]
    assert neg["negative_control_regresses"] is True
    assert "reference_finding_reproduced" not in neg
    assert summary["arms"]["learned"]["reference_finding_reproduced"] is True

    # a control that does NOT regress must report False (instrument has no
    # power) — overwrite the neg runs at fixed-level accuracy
    for s in range(3):
        _write_run(root, "neg_views1", s, [0.5, 0.5, 0.81])
    out = subprocess.run(
        [sys.executable, SCRIPT, "--aggregate-only", "--epochs", "3",
         "--arms", "fixed,learned,neg_views1", "--out", root],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    summary = json.load(open(os.path.join(root, "summary.json")))
    assert summary["arms"]["neg_views1"]["negative_control_regresses"] is False


def test_desat_choice_rule():
    """The declared rung-choice rule: first in-band rung wins; otherwise
    the rung closest to the band (r5 de-saturation, judge r4 weak #2)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib
    rvi = importlib.import_module("renderer_views_instrument")

    # first in-band rung wins even if a later one is more central
    calib = [
        {"train": 1024, "noise": 0.25, "fixed_acc": 0.95},
        {"train": 512, "noise": 0.35, "fixed_acc": 0.89},
        {"train": 512, "noise": 0.45, "fixed_acc": 0.80},
    ]
    assert rvi.desat_choice(calib) == {"train": 512, "noise": 0.35}
    # none in band → closest to the band boundary
    calib = [
        {"train": 1024, "noise": 0.25, "fixed_acc": 0.97},
        {"train": 512, "noise": 0.35, "fixed_acc": 0.93},
        {"train": 256, "noise": 0.45, "fixed_acc": 0.55},
    ]
    assert rvi.desat_choice(calib) == {"train": 512, "noise": 0.35}


def test_aggregate_refutes_when_learned_wins(tmp_path):
    root = str(tmp_path / "rvi")
    for s in range(3):
        _write_run(root, "fixed", s, [0.5, 0.6, 0.70])
        _write_run(root, "learned", s, [0.5, 0.6, 0.80])  # +10 pp
    summary = _aggregate(root)
    assert summary["arms"]["learned"]["reference_finding_reproduced"] is False
