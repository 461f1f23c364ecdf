"""Bench-default adjudication: the written rule, applied mechanically."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "adjudicate_bench_default.py")

sys.path.insert(0, REPO)
from scripts.adjudicate_bench_default import decide, load_throughput  # noqa: E402


def _summary(**accepted):
    return {"arms": {a: {"accepted": v} for a, v in accepted.items()}}


def test_fastest_accepted_measured_wins():
    d = decide(
        _summary(slim=True, v2=True, k24=False, neg_k8=False),
        {"exact": {"clouds_per_sec": 2100.0},
         "slim": {"clouds_per_sec": 2520.0},
         "v2": {"clouds_per_sec": 2980.0},
         "k24": {"clouds_per_sec": 3500.0}},  # rejected — must be ignored
    )
    assert d["choice"] == "v2"
    assert "k24" not in d["measured"]


def test_negative_control_acceptance_discredits():
    d = decide(
        _summary(slim=True, v2=True, neg_k8=True),
        {"v2": {"clouds_per_sec": 2980.0}},
    )
    assert d["choice"] == "exact"
    assert "discredited" in d["reason"]


def test_negative_control_missing_blocks_acceptances():
    """Advisor r3: an absent neg_k8 entry must not pass the rail — the
    instrument's power is unverified, so the default reverts to exact."""
    d = decide(
        _summary(slim=True, v2=True),  # no neg_k8 arm at all
        {"v2": {"clouds_per_sec": 2980.0},
         "exact": {"clouds_per_sec": 2100.0}},
    )
    assert d["choice"] == "exact"
    assert "missing or unverdicted" in d["reason"]


def test_negative_control_unverdicted_blocks_acceptances():
    # neg_k8 ran but has no verdict (e.g. <2 paired seeds)
    d = decide(
        {"arms": {"slim": {"accepted": True}, "neg_k8": {"n": 1}}},
        {"slim": {"clouds_per_sec": 2520.0}},
    )
    assert d["choice"] == "exact"


def test_unmeasured_arms_keep_current_default():
    d = decide(_summary(slim=True, neg_k8=False), {})
    assert d["choice"] is None


def test_exact_always_admissible():
    d = decide(
        _summary(slim=False, neg_k8=False),
        {"exact": {"clouds_per_sec": 2100.0},
         "slim": {"clouds_per_sec": 2500.0}},
    )
    assert d["choice"] == "exact"


def test_load_throughput_trailing_json(tmp_path):
    p = tmp_path / "out.txt"
    p.write_text(
        "exact    : 2106.6 clouds/s (compile 60.1s)\n"
        "slim     : 2521.6 clouds/s (compile 58.0s)\n"
        '{\n "exact": {"clouds_per_sec": 2106.6},\n'
        ' "slim": {"clouds_per_sec": 2521.6}\n}\n'
    )
    t = load_throughput(str(p))
    assert t["slim"]["clouds_per_sec"] == 2521.6


def test_apply_rewrites_bench(tmp_path):
    bench = tmp_path / "bench.py"
    bench.write_text('x = 1\n    DEFAULT_PRESET = "slim"\ny = 2\n')
    summary = tmp_path / "summary.json"
    summary.write_text(json.dumps(_summary(v2=True, neg_k8=False)))
    thr = tmp_path / "thr.txt"
    thr.write_text('{"v2": {"clouds_per_sec": 2980.0}}')
    env = {**os.environ}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, SCRIPT, "--summary", str(summary), "--throughput",
         str(thr), "--bench", str(bench), "--apply"],
        capture_output=True, text=True, cwd=REPO, timeout=120, env=env,
    )
    assert out.returncode == 0, out.stderr
    assert 'DEFAULT_PRESET = "v2"' in bench.read_text()
    assert os.path.exists(tmp_path / "bench_default_decision.json")
