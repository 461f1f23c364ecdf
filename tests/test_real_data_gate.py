"""Pins scripts/real_data_gate.py's detection/skip path so the one-command
gate is known-good the day real ScanObjectNN drops + pretrained weights land
(docs/RUNBOOK_real_data.md)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "scripts", "real_data_gate.py")


def _run(args, **kw):
    env = dict(os.environ)
    env.pop("POINTVIT_WEIGHTS", None)
    # CPU-only subprocess: drop the axon pool var, or sitecustomize dials the
    # TPU relay at interpreter startup and, during a tunnel outage, can spin
    # in its connect-retry loop forever before the gate even starts
    # (CLAUDE.md "Environment gotchas").
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(kw.pop("env", {}))
    return subprocess.run(
        [sys.executable, GATE, *args],
        capture_output=True, text=True, env=env, cwd=REPO, **kw,
    )


def test_skip_path_exits_zero_and_lists_missing(tmp_path):
    r = _run(["--root", str(tmp_path / "nope")])
    assert r.returncode == 0, r.stderr
    assert "SKIP" in r.stdout
    assert "main_split/training_objectdataset.h5" in r.stdout
    assert "vit_base_patch16_224" in r.stdout


def _make_drops(tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from pointvit_tpu.data.synthetic import write_scanobjectnn_h5

    root = str(tmp_path / "h5_files")
    for variant, aug, bg in (
        ("main_split", "base", True),
        ("main_split", "augmentedrot_scale75", True),
        ("main_split", "base", False),
    ):
        write_scanobjectnn_h5(
            root, variant=variant, augmentation=aug, background=bg,
            num_train=4, num_test=2, num_points=64,
        )
    weights = tmp_path / "weights"
    weights.mkdir()
    for stem in ("vit_base_patch16_224", "vit_small_patch16_384", "vit_b_16"):
        (weights / f"{stem}.npz").write_bytes(b"")
    return root, str(weights)


def test_detect_reports_ready_when_drops_present(tmp_path):
    root, weights = _make_drops(tmp_path)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import real_data_gate
    finally:
        sys.path.pop(0)
    assert real_data_gate.detect(root, weights) == []
    # And partial drops name exactly the absent pieces.
    missing = real_data_gate.detect(root, None)
    assert missing and all(m.startswith("weights:") for m in missing)


def test_check_only_subprocess_with_full_drops(tmp_path):
    root, weights = _make_drops(tmp_path)
    r = _run(["--root", root, "--check-only"], env={"POINTVIT_WEIGHTS": weights})
    assert r.returncode == 0, r.stderr + r.stdout
    assert "all drops present" in r.stdout


def test_smoke_rehearsal_end_to_end(tmp_path):
    """Full-chain rehearsal: synthetic-format h5 drops → `--smoke` gate run →
    all three families train for one tiny epoch → summary.json rows with
    smoke=true. This is the strongest no-data evidence that the gate will run
    the day real drops land (accuracy itself is not checked — smoke proves
    machinery, not parity)."""
    root, _ = _make_drops(tmp_path)
    out = tmp_path / "gate_out"
    r = _run(
        ["--root", root, "--out", str(out), "--smoke",
         "--only", "apf_with_height", "--only", "pix4point", "--only", "renderer"],
        # Single CPU device: pytest's 8-virtual-device XLA_FLAGS must not
        # leak in (smoke batch_size=2 can't shard over 8 devices).
        env={"JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""},
    )
    assert r.returncode == 0, r.stderr[-2000:] + r.stdout[-2000:]
    rows = json.load(open(out / "summary.json"))
    assert {row["gate"] for row in rows} == {"apf_with_height", "pix4point", "renderer"}
    assert all(row["smoke"] and row["passed"] for row in rows)
    for row in rows:
        assert os.path.exists(os.path.join(row["output_dir"], "training_metrics.csv"))


def test_gate_targets_match_runbook():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import real_data_gate
    finally:
        sys.path.pop(0)
    assert real_data_gate.TARGETS["apf_with_height"] == pytest.approx(0.8313)
    assert real_data_gate.TARGETS["pix4point"] == pytest.approx(0.7727)
    assert real_data_gate.TARGETS["renderer"] == pytest.approx(0.8244)
    # Every gate name resolves in run_gate's dispatch table.
    src = open(GATE).read()
    for name in real_data_gate.TARGETS:
        assert f'"{name}"' in src
