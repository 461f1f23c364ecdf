"""One-command real-data accuracy-parity gate.

The reference's core artifact is its measured accuracy corpus (APF 83.13 %,
renderer 82.44 %, Pix4Point 77.27 % — reference
``results/*/training_metrics.csv``; table in docs/RUNBOOK_real_data.md).
This script turns the runbook into one unattended command: it detects the
data/weight drops and, when present, runs every gate — the three family
trainings with the entry scripts' exact config dicts (imported, not copied,
so gate == entry), the ScanObjectNN PB_T50_RS hardest-split APF variant
(BASELINE.json configs), and the serving-preset validation arm — then writes
``results/real_data_gate/summary.json`` with pass/fail per run.

When the drops are absent it prints exactly what is missing and exits 0
(skip), so it can always be invoked; ``tests/test_real_data_gate.py``
subprocess-pins the detection/skip path so the gate is known-good the day
data lands.

Usage:
    python scripts/real_data_gate.py                 # detect, run all gates
    python scripts/real_data_gate.py --check-only    # detection report only
    python scripts/real_data_gate.py --only apf_with_height --epochs 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference best test accuracies (docs/RUNBOOK_real_data.md table; sources:
# reference results/apf/apf_with_height/training_metrics.csv:76,
# results/renderer/num_views_5_diff_False_adapter_64_view_transform_64/,
# results/pix4point/10/). Tolerance ±0.5 % absolute = the reference's own
# seed noise (runbook §3 acceptance).
TARGETS = {
    "apf_with_height": 0.8313,
    "apf_hardest_split": None,  # PB_T50_RS variant — no published reference row
    "pix4point": 0.7727,
    "renderer": 0.8244,
    "apf_serving_preset": 0.8313,  # parity arm: must match apf_with_height
}
TOLERANCE = 0.005


def _weight_drop_present(weights_dir: str | None, stem: str) -> bool:
    if not weights_dir or not os.path.isdir(weights_dir):
        return False
    exts = (".safetensors", ".npz", ".pth", ".pt", ".msgpack", ".bin")
    return any(
        f.startswith(stem) and f.endswith(exts) for f in os.listdir(weights_dir)
    )


def detect(root: str, weights_dir: str | None) -> list[str]:
    """Return the list of missing drops (empty = ready to run everything)."""
    missing = []
    # ScanObjectNN h5 matrix (schema: data/scanobjectnn.py::_h5_path).
    for rel in (
        "main_split/training_objectdataset.h5",
        "main_split/test_objectdataset.h5",
        "main_split/training_objectdataset_augmentedrot_scale75.h5",
        "main_split/test_objectdataset_augmentedrot_scale75.h5",
        "main_split_nobg/training_objectdataset.h5",
        "main_split_nobg/test_objectdataset.h5",
    ):
        if not os.path.exists(os.path.join(root, rel)):
            missing.append(f"data: {os.path.join(root, rel)}")
    weights_env = "$POINTVIT_WEIGHTS"
    for stem in ("vit_base_patch16_224", "vit_small_patch16_384", "vit_b_16"):
        if not _weight_drop_present(weights_dir, stem):
            missing.append(f"weights: {weights_env}/{stem}.*")
    return missing


def _entry_configs(name: str):
    """Import the entry script's config dicts — the gate runs the exact
    configs the published commands run (no drift possible)."""
    import importlib

    mod = importlib.import_module(name)
    return (
        dict(mod.model_config),
        dict(mod.dataset_config),
        dict(mod.train_config),
    )


def _smokeify(name: str, model_config, dataset_config, train_config) -> None:
    """Shrink every axis that does not change the code path: tiny arch, one
    epoch, tiny batch, ``pretrained=False`` (so no weight artifacts are
    read). The REAL gate runs the entry configs untouched — smoke exists so
    the whole chain (h5 variant matrix → loaders → trainer → eval →
    summary.json) stays rehearsable end-to-end without data drops
    (tests/test_real_data_gate.py pins it)."""
    model_config["pretrained"] = False
    model_config["bf16"] = False  # CPU rehearsal: XLA-CPU bf16 is emulated
    train_config.update(epochs=1, batch_size=2, save_interval=1000)
    train_config.pop("warmup_epochs", None)
    if name.startswith("apf"):
        model_config.update(
            embedding_dim=32, depth=2, num_heads=4, npoint=16, nsample=8
        )
        if name == "apf_serving_preset":
            model_config["encoder_second_width"] = 32
        dataset_config.update(train_num_points=64, test_num_points=64)
    elif name == "pix4point":
        model_config.update(embed_dim=32, depth=2, num_heads=4, k_neighbors=8)
        dataset_config.update(num_points=64)
    elif name == "renderer":
        from pointvit_tpu.models.renderer import TORCHVISION_VIT_PRESETS

        TORCHVISION_VIT_PRESETS.setdefault(
            "vit_smoke", dict(patch_size=8, embed_dim=32, depth=2, num_heads=4)
        )
        model_config.update(
            vit_name="vit_smoke", img_size=32, num_views=2,
            adapter_dim=4, view_transform_hidden=8,
        )
        dataset_config.update(num_points=64)


def run_gate(
    name: str, out_root: str, epochs: int | None,
    root: str | None = None, smoke: bool = False,
) -> dict:
    """Run one gate training; return its summary row."""
    out_dir = os.path.join(out_root, name)

    if name in ("apf_with_height", "apf_hardest_split", "apf_serving_preset"):
        from pointvit_tpu.train import APFTrainer

        model_config, dataset_config, train_config = _entry_configs("train_apf")
        if name == "apf_hardest_split":
            # ScanObjectNN PB_T50_RS (BASELINE.json configs): the perturbed
            # hardest variant = augmentedrot_scale75 files, background kept.
            dataset_config["augmentation"] = "augmentedrot_scale75"
            dataset_config["background"] = True
        if name == "apf_serving_preset":
            from pointvit_tpu.models import apf_serving_preset

            model_config["encoder_second_width"] = apf_serving_preset()[
                "encoder_second_width"
            ]
        trainer_cls = APFTrainer
    elif name == "pix4point":
        from pointvit_tpu.train import Pix4PointTrainer

        model_config, dataset_config, train_config = _entry_configs(
            "train_pix4point"
        )
        trainer_cls = Pix4PointTrainer
    elif name == "renderer":
        from pointvit_tpu.train import RendererTrainer

        model_config, dataset_config, train_config = _entry_configs(
            "train_renderer"
        )
        # Reference best cell (82.44 %): num_views=5, fixed views,
        # adapter 64, view_transform 64 (runbook table).
        model_config.update(
            num_views=5, diff_renderer=False,
            adapter_dim=64, view_transform_hidden=64,
        )
        trainer_cls = RendererTrainer
    else:
        raise ValueError(f"unknown gate {name!r}")

    if root:
        # Train on the detected drop location, not the entry-script default.
        dataset_config["root_dir"] = root
    if smoke:
        _smokeify(name, model_config, dataset_config, train_config)
    if epochs:
        train_config["epochs"] = epochs
    trainer = trainer_cls(
        model_config, dataset_config, train_config,
        device="tpu", output_dir=out_dir,
    )

    best = float(trainer.train())
    target = TARGETS[name]
    row = {
        "gate": name,
        "best_test_accuracy": round(best, 4),
        "target": target,
        "tolerance": TOLERANCE,
        # A smoke run proves the machinery end-to-end, not the accuracy.
        "passed": smoke or (target is None) or (best >= target - TOLERANCE),
        "smoke": smoke,
        "output_dir": out_dir,
        "epochs": (epochs or train_config["epochs"]) if (epochs or smoke)
        else "entry-script default",
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=".data/h5_files")
    ap.add_argument("--weights", default=os.environ.get("POINTVIT_WEIGHTS"))
    ap.add_argument("--out", default="results/real_data_gate")
    ap.add_argument("--only", choices=sorted(TARGETS), action="append")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override epochs (smoke); default = entry-script config")
    ap.add_argument("--check-only", action="store_true",
                    help="print the detection report and exit")
    ap.add_argument("--smoke", action="store_true",
                    help="rehearsal mode: tiny arch / 1 epoch / no pretrained "
                    "weights — exercises the full chain, proves nothing "
                    "about accuracy (rows carry smoke=true)")
    args = ap.parse_args()

    missing = detect(args.root, args.weights)
    if args.smoke:
        # Smoke never reads weight artifacts (pretrained=False everywhere).
        missing = [m for m in missing if not m.startswith("weights:")]
    if missing:
        print("real_data_gate: SKIP — missing drops:")
        for m in missing:
            print(f"  - {m}")
        print("Drop layout: docs/RUNBOOK_real_data.md §1.")
        return 0
    print("real_data_gate: all drops present.")
    if args.check_only:
        return 0

    gates = args.only or list(TARGETS)
    os.makedirs(args.out, exist_ok=True)
    rows = [
        run_gate(name, args.out, args.epochs, root=args.root, smoke=args.smoke)
        for name in gates
    ]

    # Serving-preset parity is relative: it must also be within tolerance of
    # the exact arm measured in the same invocation, when both ran.
    by_name = {r["gate"]: r for r in rows}
    if not args.smoke and "apf_serving_preset" in by_name and "apf_with_height" in by_name:
        exact = by_name["apf_with_height"]["best_test_accuracy"]
        slim = by_name["apf_serving_preset"]["best_test_accuracy"]
        by_name["apf_serving_preset"]["parity_vs_exact"] = round(slim - exact, 4)
        by_name["apf_serving_preset"]["passed"] &= slim >= exact - TOLERANCE

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(rows, f, indent=1)
    failed = [r["gate"] for r in rows if not r["passed"]]
    print(f"real_data_gate: {len(rows) - len(failed)}/{len(rows)} passed"
          + (f"; FAILED: {', '.join(failed)}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
