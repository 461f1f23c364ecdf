"""Synthetic learning-curve parity: TPU rebuild trainer vs torch reference twin.

Trains the same tiny APF architecture with the same recipe (AdamW 5e-4 /
wd 0.05, label smoothing 0.3, timm-cosine warmup schedule) on an identical
synthetic corpus — once through ``pointvit_tpu.train.Trainer`` (full on-device
pipeline) and once through the independent torch implementation in
``benchmarks/torch_apf.py`` (reference math, numpy tokenizer). Writes both
curves under ``results/synthetic_parity/`` for side-by-side comparison
(VERDICT r1 item 4c: "train reference-vs-rebuild on the same synthetic
corpus and show matching learning curves").

Usage: python scripts/synthetic_parity.py [--epochs 30] [--out results/synthetic_parity]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--classes", type=int, default=15)
    ap.add_argument("--train", type=int, default=256)
    ap.add_argument("--test", type=int, default=128)
    ap.add_argument("--points", type=int, default=256)
    ap.add_argument("--out", default="results/synthetic_parity")
    args = ap.parse_args()

    from pointvit_tpu.data.synthetic import make_clouds

    G, K, E, HEADS, DEPTH, BOTTLENECK, BS = 32, 8, 96, 4, 4, 16, 32
    train_pts, train_y = make_clouds(args.train, args.points, args.classes, seed=0)
    test_pts, test_y = make_clouds(args.test, args.points, args.classes, seed=1)

    os.makedirs(args.out, exist_ok=True)

    # --- torch twin (reference math, cached deterministic tokenizer) -------
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
    from torch_apf import group_clouds, train_torch_apf

    print("grouping clouds for the torch twin ...", flush=True)
    tg = group_clouds(train_pts, G, K)
    vg = group_clouds(test_pts, G, K)
    print("training torch twin ...", flush=True)
    torch_hist = train_torch_apf(
        tg, train_y, vg, test_y,
        num_classes=args.classes, in_channels=3, embed_dim=E, depth=DEPTH,
        heads=HEADS, bottleneck=BOTTLENECK, epochs=args.epochs, batch_size=BS,
        warmup_epochs=3,
    )
    with open(os.path.join(args.out, "torch.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(torch_hist[0]))
        w.writeheader()
        w.writerows(torch_hist)

    # --- TPU rebuild (full on-device pipeline) -----------------------------
    import jax.numpy as jnp

    from pointvit_tpu.models import AdaptPointFormer
    from pointvit_tpu.train.schedules import timm_cosine_schedule
    from pointvit_tpu.train.trainer import Trainer, build_optimizer

    model = AdaptPointFormer(
        num_classes=args.classes, in_channels=3, embedding_dim=E, npoint=G,
        nsample=K, depth=DEPTH, num_heads=HEADS, adapter_bottleneck=BOTTLENECK,
        dtype=jnp.float32,
    )
    steps_per_epoch = args.train // BS
    schedule = timm_cosine_schedule(
        5e-4, epochs=args.epochs, steps_per_epoch=steps_per_epoch,
        warmup_epochs=3, warmup_lr_init=1e-3,
    )
    optimizer = build_optimizer(schedule, weight_decay=0.05)
    train_ds = [(train_pts[i], int(train_y[i])) for i in range(args.train)]
    test_ds = [(test_pts[i], int(test_y[i])) for i in range(args.test)]
    out_dir = os.path.join(args.out, "jax_run")
    print("training TPU rebuild ...", flush=True)
    trainer = Trainer(
        model,
        train_dataset=train_ds,
        test_dataset=test_ds,
        optimizer=optimizer,
        schedule=schedule,
        batch_size=BS,
        epochs=args.epochs,
        label_smoothing=0.3,
        output_dir=out_dir,
        save_config_snapshot=False,
    )
    trainer.train()
    # copy the CSV up with a uniform name
    rows = list(csv.reader(open(os.path.join(out_dir, "training_metrics.csv"))))
    with open(os.path.join(args.out, "jax.csv"), "w", newline="") as f:
        csv.writer(f).writerows(rows)

    tb = max(h["test_accuracy"] for h in torch_hist)
    jb = max(float(r[4]) for r in rows[1:])
    print(f"best test accuracy — torch twin: {tb:.4f}, rebuild: {jb:.4f}")
    with open(os.path.join(args.out, "README.md"), "w") as f:
        f.write(
            "# Synthetic learning-curve parity\n\n"
            f"Identical corpus ({args.train} train / {args.test} test clouds, "
            f"{args.classes} classes, {args.points} pts), identical recipe "
            "(AdamW 5e-4/0.05, smoothing 0.3, timm-cosine 3-epoch warmup, "
            f"bs {BS}, {args.epochs} epochs), tiny APF (E={E}, depth={DEPTH}, "
            f"G={G}, K={K}).\n\n"
            f"| run | best test acc |\n|---|---|\n"
            f"| torch reference twin (benchmarks/torch_apf.py) | {tb:.4f} |\n"
            f"| pointvit_tpu Trainer | {jb:.4f} |\n\n"
            "Curves: torch.csv / jax.csv (per-epoch).\n"
        )


if __name__ == "__main__":
    main()
