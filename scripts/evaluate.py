"""Evaluate a trained classifier checkpoint on a test split.

The reference has no standalone evaluation entry (training loops are the
only accuracy readout); this closes that gap for deployment workflows:

    python scripts/evaluate.py --family apf --checkpoint out/model_best.msgpack \
        --root .data/h5_files --num-points 1024 --use-height
    python scripts/evaluate.py --family pix4point --reference-checkpoint best_model.pt ...
    python scripts/evaluate.py --family apf --dataset modelnet40 --root .data/mn40 ...

Prints per-class and overall accuracy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", choices=("apf", "pix4point", "renderer"), required=True)
    parser.add_argument("--checkpoint")
    parser.add_argument("--reference-checkpoint")
    parser.add_argument("--model-config", help="JSON dict or path to the ckpt's .json meta")
    parser.add_argument("--dataset", choices=("scanobjectnn", "modelnet40"),
                        default="scanobjectnn")
    parser.add_argument("--root", default=".data/h5_files")
    parser.add_argument("--variant", default="main_split")
    parser.add_argument("--augmentation", default="base")
    parser.add_argument("--background", action="store_true")
    parser.add_argument("--num-points", type=int, default=1024)
    parser.add_argument("--normalize", action="store_true")
    parser.add_argument("--use-height", action="store_true")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--synthetic", action="store_true",
                        help="generate synthetic data instead of reading --root")
    parser.add_argument("--raw-weights", action="store_true",
                        help="evaluate the raw params of an EMA checkpoint "
                             "instead of the averaged weights")
    args = parser.parse_args()

    from pointvit_tpu.inference import Classifier

    # model config: explicit JSON, the checkpoint's sidecar meta, or defaults
    model_config = None
    if args.model_config:
        if os.path.exists(args.model_config):
            with open(args.model_config) as f:
                model_config = json.load(f).get("model_config")
        else:
            model_config = json.loads(args.model_config)
    elif args.checkpoint and os.path.exists(args.checkpoint + ".json"):
        with open(args.checkpoint + ".json") as f:
            model_config = json.load(f).get("model_config")
    if model_config is None:
        model_config = {"num_classes": 40 if args.dataset == "modelnet40" else 15}
        if args.family == "apf":
            model_config["in_channels"] = 4 if args.use_height else 3

    root = args.root
    if args.synthetic:
        import tempfile

        from pointvit_tpu.data.synthetic import (
            write_modelnet40_h5,
            write_scanobjectnn_h5,
        )

        root = tempfile.mkdtemp(prefix="eval_")
        if args.dataset == "modelnet40":
            write_modelnet40_h5(root)
        else:
            write_scanobjectnn_h5(root, background=args.background)

    if args.dataset == "modelnet40":
        from pointvit_tpu.data import ModelNet40

        ds = ModelNet40(root, split="test", num_points=args.num_points,
                        normalize=args.normalize)
    else:
        from pointvit_tpu.data import ScanObjectNN
        from pointvit_tpu.data.augment import center_and_normalize_point_cloud

        transform = [center_and_normalize_point_cloud] if args.use_height else None
        ds = ScanObjectNN(
            root, split="test", variant=args.variant,
            augmentation=args.augmentation, background=args.background,
            num_points=args.num_points, normalize=args.normalize,
            sampling_method="first", transform=transform,
            use_height=args.use_height,
        )

    clf = Classifier.for_family(
        args.family, model_config,
        checkpoint=args.checkpoint,
        reference_checkpoint=args.reference_checkpoint,
        example_points=args.num_points,
        batch_size=args.batch,
        use_ema=not args.raw_weights,
    )

    points = np.stack([ds[i][0] for i in range(len(ds))])
    labels = np.asarray([int(ds[i][1]) for i in range(len(ds))])
    preds = clf.predict(points)

    acc = float((preds == labels).mean())
    print(f"\noverall accuracy: {acc:.4f}  ({(preds == labels).sum()}/{len(labels)})")
    num_classes = model_config["num_classes"]
    per_class = []
    for c in range(num_classes):
        m = labels == c
        if m.any():
            per_class.append(float((preds[m] == c).mean()))
    print(f"mean per-class accuracy: {np.mean(per_class):.4f} over {len(per_class)} classes")


if __name__ == "__main__":
    main()
