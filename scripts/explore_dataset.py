"""Dataset exerciser — capability parity with the reference's manual
test-drive script ``test/test.py``.

Loads every variant/augmentation/background combination with ✓/✗ reporting,
smoke-tests the batch loader (shapes/dtypes/ranges for a few batches),
compares augmentation settings on one sample, and optionally saves 3D
scatter visualizations. Point it at a real ScanObjectNN tree, or run with
``--synthetic`` to generate one.

Usage:
    python scripts/explore_dataset.py [--root DIR] [--synthetic] [--plot]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dataset_loading(root: str) -> None:
    from pointvit_tpu.data import ScanObjectNN
    from pointvit_tpu.data.scanobjectnn import AUGMENTATIONS, VARIANTS

    print("=== dataset loading matrix ===")
    for variant in VARIANTS:
        for augmentation in AUGMENTATIONS:
            for background in (True, False):
                desc = f"{variant:10s} {augmentation:22s} bg={background}"
                try:
                    ds = ScanObjectNN(
                        root, variant=variant, augmentation=augmentation,
                        background=background,
                    )
                    print(f"  ✓ {desc}: {len(ds)} samples, {ds.num_classes} classes")
                except FileNotFoundError:
                    print(f"  ✗ {desc}: file not found")


def test_dataloader(root: str, batch_size: int = 8) -> None:
    from pointvit_tpu.data import Loader, ScanObjectNN

    print("=== loader smoke test ===")
    ds = ScanObjectNN(root, num_points=1024, sampling_method="first", normalize=True)
    loader = Loader(ds, batch_size, shuffle=True, drop_last=True)
    for i, (points, labels) in enumerate(loader):
        print(
            f"  batch {i}: points {points.shape} {points.dtype} "
            f"range [{points.min():.3f}, {points.max():.3f}]  labels {labels.shape}"
        )
        if i >= 2:
            break


def test_augmentation_comparison(root: str) -> None:
    from pointvit_tpu.data import ScanObjectNN

    print("=== augmentation comparison (sample 0) ===")
    base = ScanObjectNN(root, normalize=True)
    raw = base[0][0]
    for prob in (1.0, 0.5, 0.0):
        ds = ScanObjectNN(
            root, normalize=True, use_custom_augmentation=True,
            augmentation_probability=prob, seed=42,
        )
        pts = ds[0][0]
        delta = float(np.abs(pts - raw).mean())
        print(f"  augmentation_probability={prob}: mean |Δ| = {delta:.4f}")


def visualize_samples(root: str, out: str = "dataset_samples.png") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pointvit_tpu.data import ScanObjectNN

    ds = ScanObjectNN(root, normalize=True)
    fig = plt.figure(figsize=(12, 4))
    rng = np.random.default_rng(0)
    for i, idx in enumerate(rng.integers(0, len(ds), 3)):
        pts, label = ds[int(idx)]
        ax = fig.add_subplot(1, 3, i + 1, projection="3d")
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1)
        ax.set_title(f"sample {idx} (class {label})")
    fig.tight_layout()
    fig.savefig(out)
    print(f"saved {out}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=".data/h5_files")
    parser.add_argument("--synthetic", action="store_true",
                        help="generate a synthetic tree instead of reading --root")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    root = args.root
    if args.synthetic:
        from pointvit_tpu.data.synthetic import write_scanobjectnn_h5

        root = tempfile.mkdtemp(prefix="sonn_")
        write_scanobjectnn_h5(root)
        write_scanobjectnn_h5(root, background=False)
        print(f"synthetic dataset at {root}")

    test_dataset_loading(root)
    test_dataloader(root)
    test_augmentation_comparison(root)
    if args.plot:
        visualize_samples(root)


if __name__ == "__main__":
    sys.exit(main())
