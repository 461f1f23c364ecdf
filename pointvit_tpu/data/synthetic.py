"""Synthetic point-cloud data: class-conditional shape generator + H5 writers.

The build environment has no dataset downloads (zero egress), so tests,
smoke-training, and throughput benchmarks run on synthetic clouds. The
generator produces *learnable* class structure (class-dependent Gaussian
ellipsoid mixtures) so end-to-end training sanity checks can watch accuracy
rise above chance. The writers emit H5 files in the exact on-disk layouts the
:class:`~pointvit_tpu.data.scanobjectnn.ScanObjectNN` and
:class:`~pointvit_tpu.data.modelnet40.ModelNet40` loaders expect, so the
loaders' path/format logic is exercised for real.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "make_clouds",
    "write_scanobjectnn_h5",
    "write_modelnet40_h5",
]


def make_clouds(
    num_samples: int,
    num_points: int = 2048,
    num_classes: int = 15,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate (num_samples, num_points, 3) clouds + labels with
    class-dependent geometry (cluster count, anisotropy, orientation)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_samples)
    clouds = np.empty((num_samples, num_points, 3), dtype=np.float32)

    # Deterministic per-class shape recipe.
    class_rng = np.random.default_rng(1234)
    recipes = []
    for c in range(num_classes):
        k = 1 + c % 4  # cluster count 1..4
        centers = class_rng.uniform(-0.6, 0.6, (k, 3))
        scales = class_rng.uniform(0.05, 0.4, (k, 3))
        recipes.append((k, centers, scales))

    for i, c in enumerate(labels):
        k, centers, scales = recipes[c]
        assignment = rng.integers(0, k, num_points)
        pts = centers[assignment] + rng.standard_normal((num_points, 3)) * scales[assignment]
        clouds[i] = pts.astype(np.float32)
    return clouds, labels.astype(np.int64)


def write_scanobjectnn_h5(
    root_dir: str,
    variant: str = "main_split",
    augmentation: str = "base",
    background: bool = True,
    num_train: int = 64,
    num_test: int = 32,
    num_points: int = 2048,
    num_classes: int = 15,
    seed: int = 0,
) -> str:
    """Create a synthetic ScanObjectNN tree under ``root_dir`` and return it."""
    import h5py

    dir_name = variant if background else variant + "_nobg"
    os.makedirs(os.path.join(root_dir, dir_name), exist_ok=True)
    suffix = "" if augmentation == "base" else f"_{augmentation}"
    for split, n, s in (("training", num_train, seed), ("test", num_test, seed + 1)):
        data, labels = make_clouds(n, num_points, num_classes, seed=s)
        path = os.path.join(root_dir, dir_name, f"{split}_objectdataset{suffix}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("label", data=labels)
    return root_dir


def write_modelnet40_h5(
    root_dir: str,
    num_train: int = 128,
    num_test: int = 64,
    num_points: int = 2048,
    seed: int = 0,
) -> str:
    """Create a synthetic modelnet40_ply_hdf5_2048-layout tree."""
    import h5py

    os.makedirs(root_dir, exist_ok=True)
    for tag, n, s in (("train", num_train, seed), ("test", num_test, seed + 1)):
        data, labels = make_clouds(n, num_points, num_classes=40, seed=s)
        with h5py.File(os.path.join(root_dir, f"ply_data_{tag}0.h5"), "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("label", data=labels)
    return root_dir
