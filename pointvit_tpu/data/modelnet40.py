"""ModelNet40 dataset (HDF5), host-side.

The reference implements only ScanObjectNN; ModelNet40 is the rebuild's
north-star benchmark dataset (BASELINE.md). This loader reads the standard
``modelnet40_ply_hdf5_2048`` layout: per-split ``ply_data_{train,test}N.h5``
shards each holding ``data`` (B, 2048, 3) float32 and ``label`` (B, 1), with
the canonical protocol of taking the first ``num_points`` points.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from pointvit_tpu.data.augment import (
    normalize_point_cloud,
    random_jitter_point_cloud,
    random_rotate_point_cloud,
    random_scale_point_cloud,
)

__all__ = ["ModelNet40"]


class ModelNet40:
    """ModelNet40 classification dataset (40 classes, 2048-pt clouds)."""

    NUM_CLASSES = 40

    def __init__(
        self,
        root_dir: str,
        split: str = "training",
        num_points: int = 1024,
        normalize: bool = True,
        use_custom_augmentation: bool = False,
        augmentation_probability: float = 0.5,
        seed: int = 0,
    ) -> None:
        self.root_dir = root_dir
        self.split = split
        self.num_points = num_points
        self.normalize = normalize
        self.use_custom_augmentation = use_custom_augmentation
        self.augmentation_probability = augmentation_probability
        self._rng = np.random.default_rng(seed)

        self.data, self.labels = self._load_data()
        self.num_classes = int(len(np.unique(self.labels)))

    def _load_data(self) -> tuple[np.ndarray, np.ndarray]:
        import h5py

        tag = "train" if self.split in ("training", "train") else "test"
        shards = sorted(
            glob.glob(os.path.join(self.root_dir, f"ply_data_{tag}*.h5"))
        ) or sorted(glob.glob(os.path.join(self.root_dir, f"{tag}*.h5")))
        if not shards:
            raise FileNotFoundError(
                f"No ModelNet40 h5 shards for split {tag!r} under {self.root_dir}"
            )
        datas, labels = [], []
        for path in shards:
            with h5py.File(path, "r") as f:
                datas.append(f["data"][:].astype(np.float32))
                labels.append(f["label"][:].astype(np.int64))
        return np.concatenate(datas, 0), np.concatenate(labels, 0).squeeze()

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.int64]:
        points = self.data[idx][: self.num_points]
        label = self.labels[idx]
        rng = self._rng

        if self.normalize:
            points = normalize_point_cloud(points)

        if self.split in ("training", "train") and self.use_custom_augmentation:
            p = self.augmentation_probability
            if rng.random() > p:
                points = random_rotate_point_cloud(points, rng=rng)
            if rng.random() > p:
                points = random_scale_point_cloud(points, 0.8, 1.2, rng=rng)
            if rng.random() > p:
                points = random_jitter_point_cloud(points, rng=rng)

        return points.astype(np.float32), np.int64(label)
