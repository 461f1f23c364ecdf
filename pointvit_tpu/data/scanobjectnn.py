"""ScanObjectNN dataset (HDF5), host-side.

Capability parity with ``src/data/scanobjectnn.py``: the full
variant/augmentation/background/newsplit filename matrix, the four sampling
methods (``all`` / ``first`` / ``random`` / ``fps``), unit-sphere
normalization, the custom-augmentation path, the dict-transform pipeline
(including the derived ``heights`` channel), and ``use_height`` channel
concatenation.

TPU-native deltas:
- offline FPS at construction runs batched on the accelerator through
  :func:`pointvit_tpu.ops.farthest_point_sample` (the reference moves the
  whole array to CUDA and loops, scanobjectnn.py:92-97);
- items are plain numpy ``(points, label)`` pairs — batching/striding is the
  loader's job (:mod:`pointvit_tpu.data.loader`), device placement the
  trainer's.

Note the reference's augmentation-probability quirk (scanobjectnn.py:198):
each augment fires when ``random() > augmentation_probability``, i.e. with
probability ``1 - p``. Preserved exactly.
"""

from __future__ import annotations

import os

import numpy as np

from pointvit_tpu.data.augment import (
    drop_and_replace_with_noise,
    normalize_point_cloud,
    random_jitter_point_cloud,
    random_rotate_point_cloud,
    random_scale_point_cloud,
)

__all__ = ["ScanObjectNN"]

VARIANTS = ("main_split", "split1", "split2", "split3", "split4")
AUGMENTATIONS = (
    "base",
    "augmented25_norot",
    "augmented25rot",
    "augmentedrot",
    "augmentedrot_scale75",
)


def _h5_path(
    root_dir: str,
    split: str,
    variant: str,
    augmentation: str,
    background: bool,
    use_newsplit: bool,
) -> str:
    """Reproduce the reference's directory/filename logic (scanobjectnn.py:113-129)."""
    dir_name = variant if background else variant + "_nobg"
    if augmentation == "base":
        filename = f"{split}_objectdataset.h5"
    elif (
        augmentation == "augmentedrot_scale75" and use_newsplit and split == "test"
    ):
        filename = f"{split}_objectdataset_{augmentation}_newsplit.h5"
    else:
        filename = f"{split}_objectdataset_{augmentation}.h5"
    return os.path.join(root_dir, dir_name, filename)


class ScanObjectNN:
    """ScanObjectNN point-cloud classification dataset.

    Args mirror the reference constructor (scanobjectnn.py:38-97). ``seed``
    controls all per-item randomness (the reference uses global numpy state).
    """

    def __init__(
        self,
        root_dir: str,
        split: str = "training",
        variant: str = "main_split",
        augmentation: str = "base",
        background: bool = True,
        num_points: int | None = None,
        normalize: bool = False,
        use_newsplit: bool = False,
        use_custom_augmentation: bool = False,
        augmentation_probability: float = 0.2,
        sampling_method: str = "all",
        transform=None,
        use_height: bool = False,
        seed: int = 0,
    ) -> None:
        self.root_dir = root_dir
        self.split = split
        self.variant = variant
        self.augmentation = augmentation
        self.background = background
        self.num_points = num_points
        self.normalize = normalize
        self.use_newsplit = use_newsplit
        self.use_custom_augmentation = use_custom_augmentation
        self.augmentation_probability = augmentation_probability
        self.sampling_method = sampling_method
        self.transform = transform
        self.use_height = use_height
        self._rng = np.random.default_rng(seed)

        self.data, self.labels = self._load_data()
        self.num_classes = int(len(np.unique(self.labels)))

        if self.num_points is not None and self.sampling_method == "fps":
            self.data = self._offline_fps(self.data, self.num_points)

    # -- loading ----------------------------------------------------------

    def _load_data(self) -> tuple[np.ndarray, np.ndarray]:
        import h5py

        path = _h5_path(
            self.root_dir,
            self.split,
            self.variant,
            self.augmentation,
            self.background,
            self.use_newsplit,
        )
        if not os.path.exists(path):
            raise FileNotFoundError(f"Dataset file not found: {path}")
        with h5py.File(path, "r") as f:
            data = f["data"][:]
            labels = f["label"][:]
        return data.astype(np.float32), labels.astype(np.int64).squeeze()

    @staticmethod
    def _offline_fps(data: np.ndarray, num_points: int, chunk: int = 512) -> np.ndarray:
        """Batched accelerator FPS over the whole array (scanobjectnn.py:92-97)."""
        import jax.numpy as jnp

        from pointvit_tpu.ops import farthest_point_sample, fps_gather

        out = []
        for start in range(0, len(data), chunk):
            block = jnp.asarray(data[start : start + chunk])
            idx = farthest_point_sample(block, num_points)
            out.append(np.asarray(fps_gather(block, idx)))
        return np.concatenate(out, axis=0)

    # -- item access ------------------------------------------------------

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.int64]:
        points = self.data[idx]
        label = self.labels[idx]
        rng = self._rng

        if self.sampling_method == "all" or self.num_points is None:
            pass
        elif self.sampling_method == "first":
            if points.shape[0] < self.num_points:
                indices = rng.choice(points.shape[0], self.num_points, replace=True)
                points = points[indices]
            elif points.shape[0] > self.num_points:
                points = points[: self.num_points]
        elif self.sampling_method == "random":
            replace = points.shape[0] < self.num_points
            indices = rng.choice(points.shape[0], self.num_points, replace=replace)
            points = points[indices]
        # 'fps' was applied offline at construction.

        if self.normalize:
            points = normalize_point_cloud(points)

        if self.split == "training" and self.use_custom_augmentation:
            p = self.augmentation_probability
            if rng.random() > p:
                points = random_rotate_point_cloud(points, rng=rng)
            if rng.random() > p:
                points = random_scale_point_cloud(points, 0.8, 1.2, rng=rng)
            if rng.random() > p:
                points = random_jitter_point_cloud(points, sigma=0.03, clip=0.05, rng=rng)
            if rng.random() > p:
                points = drop_and_replace_with_noise(
                    points, drop_ratio=0.2, noise_std=0.05, rng=rng
                )

        heights = None
        if self.transform:
            data = {"xyz": points, "label": label}
            for fn in self.transform:
                data = fn(data)
            label = data["label"]
            points = data["xyz"]
            heights = data.get("heights")

        if self.use_height and heights is not None:
            points = np.concatenate(
                [points.astype(np.float32), heights.astype(np.float32)], axis=1
            )
        else:
            points = points.astype(np.float32)

        return points, np.int64(label)
