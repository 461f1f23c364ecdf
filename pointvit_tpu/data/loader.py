"""Host → device batch feeding.

Replaces torch ``DataLoader`` (apf_trainer.py:144-162 et al.) with two paths:

- :class:`Loader` — host-side batcher: per-epoch shuffling, collation to
  stacked numpy arrays, optional drop-last. Augmentations run inline (they
  are microseconds per 2048-pt cloud — worker processes are unnecessary
  overhead at these sizes).
- :func:`device_put_sharded_batches` / :class:`DeviceDataset` — HBM-resident
  fast path: a whole split is tiny (ScanObjectNN train ≈ 11k × 2048 × 3 f32
  ≈ 270 MB), so for fixed (non-augmented) pipelines the entire split lives
  on device and batches are sliced there, removing the host→device copy from
  the step loop entirely (the BASELINE.md north-star serving mode).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

__all__ = ["Loader", "DeviceDataset"]


class Loader:
    """Minimal epoch iterator over an indexable dataset of (points, label)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            points, labels = zip(*(self.dataset[int(i)] for i in idx))
            yield np.stack(points), np.asarray(labels)


class DeviceDataset:
    """Whole split resident in HBM; batches sliced on device.

    For serving/benchmark pipelines with no per-item host augmentation.
    """

    def __init__(self, points: np.ndarray, labels: np.ndarray, *, sharding=None):
        import jax

        self.n = len(labels)
        if sharding is not None:
            self.points = jax.device_put(points, sharding)
            self.labels = jax.device_put(labels, sharding)
        else:
            self.points = jax.device_put(points)
            self.labels = jax.device_put(labels)

    def batches(self, batch_size: int, drop_last: bool = True):
        import jax.numpy as jnp

        stop = (self.n // batch_size) * batch_size if drop_last else self.n
        for start in range(0, stop, batch_size):
            yield (
                jnp.asarray(self.points[start : start + batch_size]),
                jnp.asarray(self.labels[start : start + batch_size]),
            )
