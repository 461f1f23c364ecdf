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

import queue
import threading
from typing import Callable, Iterator

import numpy as np

__all__ = ["Loader", "FastLoader", "DeviceDataset", "Prefetcher"]


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


class FastLoader:
    """Batch-level pipeline: vectorized slicing + native C++ augmentation.

    Drop-in replacement for :class:`Loader` when the per-item work is the
    standard augmentation pipeline (i.e. ``sampling_method`` is ``'all'`` or
    offline ``'fps'``): clouds are sliced from the dataset's backing array in
    one numpy gather and the whole batch runs through
    :class:`~pointvit_tpu.data.native.BatchAugmenter` (~10-20× faster than
    the per-sample Python path; distributions identical, RNG streams differ).
    """

    def __init__(
        self,
        data,
        labels,
        batch_size: int,
        augmenter=None,
        use_height: bool = False,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ) -> None:
        self.data = np.ascontiguousarray(data, dtype=np.float32)
        self.labels = np.asarray(labels)
        self.batch_size = batch_size
        self.augmenter = augmenter
        self.use_height = use_height
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    @classmethod
    def for_dataset(cls, dataset, batch_size, augmenter, *, use_height=False,
                    shuffle=False, drop_last=False, seed=0):
        """Build from a ScanObjectNN/ModelNet40-style dataset instance."""
        return cls(
            dataset.data,
            dataset.labels,
            batch_size,
            augmenter,
            use_height=use_height,
            shuffle=shuffle,
            drop_last=drop_last,
            seed=seed,
        )

    def __len__(self) -> int:
        n = len(self.labels)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = len(self.labels)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            points = self.data[idx]
            labels = self.labels[idx]
            if self.augmenter is not None:
                points, heights = self.augmenter(points)
                if self.use_height and heights is not None:
                    points = np.concatenate([points, heights[..., None]], axis=-1)
            yield points, labels


class Prefetcher:
    """Pipeline host batch prep + host→device transfer behind device compute.

    Wraps any batch iterable: a background thread drains it, applies
    ``transfer`` (typically a sharded ``jax.device_put``), and parks up to
    ``depth`` ready device batches in a bounded queue. The training loop then
    never waits on dataset indexing, augmentation, or the host→device copy —
    all of it overlaps with the previous step's device execution. (The
    reference leans on torch ``DataLoader`` workers for the same overlap,
    apf_trainer.py:144-162; here one thread suffices because the native batch
    augmenter is already parallel and ``device_put`` releases the GIL.)

    ``depth`` bounds host+HBM memory: at most ``depth + 1`` batches exist
    beyond the one the device is consuming.
    """

    def __init__(self, iterable, transfer: Callable | None = None, depth: int = 2):
        self._iterable = iterable
        self._transfer = transfer
        self._depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        stop = threading.Event()
        _END = object()

        def put_or_stop(item) -> bool:
            """Stop-aware bounded put. Returns False if the consumer is gone
            (stop set) — unconditional blocking puts here would leak this
            daemon thread forever when the consumer abandons the generator
            with the queue full."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self._iterable:
                    if self._transfer is not None:
                        item = self._transfer(*item)
                    if not put_or_stop(item):
                        return
                put_or_stop(_END)
            except BaseException as e:  # propagate into the consumer
                put_or_stop(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


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
