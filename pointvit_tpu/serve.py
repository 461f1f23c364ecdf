"""Production inference: checkpoint → jit'd, bucket-padded, DP-sharded predict.

The reference has no serving surface — its only inference helper is
``RendererTrainer.predict`` (``src/train/renderer_trainer.py:431-445``), which
requires a fully-constructed trainer (datasets, loaders, optimizer) just to
classify clouds. Here serving is a first-class subsystem designed around the
TPU's compilation model:

- **Static shapes.** XLA compiles one executable per input shape, so
  arbitrary request sizes would each pay a multi-second compile. Requests are
  padded up to a small ladder of batch *buckets*; each bucket compiles once
  (at :meth:`InferenceSession.warmup` or first use) and every subsequent
  request reuses a cached executable.
- **Data parallelism.** Given a :class:`jax.sharding.Mesh`, inputs are
  sharded over the batch axis and parameters replicated — the same
  ``NamedSharding`` machinery the trainer uses (``parallel/mesh.py``), so a
  v5e-8 serves 8× a single chip with no code change. Buckets are rounded up
  to multiples of the mesh size.
- **Request coalescing.** :class:`MicroBatcher` lets concurrent callers
  submit individual clouds; a background thread drains the queue into one
  padded ``predict`` call per tick (latency bound ``max_delay_ms``), which is
  how small online requests reach TPU-efficient batch sizes.

``InferenceSession.from_checkpoint`` restores the trainer's msgpack
checkpoint format (``train/checkpoint.py``) and rebuilds the model from the
``model_config`` in the sidecar JSON via :mod:`pointvit_tpu.models.factory`
— one file path is the complete serving contract.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from pointvit_tpu.models.factory import build_model
from pointvit_tpu.parallel.mesh import batch_sharding, replicate

__all__ = ["InferenceSession", "MicroBatcher"]

_DEFAULT_BUCKETS = (8, 32, 128, 256)


class InferenceSession:
    """A restored model behind a bucket-compiled ``predict``.

    Args:
        model: the family's Flax module (see :func:`build_model`).
        params: parameter pytree (host or device).
        batch_stats: BatchNorm statistics pytree (APF/renderer heads use BN),
            or None/empty.
        mesh: optional :class:`jax.sharding.Mesh` for batch-axis data
            parallelism; params are replicated, inputs sharded.
        buckets: ascending batch buckets to compile; requests pad to the
            smallest fitting bucket, larger requests run in largest-bucket
            chunks. Each is rounded up to a multiple of the mesh size.
    """

    def __init__(
        self,
        model,
        params,
        batch_stats=None,
        *,
        mesh: jax.sharding.Mesh | None = None,
        buckets: tuple[int, ...] = _DEFAULT_BUCKETS,
    ) -> None:
        self.model = model
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def forward(vs, points):
            return self.model.apply(vs, points, train=False)

        self._configure(variables, forward, mesh, buckets)

    def _configure(self, variables, forward, mesh, buckets) -> None:
        """Shared session plumbing: bucket ladder, mesh placement, jit."""
        self.mesh = mesh
        n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        self.buckets = tuple(
            sorted({-(-int(b) // n_dev) * n_dev for b in buckets})
        )
        if not self.buckets:
            raise ValueError("at least one bucket is required")
        if mesh is not None:
            variables = replicate(variables, mesh)
        self._variables = variables
        self._in_sharding = batch_sharding(mesh) if mesh is not None else None
        self._forward = jax.jit(forward)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        *,
        family: str | None = None,
        model=None,
        model_config: dict | None = None,
        mesh: jax.sharding.Mesh | None = None,
        buckets: tuple[int, ...] = _DEFAULT_BUCKETS,
        use_ema: bool = True,
    ) -> "InferenceSession":
        """Restore a trainer checkpoint (``*.msgpack`` + sidecar ``.json``).

        The sidecar's ``model_config`` rebuilds the architecture unless an
        explicit ``model`` or ``model_config`` is given. Checkpoints from
        an EMA trainer serve their averaged weights/stats by default
        (``use_ema=False`` for the raw params) — same policy as
        ``inference.Classifier``.
        """
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        ema = use_ema and isinstance(raw, dict) and "ema_params" in raw
        if model is None:
            if model_config is None:
                meta_path = path + ".json"
                if not os.path.exists(meta_path):
                    raise FileNotFoundError(
                        f"{meta_path} missing — pass model= or model_config= "
                        "to rebuild the architecture"
                    )
                with open(meta_path) as f:
                    model_config = json.load(f)["model_config"]
            model = build_model(model_config, family=family)
        return cls(
            model,
            raw["ema_params"] if ema else raw["params"],
            (raw.get("ema_batch_stats") if ema else None)
            or raw.get("batch_stats")
            or None,
            mesh=mesh,
            buckets=buckets,
        )

    @classmethod
    def from_exported(
        cls,
        path: str,
        *,
        mesh: jax.sharding.Mesh | None = None,
        buckets: tuple[int, ...] = _DEFAULT_BUCKETS,
    ) -> "InferenceSession":
        """Serve a StableHLO artifact (``scripts/export_model.py``) behind
        the same bucket ladder / mesh DP / micro-batching — the host needs
        no Python model code or params files at all (pointvit_tpu/export.py).

        Batch-polymorphic artifacts (the export default) accept every bucket
        size; the ladder still bounds how many shapes get compiled.
        """
        from pointvit_tpu.export import load_exported

        fn = load_exported(path)
        self = cls.__new__(cls)
        self.model = None
        self._configure({}, lambda vs, points: fn(points), mesh, buckets)
        return self

    # -- inference ----------------------------------------------------------

    def warmup(self, example: np.ndarray) -> None:
        """Compile every bucket up front (first production request then never
        pays a compile). ``example`` is a single cloud, shape (N, C)."""
        for b in self.buckets:
            batch = np.broadcast_to(example, (b,) + tuple(example.shape))
            jax.block_until_ready(self._apply(np.ascontiguousarray(batch)))

    def _apply(self, batch: np.ndarray):
        x = jnp.asarray(batch)
        if self._in_sharding is not None:
            x = jax.device_put(x, self._in_sharding)
        return self._forward(self._variables, x)

    def predict_logits(self, points: np.ndarray) -> np.ndarray:
        """(n, N, C) clouds → (n, num_classes) logits, any n ≥ 1.

        n pads to the smallest fitting bucket (padding replicates the last
        cloud — shapes stay static, outputs are sliced back to n); n beyond
        the largest bucket runs in largest-bucket chunks.
        """
        points = np.asarray(points)
        n = points.shape[0]
        cap = self.buckets[-1]
        if n > cap:
            outs = [
                self.predict_logits(points[i : i + cap]) for i in range(0, n, cap)
            ]
            return np.concatenate(outs, axis=0)
        bucket = next(b for b in self.buckets if b >= n)
        if n < bucket:
            pad = np.broadcast_to(points[-1:], (bucket - n,) + points.shape[1:])
            batch = np.concatenate([points, pad], axis=0)
        else:
            batch = points
        return np.asarray(self._apply(batch))[:n]

    def predict(self, points: np.ndarray) -> np.ndarray:
        """(n, N, C) clouds → (n,) class ids."""
        return np.argmax(self.predict_logits(points), axis=-1)


class MicroBatcher:
    """Coalesce concurrent single-cloud requests into padded batches.

    Callers block in :meth:`submit`; a daemon thread drains the queue every
    ``max_delay_ms`` (or as soon as ``max_batch`` requests are pending) into
    one :meth:`InferenceSession.predict_logits` call. Throughput scales with
    concurrency while each caller sees at most one tick of added latency.
    """

    def __init__(
        self,
        session: InferenceSession,
        *,
        max_batch: int = 256,
        max_delay_ms: float = 5.0,
    ) -> None:
        self.session = session
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1e3
        self._queue: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, cloud: np.ndarray) -> np.ndarray:
        """One (N, C) cloud → its (num_classes,) logits. Blocks; thread-safe."""
        if self._closed.is_set():
            raise RuntimeError("MicroBatcher is closed")
        done = threading.Event()
        slot: list = [None, None]  # result, exception
        self._queue.put((np.asarray(cloud), done, slot))
        done.wait()
        if slot[1] is not None:
            raise slot[1]
        return slot[0]

    def close(self) -> None:
        self._closed.set()
        self._queue.put(None)  # wake the drain loop
        self._thread.join()
        # A submit() that passed the closed check before close() set it can
        # still enqueue after the drain loop exited; fail those callers
        # instead of leaving them blocked forever.
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                _, done, slot = item
                slot[1] = RuntimeError("MicroBatcher is closed")
                done.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                if self._closed.is_set():
                    return
                continue
            pending = [item]
            deadline = time.monotonic() + self.max_delay
            while len(pending) < self.max_batch:
                try:
                    nxt = self._queue.get(
                        timeout=max(0.0, deadline - time.monotonic())
                    )
                except queue.Empty:
                    break
                if nxt is None:
                    if self._closed.is_set():
                        self._flush(pending)
                        return
                    continue
                pending.append(nxt)
            self._flush(pending)

    def _flush(self, pending) -> None:
        # Group by cloud shape before stacking: concurrent callers are not
        # guaranteed to send the same point count, and np.stack over ragged
        # shapes raises — which would fan one client's odd shape out as an
        # error to every caller coalesced in the tick (advisor r4). One
        # stacked dispatch per distinct (N, C) instead.
        groups: dict[tuple, list] = {}
        for item in pending:
            groups.setdefault(tuple(np.shape(item[0])), []).append(item)
        for group in groups.values():
            try:
                logits = self.session.predict_logits(
                    np.stack([c for c, _, _ in group])
                )
            except Exception as e:  # propagate to this group's callers only
                for _, done, slot in group:
                    slot[1] = e
                    done.set()
                continue
            for i, (_, done, slot) in enumerate(group):
                slot[0] = logits[i]
                done.set()
