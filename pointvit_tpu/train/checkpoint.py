"""Checkpoint save/restore with the reference's best/interval policy.

Checkpoints are msgpack-serialized pytrees (flax.serialization) holding the
same payload the reference torch.saves (apf_trainer.py:329-346): epoch,
model params (+ batch stats), optimizer state, accuracy, and the model and
dataset configs. Filenames mirror the reference: ``model_best.msgpack`` /
``best_model.msgpack`` on test-accuracy improvement and
``model_epoch_N.msgpack`` every ``save_interval`` epochs.

(Orbax is the usual choice for multi-host async checkpointing; in this
single-host build msgpack is synchronous, dependency-light, and restores
without an abstract-tree template.)
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any

import jax
import numpy as np
from flax import serialization

__all__ = [
    "save_checkpoint",
    "save_checkpoint_deferred",
    "load_checkpoint",
    "wait_for_pending_writes",
]

# Single background writer thread draining a FIFO queue: checkpoint bytes are
# fully materialized on the host before handing off, so training never blocks
# on (slow container) disk, and successive saves to the SAME filename (e.g.
# model_best.msgpack improving across epochs) land in submission order — a
# thread-per-save design with a bare Lock has no such ordering guarantee.
_queue: "queue.Queue[tuple | None]" = queue.Queue()
_writer: threading.Thread | None = None
_writer_lock = threading.Lock()


def _writer_loop() -> None:
    while True:
        item = _queue.get()
        try:
            if item is None:
                pass
            elif callable(item):
                item()
            else:
                _write_file(*item)
        finally:
            _queue.task_done()


def _ensure_writer() -> None:
    global _writer
    with _writer_lock:
        if _writer is None or not _writer.is_alive():
            _writer = threading.Thread(target=_writer_loop, daemon=True)
            _writer.start()


def wait_for_pending_writes() -> None:
    """Block until all async checkpoint writes have finished."""
    _queue.join()


def _write_file(path: str, blob: bytes, meta_path: str, meta: str) -> None:
    # tmp + os.replace for BOTH files: readers never see partial blobs, and a
    # crash can't leave a corrupt meta next to a valid checkpoint.
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    meta_tmp = meta_path + ".tmp"
    with open(meta_tmp, "w") as f:
        f.write(meta)
    os.replace(meta_tmp, meta_path)


def save_checkpoint(
    output_dir: str,
    filename: str,
    *,
    epoch: int,
    state: Any,
    accuracy: float,
    model_config: dict,
    dataset_config: dict,
    params_host=None,
    async_write: bool = True,
) -> str:
    """Serialize a train-state checkpoint. Returns the (future) written path.

    ``params_host`` optionally supplies an already-fetched host copy of the
    params (trainers use it to avoid re-fetching frozen weights from device).
    With ``async_write`` the device fetch + serialization happen inline
    (consistency) but the disk write runs on a background thread — call
    :func:`wait_for_pending_writes` before reading the file back.
    """
    os.makedirs(output_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "params": params_host if params_host is not None else jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "accuracy": float(accuracy),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = jax.device_get(state.ema_params)
        ebs = getattr(state, "ema_batch_stats", None)
        payload["ema_batch_stats"] = jax.device_get(ebs) if ebs is not None else {}
    path = os.path.join(output_dir, filename)
    # to_state_dict first: optax states are NamedTuples msgpack can't pack raw.
    blob = serialization.msgpack_serialize(
        _to_numpy(serialization.to_state_dict(payload))
    )
    meta = json.dumps(
        {
            "epoch": epoch,
            "accuracy": float(accuracy),
            "model_config": model_config,
            "dataset_config": dataset_config,
        },
        indent=2,
        default=str,
    )
    if async_write:
        _ensure_writer()
        _queue.put((path, blob, path + ".json", meta))
    else:
        _write_file(path, blob, path + ".json", meta)
    return path


def save_checkpoint_deferred(
    output_dir: str,
    filename: str,
    *,
    epoch: int,
    accuracy: float,
    model_config: dict,
    dataset_config: dict,
    fetch,
) -> str:
    """Fully asynchronous save: the device→host fetch AND msgpack
    serialization run on the writer thread, not the training loop.

    ``fetch`` is a zero-arg callable (run on the writer thread) returning the
    payload dict (``params`` / ``batch_stats`` / ``opt_state`` / ``step`` as
    host-ready trees). Callers must hand it donation-safe device buffers —
    the trainer snapshots device-side copies first, since the next donated
    train step invalidates the live state's buffers. Over a remote-TPU
    tunnel the device_get is the dominant checkpoint cost; deferring it
    overlaps the fetch with the next epoch's training.
    """
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)
    meta = json.dumps(
        {
            "epoch": epoch,
            "accuracy": float(accuracy),
            "model_config": model_config,
            "dataset_config": dataset_config,
        },
        indent=2,
        default=str,
    )

    def build_and_write() -> None:
        payload = {"epoch": epoch, "accuracy": float(accuracy), **fetch()}
        blob = serialization.msgpack_serialize(
            _to_numpy(serialization.to_state_dict(payload))
        )
        _write_file(path, blob, path + ".json", meta)

    _ensure_writer()
    _queue.put(build_and_write)
    return path


def load_checkpoint(path: str, state: Any | None = None) -> dict:
    """Restore a checkpoint dict; if ``state`` is given, its params/opt_state
    structure is used as the deserialization template (exact dtypes/shapes)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if state is not None:
        template = {
            "epoch": 0,
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": 0,
            "accuracy": 0.0,
        }
        # The EMA trees are optional on both sides: template them only when
        # the file carries them (an EMA trainer resuming a pre-EMA
        # checkpoint seeds the average from params/stats), and drop them
        # when the file has them but the caller's state doesn't track any.
        for key, attr in (
            ("ema_params", "ema_params"),
            ("ema_batch_stats", "ema_batch_stats"),
        ):
            in_file = isinstance(raw, dict) and key in raw
            tracked = getattr(state, attr, None) is not None
            if in_file and tracked:
                template[key] = jax.device_get(getattr(state, attr))
            elif in_file:
                raw = {k: v for k, v in raw.items() if k != key}
        raw = serialization.from_state_dict(template, raw)
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            raw["meta"] = json.load(f)
    return raw


def _to_numpy(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )
