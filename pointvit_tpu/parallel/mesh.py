"""jax.sharding mesh helpers for batch-level data parallelism.

The reference is single-process single-GPU with no distribution anywhere
(SURVEY.md §2: its only distributed artifacts are dead imports,
pix4point_trainer.py:4-6). The TPU rebuild *introduces* distribution: a 1-D
``Mesh`` over all local devices (v5e-8 ICI), batches sharded over the
``data`` axis, parameters replicated. Gradient all-reduce is emitted by XLA
from the jit-compiled loss mean over the sharded batch — there is no
hand-written collective in the training path (the NCCL role is played by XLA
collectives over ICI).

Scaling beyond data parallelism (TP/PP/SP) is unnecessary for parity — the
largest model is ViT-L (~300 M params) with ≤513-token sequences — but the
helpers accept arbitrary axis layouts so model axes can be added later.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate"]


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits axis 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place arrays with their leading axis sharded over the mesh.

    Batch sizes must divide the mesh size (shapes are static on TPU; trainers
    use ``drop_last`` batching to guarantee this).
    """
    sharding = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
