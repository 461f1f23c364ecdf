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

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "make_multihost_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "transformer_tp_shardings",
    "batch_shard_map",
]


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


def make_hybrid_mesh(
    devices=None,
    model_parallel: int = 1,
    *,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """2-D (data × model) mesh for hybrid DP×TP.

    With ``model_parallel=1`` this degenerates to pure data parallelism (the
    model axis has size 1 — specs mentioning it become no-ops), so callers
    can use one code path for both layouts.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    return Mesh(
        np.asarray(devices).reshape(n // model_parallel, model_parallel),
        (data_axis, model_axis),
    )


def make_multihost_mesh(
    model_parallel: int = 1,
    *,
    replica_axis: str = "replica",
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """3-D (replica × data × model) mesh for multi-host training.

    The ``replica`` axis maps across hosts (DCN — slow interconnect): only
    the once-per-step gradient all-reduce rides it. ``data`` × ``model`` map
    within a host's ICI domain, so tensor-parallel collectives (which fire
    per-layer) never leave the chip fabric. On a single process this
    degenerates to shape (1, n//mp, mp) — the same code path runs everywhere
    and is testable on a virtual CPU mesh.

    Batches shard over ``(replica, data)`` jointly — use
    ``batch_sharding(mesh, axis_name=(replica_axis, data_axis))``.
    """
    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    if n_local % model_parallel != 0:
        raise ValueError(
            f"{n_local} local devices not divisible by model_parallel={model_parallel}"
        )
    if n_proc > 1:
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            (n_local // model_parallel, model_parallel),
            (n_proc, 1),
            devices=jax.devices(),
        )  # (replica·data?, …) — hybrid helper puts DCN on the outer axis
        devices = devices.reshape(n_proc, n_local // model_parallel, model_parallel)
    else:
        devices = np.asarray(jax.devices()).reshape(
            1, n_local // model_parallel, model_parallel
        )
    return Mesh(devices, (replica_axis, data_axis, model_axis))


def batch_shard_map(f, mesh: Mesh, *, axis_names=("data",), n_outputs: int = 1):
    """Run a batch-leading function (e.g. a Pallas kernel wrapper) as one
    SPMD program: every device executes ``f`` on its local shard of axis 0.

    Pallas kernels are single-device programs; under multi-chip SPMD they
    must be placed inside ``shard_map`` so each chip launches the kernel on
    its local block (the XLA-level alternative — letting GSPMD partition the
    custom call — is impossible). All inputs and outputs are sharded on the
    leading axis; anything needing replication should be closed over.
    """
    spec = P(axis_names if len(axis_names) > 1 else axis_names[0])
    out_specs = spec if n_outputs == 1 else tuple(spec for _ in range(n_outputs))
    return jax.shard_map(
        f, mesh=mesh, in_specs=spec, out_specs=out_specs, check_vma=False
    )


def transformer_tp_shardings(
    params,
    mesh: Mesh,
    *,
    model_axis: str = "model",
    column_markers: tuple[str, ...] = ("qkv", "fc1"),
    row_markers: tuple[str, ...] = ("/proj/", "fc2"),
):
    """Megatron-style tensor-parallel layout for transformer params.

    qkv and fc1 kernels are COLUMN-sharded over ``model_axis`` (each device
    holds a head/hidden slice), proj and fc2 kernels ROW-sharded (partial
    sums all-reduced by GSPMD), everything else replicated. Matching is by
    flattened param path, so the rules apply to every block of every model
    family here (Attention/Mlp layer names are shared). Returns a pytree of
    ``NamedSharding`` matching ``params``; GSPMD propagates activation
    shardings and inserts the collectives.

    The reference has no distribution at all (SURVEY.md §2) — this is the
    TPU-native scaling path, validated on virtual-device meshes in
    ``tests/test_multichip.py`` and driven by ``__graft_entry__.dryrun_multichip``.
    """
    import jax.tree_util as jtu

    def spec(path):
        keys = "/".join(p.key for p in path if isinstance(p, jtu.DictKey))
        if keys.endswith("kernel"):
            if any(m in keys for m in column_markers):
                return P(None, model_axis)
            if any(m in f"/{keys}/" for m in row_markers):
                return P(model_axis, None)
        return P()

    flat, treedef = jtu.tree_flatten_with_path(params)
    return jtu.tree_unflatten(
        treedef, [NamedSharding(mesh, spec(p)) for p, _ in flat]
    )
