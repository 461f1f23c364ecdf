"""FSDP / ZeRO-style parameter + optimizer sharding over the data axis.

The reference (Irish-77/adapting-2D-ViTs-for-3D-point-cloud-understanding)
is single-process single-GPU with no distribution anywhere (SURVEY.md §2);
plain data parallelism (``parallel/mesh.py``) replicates parameters AND
AdamW moments on every chip. For the largest trunk in this repo — the
renderer's ``vit_l_16`` preset (24×1024, ~0.3 B params,
``models/renderer.py:37-42``) — that is ~3.6 GB of f32 state per chip
before activations, which is exactly where parameter-sharded data
parallelism starts paying.

This is the GSPMD formulation of ZeRO-3, not a hand-written one: each
parameter leaf is *sharded* along its largest divisible axis over the
mesh's ``data`` axis, the optimizer state inherits the same layout (the
rule is a pure function of leaf shape, and AdamW moments are shape-twins of
their params), and the train step is the ordinary jitted step. XLA then
derives the classic ZeRO communication pattern itself — all-gather a
layer's weights right before use, reduce-scatter its gradient right after
— and overlaps both with compute. No collective is written by hand, same
philosophy as the rest of ``parallel/``.

Composes with the existing layouts: on a hybrid (data × model) mesh,
``transformer_tp_shardings`` can own the attention/MLP kernels while this
module shards everything else over ``data``.

Validated by gradient-equivalence vs replicated DP on the 8-virtual-device
CPU mesh (``tests/test_fsdp.py``) and pinned by the ninth
``__graft_entry__.dryrun_multichip`` pass.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "fsdp_shardings",
    "shard_fsdp",
    "per_device_bytes",
    "replicated_bytes",
]


def _leaf_spec(shape: tuple[int, ...], size: int, n: int,
               axis_name: str, min_shard_elems: int) -> P:
    """Shard the largest axis divisible by the mesh size; else replicate.

    Tiny leaves (biases, LayerNorm scales, scalars like the optimizer step
    count) stay replicated — sharding them buys nothing and costs a gather.
    """
    if size < min_shard_elems:
        return P()
    divisible = [i for i, d in enumerate(shape) if d % n == 0 and d >= n]
    if not divisible:
        return P()
    best = max(divisible, key=lambda i: shape[i])
    parts: list = [None] * len(shape)
    parts[best] = axis_name
    return P(*parts)


def fsdp_shardings(
    tree,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    min_shard_elems: int = 2**11,
):
    """Pytree of ``NamedSharding`` giving ``tree`` a ZeRO-3 layout.

    Works on concrete arrays and on ``jax.ShapeDtypeStruct`` trees (so
    layouts can be planned from ``jax.eval_shape`` without allocating — how
    the vit_l_16 test sizes a 0.3 B-param trunk on CPU). Apply the SAME
    function to params, gradients, and optimizer state: the rule depends
    only on leaf shape, so AdamW's ``mu``/``nu`` land on exactly their
    param's layout and scalar counts stay replicated.
    """
    n = math.prod(
        mesh.shape[a] for a in
        (axis_name if isinstance(axis_name, tuple) else (axis_name,))
    )

    def leaf_sharding(leaf):
        return NamedSharding(
            mesh,
            _leaf_spec(tuple(leaf.shape), int(np.prod(leaf.shape) or 1), n,
                       axis_name, min_shard_elems),
        )

    return jax.tree.map(leaf_sharding, tree)


def shard_fsdp(tree, mesh: Mesh, *, axis_name: str = "data",
               min_shard_elems: int = 2**11):
    """Place a pytree (params / opt state) with its FSDP layout."""
    return jax.device_put(
        tree,
        fsdp_shardings(tree, mesh, axis_name=axis_name,
                       min_shard_elems=min_shard_elems),
    )


def _tree_bytes(tree, per_leaf) -> int:
    leaves = jax.tree.leaves(tree)
    return int(sum(per_leaf(l) for l in leaves))


def per_device_bytes(tree, shardings) -> int:
    """Bytes ONE device holds under ``shardings`` (abstract or concrete).

    ``tree`` may be arrays or ``ShapeDtypeStruct``s; ``shardings`` the
    matching pytree from :func:`fsdp_shardings`. Used by tests to assert
    the memory claim rather than take it on faith.
    """
    flat_t, _ = jax.tree.flatten(tree)
    flat_s, _ = jax.tree.flatten(shardings)
    total = 0
    for leaf, sh in zip(flat_t, flat_s):
        spec = sh.spec
        shards = 1
        for axis, part in enumerate(spec):
            if part is None:
                continue
            names = part if isinstance(part, tuple) else (part,)
            k = math.prod(sh.mesh.shape[nm] for nm in names)
            shards *= k
        total += leaf.size * leaf.dtype.itemsize // shards
    return int(total)


def replicated_bytes(tree) -> int:
    """Bytes one device holds when ``tree`` is fully replicated."""
    return _tree_bytes(tree, lambda l: l.size * l.dtype.itemsize)
