"""GPipe-style pipeline parallelism over the transformer trunk.

The reference is single-process single-GPU (SURVEY.md §2 — no distribution
anywhere); pipeline parallelism is part of the TPU rebuild's scaling surface,
alongside the data/tensor layouts in :mod:`pointvit_tpu.parallel.mesh`. The
trunk of every model family here is a stack of identical blocks
(``blocks_0 .. blocks_{L-1}``: `nn/vit.py::APFBlock/ViTBlock/
SerialAdapterBlock`), which is exactly the shape pipelining wants: stack the
per-block parameter trees on a leading axis, shard contiguous groups of
blocks over a ``pipe`` mesh axis, and stream microbatches through the ring.

TPU-native formulation: one ``shard_map`` program over the mesh; activations
move stage-to-stage with ``lax.ppermute`` (a single ICI hop on a physical
ring); the schedule is a ``lax.scan`` over ``n_microbatches + n_stages - 1``
ticks so the whole pipeline — fill, steady state, drain — is one compiled
XLA program with static shapes. During fill/drain, off-schedule devices
compute on zeros (SPMD executes every tick everywhere); their results are
masked out of the output buffer, so correctness never depends on the bubble
and autodiff zeroes the garbage cotangents through the same masks.

Composes with data parallelism: pass ``data_axis`` and a 2-D mesh — batches
shard over ``data``, block groups over ``pipe``, and XLA emits the grad
all-reduce over ``data`` exactly as in the pure-DP path. Differentiable end
to end (``ppermute`` transposes to the reverse ring), so the same function
serves inference and the training step; ``remat=True`` checkpoints each
block application, the standard GPipe memory trade.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stack_block_params", "unstack_block_params", "pipeline_blocks"]


def stack_block_params(params: dict, prefix: str = "blocks_"):
    """Stack per-block param trees ``params[f'{prefix}{i}']`` on a new axis 0.

    All trunk blocks share one tree structure (they are instances of the same
    module), so the result is a single pytree whose every leaf has leading
    dimension ``L`` = number of blocks. Returns ``(stacked, L)``.
    """
    names = sorted(
        (k for k in params if k.startswith(prefix) and k[len(prefix):].isdigit()),
        key=lambda k: int(k[len(prefix):]),
    )
    if not names:
        raise ValueError(f"no '{prefix}*' entries in params")
    trees = [params[k] for k in names]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    return stacked, len(names)


def unstack_block_params(stacked, prefix: str = "blocks_") -> dict:
    """Inverse of :func:`stack_block_params` (for checkpoint round-trips)."""
    length = jax.tree.leaves(stacked)[0].shape[0]
    return {
        f"{prefix}{i}": jax.tree.map(lambda x: x[i], stacked)
        for i in range(length)
    }


def pipeline_blocks(
    block_apply: Callable[[Any, jax.Array], jax.Array],
    stacked_params,
    tokens: jax.Array,
    mesh: Mesh,
    *,
    n_microbatches: int,
    pipe_axis: str = "pipe",
    data_axis: str | None = None,
    remat: bool = False,
) -> jax.Array:
    """Apply ``L`` stacked blocks to ``tokens`` pipelined over ``pipe_axis``.

    ``block_apply(one_block_params, x) -> x`` applies a single trunk block
    (e.g. ``lambda p, x: block.apply({'params': p}, x)``); the ``L`` blocks
    are split into ``n_stages = mesh.shape[pipe_axis]`` contiguous groups,
    one per device along the pipe axis. The batch is cut into
    ``n_microbatches`` microbatches that stream through the stages on a
    GPipe schedule; bigger ``n_microbatches`` shrinks the pipeline bubble
    (fraction ``(n_stages-1) / (n_microbatches + n_stages - 1)``) at the
    cost of smaller per-tick matmuls — keep microbatches MXU-sized.

    Constraints (static shapes, checked eagerly): ``L % n_stages == 0`` and
    per-device batch divisible by ``n_microbatches``.
    """
    n_stages = mesh.shape[pipe_axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    n_micro = n_microbatches
    dp = mesh.shape[data_axis] if data_axis else 1
    if tokens.shape[0] % (dp * n_micro):
        raise ValueError(
            f"batch {tokens.shape[0]} not divisible by data shards ({dp}) "
            f"x microbatches ({n_micro})"
        )

    apply_one = jax.checkpoint(block_apply) if remat else block_apply

    def shard_fn(p_local, toks):
        stage = jax.lax.axis_index(pipe_axis)
        mb = toks.shape[0] // n_micro
        micro = toks.reshape((n_micro, mb) + toks.shape[1:])
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, outs = carry
            # Stage s>0 consumes its predecessor's tick-(t-1) output: one
            # ICI ring hop. Stage 0 instead ingests microbatch t (clamped —
            # past n_micro it recycles garbage that the output mask drops).
            recv = jax.lax.ppermute(state, pipe_axis, perm)
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, n_micro - 1), keepdims=False
            )
            x = jnp.where(stage == 0, feed, recv)

            y = jax.lax.scan(
                lambda h, p: (apply_one(p, h).astype(h.dtype), None),
                x,
                p_local,
            )[0]

            # The last stage finishes microbatch m = t - (n_stages-1).
            m = t - (n_stages - 1)
            mc = jnp.clip(m, 0, n_micro - 1)
            valid = (stage == n_stages - 1) & (m >= 0)
            prev = jax.lax.dynamic_index_in_dim(outs, mc, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, prev), mc, 0
            )
            return (y, outs), None

        state = jnp.zeros_like(micro[0])
        outs = jnp.zeros_like(micro)
        (_, outs), _ = jax.lax.scan(
            tick, (state, outs), jnp.arange(n_micro + n_stages - 1)
        )
        # Only the last stage holds real outputs; psum over the (masked)
        # ring replicates them to every pipe rank for the head/loss.
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            pipe_axis,
        )
        return outs.reshape(toks.shape)

    token_spec = P(data_axis) if data_axis else P()
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(pipe_axis), token_spec),
        out_specs=token_spec,
        check_vma=False,
    )
    return fn(stacked_params, tokens)
