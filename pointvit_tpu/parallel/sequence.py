"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

The reference is single-process single-GPU (SURVEY.md §2 — no distribution
anywhere); sequence parallelism completes the rebuild's scaling surface
alongside data/tensor (:mod:`pointvit_tpu.parallel.mesh`) and pipeline
(:mod:`pointvit_tpu.parallel.pipeline`) layouts. It targets token counts
that outgrow one chip's HBM — the (B, H, S, S) attention probability
tensor is the first thing to blow up as point clouds grow (Pix4Point
S=513 today; dense scene-scale clouds are 10-100×).

TPU-native formulation (the ring-attention construction of Liu et al.,
arXiv:2310.01889, on JAX collectives): every array stays sharded on the
sequence axis — queries never move. Each device holds its local Q block
and rotates the K/V blocks around the ring with ``lax.ppermute`` (one ICI
hop per step, overlappable with the block matmuls), folding each visiting
block into numerically-stable online-softmax accumulators (running max
``m``, normalizer ``l``, weighted sum ``acc`` — the flash-attention
recurrence). After ``n_seq`` steps every query has attended to every key
with no (S, S) global materialization and no all-gather. The scan is
differentiable (``ppermute`` transposes to the reverse ring), so the same
function serves training; accumulators run in f32 regardless of input
dtype, matching the Pallas forward kernels' policy (ops/pallas_attention.py).

Composes with data parallelism: pass ``data_axis`` and a 2-D mesh — batch
shards over ``data``, sequence over ``seq``. Head-sharding (TP) of the
same attention lives in ``parallel.mesh.transformer_tp_shardings``; the
two compose in principle (shard H inside the shard_map body) but this
model family's H=12 heads make TP-over-heads the cheaper first axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_mha", "ulysses_mha"]


def ring_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    data_axis: str | None = None,
) -> jax.Array:
    """Exact MHA with q/k/v/out sharded on the sequence axis.

    ``q, k, v: (B, S, H, D) -> (B, S, H, D)`` — same contract and layout as
    ``ops.fused_mha`` / the einsum reference, but S is sharded over
    ``mesh.shape[seq_axis]`` devices and no device ever materializes more
    than a ``(B, H, S/n, S/n)`` logits block. Requires ``S % n_seq == 0``
    (and ``B % n_data == 0`` when ``data_axis`` is given): static shapes.
    """
    n_seq = mesh.shape[seq_axis]
    dp = mesh.shape[data_axis] if data_axis else 1
    B, S, H, D = q.shape
    if S % n_seq:
        raise ValueError(f"sequence {S} not divisible by {n_seq} seq shards")
    if B % dp:
        raise ValueError(f"batch {B} not divisible by {dp} data shards")

    def local_fn(q_blk, k_blk, v_blk):
        # q_blk: (Bl, Sl, H, D) — fixed; k/v blocks rotate around the ring.
        scale = D**-0.5
        out_dtype = q_blk.dtype
        qf = q_blk.astype(jnp.float32)
        # Rotate so each device sees every K/V block after n_seq steps:
        # send to the previous rank, receive from the next.
        perm = [(i, (i - 1) % n_seq) for i in range(n_seq)]
        bl, sl = q_blk.shape[0], q_blk.shape[1]

        def step(carry, _):
            kb, vb, m, l, acc = carry
            s = jnp.einsum(
                "bshd,bthd->bhst", qf, kb.astype(jnp.float32)
            ) * scale  # (Bl, H, Sl, Skl)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhst,bthd->bhsd", p, vb.astype(jnp.float32)
            )
            kb = jax.lax.ppermute(kb, seq_axis, perm)
            vb = jax.lax.ppermute(vb, seq_axis, perm)
            return (kb, vb, m_new, l_new, acc_new), None

        m0 = jnp.full((bl, H, sl), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((bl, H, sl), jnp.float32)
        acc0 = jnp.zeros((bl, H, sl, D), jnp.float32)
        (_, _, _, l, acc), _ = jax.lax.scan(
            step, (k_blk, v_blk, m0, l0, acc0), None, length=n_seq
        )
        out = acc / l[..., None]  # (Bl, H, Sl, D)
        return out.transpose(0, 2, 1, 3).astype(out_dtype)

    spec = P(data_axis, seq_axis) if data_axis else P(None, seq_axis)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def ulysses_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    data_axis: str | None = None,
) -> jax.Array:
    """Exact MHA, sequence-sharded, via head-scatter all-to-alls (Ulysses).

    Same contract as :func:`ring_mha` (``(B, S, H, D) -> (B, S, H, D)``, S
    sharded over ``seq_axis``) but a different collective pattern (the
    DeepSpeed-Ulysses construction, arXiv:2309.14509): one ``all_to_all``
    turns the sequence sharding into a *head* sharding (each device gets the
    full S for H/n heads), attention runs locally with a plain softmax, and
    a second ``all_to_all`` restores sequence sharding. Two all-to-alls of
    the qkv/out tensors vs ring's n_seq activation hops — cheaper when
    ``H % n_seq == 0`` and the full (S, S) per-head score block still fits
    (ring never materializes it; Ulysses does, for H/n heads). Requires
    ``S % n_seq == 0`` and ``H % n_seq == 0``.
    """
    n_seq = mesh.shape[seq_axis]
    dp = mesh.shape[data_axis] if data_axis else 1
    B, S, H, D = q.shape
    if S % n_seq:
        raise ValueError(f"sequence {S} not divisible by {n_seq} seq shards")
    if H % n_seq:
        raise ValueError(f"heads {H} not divisible by {n_seq} seq shards")
    if B % dp:
        raise ValueError(f"batch {B} not divisible by {dp} data shards")

    def local_fn(q_blk, k_blk, v_blk):
        # (Bl, S/n, H, D) --a2a--> (Bl, S, H/n, D): scatter heads, gather seq.
        def seq_to_heads(x):
            return jax.lax.all_to_all(
                x, seq_axis, split_axis=2, concat_axis=1, tiled=True
            )

        def heads_to_seq(x):
            return jax.lax.all_to_all(
                x, seq_axis, split_axis=1, concat_axis=2, tiled=True
            )

        qh = seq_to_heads(q_blk).astype(jnp.float32)
        kh = seq_to_heads(k_blk).astype(jnp.float32)
        vh = seq_to_heads(v_blk).astype(jnp.float32)
        logits = jnp.einsum("bshd,bthd->bhst", qh, kh) * (D**-0.5)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", w, vh).astype(q_blk.dtype)
        return heads_to_seq(out)

    spec = P(data_axis, seq_axis) if data_axis else P(None, seq_axis)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
