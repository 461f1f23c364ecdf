"""Expert parallelism: mixture-of-experts FFN over an ``expert`` mesh axis.

The reference is single-process single-GPU with no distribution and no MoE
(SURVEY.md §2); expert parallelism completes the rebuild's scaling surface
alongside data/tensor (:mod:`pointvit_tpu.parallel.mesh`), pipeline
(:mod:`pointvit_tpu.parallel.pipeline`) and sequence
(:mod:`pointvit_tpu.parallel.sequence`) layouts. It targets parameter counts
that outgrow replication: the transformer MLP — 2/3 of a ViT block's params —
is widened into E independent experts of which each token visits ``top_k``,
so capacity grows ~E× at ~constant per-token FLOPs.

TPU-native formulation (the GShard construction, arXiv:2006.16668, on JAX
collectives — no torch.distributed analogue exists in the reference):

- **Routing is dense linear algebra, not gather/scatter.** Each device builds
  a (T, E, C) one-hot *dispatch* tensor from its local tokens' top-k router
  choices (position-in-expert via a cumsum; tokens past an expert's capacity
  C are dropped, standard GShard semantics) and materializes the expert
  inputs as one einsum ``tec,tm->ecm`` — an MXU contraction. The return trip
  is the transposed einsum weighted by router gates. Scatter-free routing is
  the same design choice as the renderer's hat-matrix splat (ops/render.py):
  XLA scatters with duplicate indices serialize on TPU; matmuls don't.
- **One ``all_to_all`` each way over the ``expert`` axis.** The (E, C, M)
  dispatch buffer is exchanged so each device holds the tokens for its E/n
  local experts — the canonical EP collective, riding ICI. Both the a2a and
  the one-hot contractions are linear, so the whole layer is exactly
  differentiable (the VJP is the reverse a2a and transposed einsums; router
  weights get gradients through the gate-weighted combine).
- **The expert axis doubles as a data axis for activations** (tokens shard
  over ``expert_axis`` too), composing with an optional outer ``data_axis``
  exactly like :func:`~pointvit_tpu.parallel.sequence.ring_mha`.

The auxiliary load-balance loss is the Switch/GShard estimator
``E · Σ_e f_e · p_e`` (fraction of tokens routed to e × mean router prob of
e), psum-averaged over the mesh so every device sees the global value.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "moe_ffn",
    "fan_in_normal_init",
    "init_moe_params",
    "moe_load_balance_loss",
    "upcycle_dense_mlp",
]


def fan_in_normal_init(fan_in: int):
    """``normal / sqrt(fan_in)`` initializer (flax Dense-compatible scale),
    shared by :func:`init_moe_params` and the flax :class:`~pointvit_tpu.nn.moe.MoEMlp`."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * (1.0 / math.sqrt(fan_in))

    return init


def init_moe_params(
    key: jax.Array,
    embed_dim: int,
    hidden_dim: int,
    num_experts: int,
    dtype=jnp.float32,
) -> dict:
    """Router + per-expert FFN params as a plain pytree.

    Experts are stacked on a leading E axis so the EP layout is a single
    ``P('expert')`` sharding per leaf (and the dense fallback one batched
    einsum); LeCun-normal fan-in init matches flax.linen.Dense defaults.
    """
    k_gate, k1, k2 = jax.random.split(key, 3)
    e, m, f = num_experts, embed_dim, hidden_dim
    return {
        "gate": fan_in_normal_init(m)(k_gate, (m, e), dtype),
        "w1": fan_in_normal_init(m)(k1, (e, m, f), dtype),
        "b1": jnp.zeros((e, f), dtype),
        "w2": fan_in_normal_init(f)(k2, (e, f, m), dtype),
        "b2": jnp.zeros((e, m), dtype),
    }


def upcycle_dense_mlp(
    key: jax.Array,
    fc1_kernel: jax.Array,
    fc1_bias: jax.Array,
    fc2_kernel: jax.Array,
    fc2_bias: jax.Array,
    num_experts: int,
    *,
    router_scale: float = 1e-2,
) -> dict:
    """Sparse upcycling: a trained dense MLP becomes E identical experts.

    The warm-start of Komatsuzaki et al. (arXiv:2212.05055): every expert is
    initialized to the trained fc1/fc2 and the router to small random values
    (exactly zero would tie-break every token to expert 0 and collapse the
    balance loss' gradient). With ``moe_ffn(..., normalize_gates=True)`` the
    upcycled layer reproduces the dense MLP's output *exactly* until the
    experts diverge — the gates sum to 1 over the top-k picks and every
    expert computes the same function.
    """
    e = num_experts
    m = fc1_kernel.shape[0]
    return {
        "gate": (
            jax.random.normal(key, (m, e)) * (router_scale / math.sqrt(m))
        ).astype(fc1_kernel.dtype),
        "w1": jnp.broadcast_to(fc1_kernel[None], (e, *fc1_kernel.shape)),
        "b1": jnp.broadcast_to(fc1_bias[None], (e, *fc1_bias.shape)),
        "w2": jnp.broadcast_to(fc2_kernel[None], (e, *fc2_kernel.shape)),
        "b2": jnp.broadcast_to(fc2_bias[None], (e, *fc2_bias.shape)),
    }


def _route(gate_logits: jax.Array, capacity: int, top_k: int, normalize_gates: bool):
    """Top-k routing with per-expert capacity.

    gate_logits: (T, E) → dispatch (T, E, C) one-hot, combine (T, E, C)
    gate-weighted, plus (f_e, p_e) for the load-balance loss. Slots are
    assigned k-major (all k=0 choices claim capacity before any k=1), the
    GShard priority order.
    """
    t, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)

    masks = []
    gates = []
    remaining = probs
    for _ in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)  # (T,)
        mask = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # (T, E)
        masks.append(mask)
        gates.append(jnp.sum(probs * mask, axis=-1))  # (T,) router prob of pick
        remaining = remaining * (1.0 - mask)

    if normalize_gates:
        denom = sum(gates) + 1e-9
        gates = [g / denom for g in gates]

    # Position-in-expert: one cumsum over the k-major flattened assignments.
    flat = jnp.concatenate(masks, axis=0)  # (K·T, E)
    pos = jnp.cumsum(flat, axis=0) - flat  # slots already taken before this one
    pos = jnp.sum(pos * flat, axis=-1).reshape(top_k, t).astype(jnp.int32)  # (K, T)
    keep = pos < capacity

    dispatch = jnp.zeros((t, e, capacity), jnp.float32)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    for k in range(top_k):
        slot = jax.nn.one_hot(
            jnp.where(keep[k], pos[k], capacity), capacity, dtype=jnp.float32
        )  # overflow → all-zero row
        hot = masks[k][:, :, None] * slot[:, None, :]  # (T, E, C)
        dispatch = dispatch + hot
        combine = combine + hot * gates[k][:, None, None]

    # Switch/GShard load-balance terms over the k=0 (primary) assignments.
    f_e = jnp.mean(masks[0], axis=0)  # fraction of tokens whose top-1 is e
    p_e = jnp.mean(probs, axis=0)  # mean router prob of e
    return dispatch, combine, f_e, p_e


def _expert_ffn(xin: jax.Array, params: dict, activation) -> jax.Array:
    """Per-expert MLP on dispatched tokens. xin: (E?, C', M) → same shape."""
    h = jnp.einsum("ecm,emf->ecf", xin, params["w1"]) + params["b1"][:, None, :]
    h = activation(h)
    return jnp.einsum("ecf,efm->ecm", h, params["w2"]) + params["b2"][:, None, :]


def moe_load_balance_loss(f_e: jax.Array, p_e: jax.Array) -> jax.Array:
    """Switch aux loss ``E · Σ_e f_e · p_e`` (=1 at perfect balance)."""
    return f_e.shape[-1] * jnp.sum(f_e * p_e)


def moe_ffn(
    x: jax.Array,
    params: dict,
    mesh: Mesh | None = None,
    *,
    expert_axis: str = "expert",
    data_axis: str | None = None,
    top_k: int = 2,
    capacity_factor: float = 2.0,
    normalize_gates: bool = False,
    activation=functools.partial(jax.nn.gelu, approximate=False),
):
    """Mixture-of-experts FFN; drop-in for a transformer MLP.

    Args:
        x: (B, S, M) tokens.
        params: pytree from :func:`init_moe_params` (E experts stacked on a
            leading axis).
        mesh: if given, runs expert-parallel — experts shard over
            ``expert_axis`` (requires ``E % n == 0``) and tokens shard over
            the same axis (``B % n == 0``; plus ``data_axis`` if given),
            with one all_to_all each way. ``None`` runs the identical math
            on one device (the equivalence oracle and the small-scale path).
        top_k: experts per token (1 = Switch, 2 = GShard default).
        capacity_factor: per-expert slots = ceil(cf · T · K / E) with T the
            *per-device* token count; tokens over capacity are dropped
            (their FFN delta is zero — callers keep the residual skip).
        normalize_gates: divide each token's top-k gates by their sum
            (GShard top-2 convention; required for exact output preservation
            with :func:`upcycle_dense_mlp`). Default False = Switch
            convention (raw router probabilities).
        activation: expert nonlinearity. Default exact (erf) GELU, matching
            :class:`pointvit_tpu.nn.layers.Mlp` — so upcycled dense weights
            compute the identical function.

    Returns:
        (out, aux) — out: (B, S, M) same dtype as x; aux: scalar f32
        load-balance loss (add ``~0.01 · aux`` to the training loss).
    """
    b, s, m = x.shape
    e = params["gate"].shape[-1]
    n = mesh.shape[expert_axis] if mesh is not None else 1
    dp = mesh.shape[data_axis] if (mesh is not None and data_axis) else 1
    if top_k > e:
        raise ValueError(f"top_k={top_k} exceeds {e} experts")
    if e % n:
        raise ValueError(f"{e} experts not divisible by {n} expert shards")
    if b % (n * dp):
        raise ValueError(f"batch {b} not divisible by {n * dp} token shards")
    t_local = (b // (n * dp)) * s
    capacity = max(1, math.ceil(capacity_factor * t_local * top_k / e))

    def local_fn(x_blk, p):
        bl = x_blk.shape[0]
        tokens = x_blk.reshape(bl * s, m)
        logits = tokens.astype(jnp.float32) @ p["gate"].astype(jnp.float32)
        dispatch, combine, f_e, p_e = _route(
            logits, capacity, top_k, normalize_gates
        )
        xin = jnp.einsum(
            "tec,tm->ecm", dispatch, tokens.astype(jnp.float32)
        )  # (E, C, M)
        experts = {k: v for k, v in p.items() if k != "gate"}
        if mesh is not None and n > 1:
            # (E, C, M) → (E/n, n·C, M): each device receives its local
            # experts' slots from every peer.
            xin = jax.lax.all_to_all(
                xin, expert_axis, split_axis=0, concat_axis=1, tiled=True
            )
            y = _expert_ffn(xin, experts, activation)
            y = jax.lax.all_to_all(
                y, expert_axis, split_axis=1, concat_axis=0, tiled=True
            )
        else:
            y = _expert_ffn(xin, experts, activation)
        out = jnp.einsum("tec,ecm->tm", combine, y)
        aux = moe_load_balance_loss(f_e, p_e)
        if mesh is not None:
            axes = (expert_axis,) + ((data_axis,) if data_axis else ())
            aux = jax.lax.pmean(aux, axes)
        return out.reshape(bl, s, m).astype(x_blk.dtype), aux

    if mesh is None:
        return local_fn(x, params)

    # Tokens shard over (data?, expert); experts (w1/b1/w2/b2) shard over
    # expert; the router is replicated (every device routes its own tokens).
    token_axes = (data_axis, expert_axis) if data_axis else (expert_axis,)
    tok_spec = P(token_axes if len(token_axes) > 1 else token_axes[0])
    param_specs = {
        "gate": P(),
        "w1": P(expert_axis),
        "b1": P(expert_axis),
        "w2": P(expert_axis),
        "b2": P(expert_axis),
    }
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(tok_spec, param_specs),
        out_specs=(tok_spec, P()),
        check_vma=False,
    )
    return fn(x, params)
