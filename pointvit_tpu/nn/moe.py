"""Mixture-of-experts layers over the expert-parallel core.

Model-level surface for :mod:`pointvit_tpu.parallel.expert`. The reference
has no MoE anywhere (SURVEY.md §2); these modules exist for capacity
scale-out beyond this family — the transformer MLP is 2/3 of a ViT block's
params, and E experts of which each token visits ``top_k`` grow capacity
~E× at ~constant per-token FLOPs (docs/SCALING.md "Expert parallelism").

- :class:`MoEMlp` — drop-in for :class:`pointvit_tpu.nn.layers.Mlp`: router
  + E stacked expert FFNs, dispatched with the GShard all_to_all layout when
  a mesh is given (dense single-device math otherwise — same results). The
  Switch load-balance aux loss is surfaced with flax ``sow``; training
  steps read it via ``mutable=["intermediates"]`` and add
  ``aux_weight · mean(aux)`` to the loss (see :func:`collect_moe_aux_loss`).
- :class:`MoEViTBlock` — the standard pre-norm block
  (:class:`pointvit_tpu.nn.vit.ViTBlock` layout: norm1/attn/norm2/mlp, the
  optional per-block positional re-add) with the MLP widened to experts.

Param layout keeps the experts stacked on a leading E axis, so the EP
placement is a single ``P('expert')`` per leaf and a dense-checkpoint
upcycle (replicating a trained fc1/fc2 into all experts) is one broadcast.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pointvit_tpu.nn.layers import Attention, DropPath
from pointvit_tpu.parallel.expert import fan_in_normal_init, moe_ffn

__all__ = ["MoEMlp", "MoEViTBlock", "collect_moe_aux_loss"]


class MoEMlp(nn.Module):
    """Mixture-of-experts transformer MLP (router + E expert FFNs).

    Drop-in for :class:`~pointvit_tpu.nn.layers.Mlp`: (B, S, M) → (B, S, M).
    With ``mesh`` set, experts and tokens shard over ``expert_axis``
    (GShard all_to_all dispatch, see parallel/expert.py); without, the same
    math runs on one device. The aux loss is sown under
    ``intermediates/aux_loss``.
    """

    num_experts: int
    hidden_features: int
    top_k: int = 2
    capacity_factor: float = 2.0
    normalize_gates: bool = False
    dtype: jnp.dtype = jnp.float32
    mesh: Mesh | None = None
    expert_axis: str = "expert"
    data_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        del deterministic  # routing is deterministic; no dropout inside
        m, f, e = x.shape[-1], self.hidden_features, self.num_experts
        params = {
            "gate": self.param("gate", fan_in_normal_init(m), (m, e)),
            "w1": self.param("w1", fan_in_normal_init(m), (e, m, f)),
            "b1": self.param("b1", nn.initializers.zeros, (e, f)),
            "w2": self.param("w2", fan_in_normal_init(f), (e, f, m)),
            "b2": self.param("b2", nn.initializers.zeros, (e, m)),
        }
        params = jax.tree.map(lambda p: p.astype(self.dtype), params)
        # Init traces run on whatever toy batch the caller shapes (often 1),
        # which need not divide the mesh; the dense path creates identical
        # params, so EP placement only engages on real calls.
        mesh = None if self.is_initializing() else self.mesh
        out, aux = moe_ffn(
            x.astype(self.dtype),
            params,
            mesh,
            expert_axis=self.expert_axis,
            data_axis=self.data_axis,
            top_k=self.top_k,
            capacity_factor=self.capacity_factor,
            normalize_gates=self.normalize_gates,
            # default activation: exact GELU, matching nn.layers.Mlp
        )
        self.sow("intermediates", "aux_loss", aux)
        return out


class MoEViTBlock(nn.Module):
    """Pre-norm ViT block with a mixture-of-experts MLP.

    Same layout and contract as :class:`pointvit_tpu.nn.vit.ViTBlock`
    (norm1/attn/norm2/mlp, optional per-block ``pos`` re-add) with the MLP
    replaced by :class:`MoEMlp`. Tokens stay the only sharded activation —
    attention runs data-parallel; the expert axis engages inside the MLP.
    """

    num_heads: int
    num_experts: int
    mlp_ratio: float = 4.0
    top_k: int = 2
    capacity_factor: float = 2.0
    normalize_gates: bool = False
    drop_path_rate: float = 0.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    mesh: Mesh | None = None
    expert_axis: str = "expert"
    data_axis: str | None = None
    implementation: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        pos: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        dim = x.shape[-1]
        if pos is not None:
            x = x + pos.astype(x.dtype)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(
            self.num_heads,
            dtype=self.dtype,
            implementation="einsum" if self.implementation == "xla" else None,
            name="attn",
        )(h)
        x = x + DropPath(self.drop_path_rate)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = MoEMlp(
            self.num_experts,
            int(dim * self.mlp_ratio),
            top_k=self.top_k,
            capacity_factor=self.capacity_factor,
            normalize_gates=self.normalize_gates,
            dtype=self.dtype,
            mesh=self.mesh,
            expert_axis=self.expert_axis,
            data_axis=self.data_axis,
            name="mlp",
        )(h, deterministic=deterministic)
        # Routing carries no dropout (it would decohere the dispatch); the
        # block-level MLP dropout lands on the combined expert output instead,
        # keeping train-time regularization symmetric with the dense blocks.
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return x + DropPath(self.drop_path_rate)(h, deterministic=deterministic)


def collect_moe_aux_loss(intermediates) -> jax.Array:
    """Mean of every sown ``aux_loss`` in an intermediates collection.

    Usage::

        (logits, inter) = model.apply(vars, x, mutable=["intermediates"])
        loss = task_loss(logits) + 0.01 * collect_moe_aux_loss(inter)
    """
    leaves = [
        v
        for path, v in jax.tree_util.tree_flatten_with_path(intermediates)[0]
        if any(
            getattr(p, "key", None) == "aux_loss" for p in path
        )
    ]
    if not leaves:
        return jnp.asarray(0.0, jnp.float32)
    return jnp.mean(jnp.stack([jnp.asarray(l, jnp.float32).reshape(()) for l in leaves]))
