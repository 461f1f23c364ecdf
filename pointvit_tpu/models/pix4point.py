"""Pix4Point: progressive point-patch tokenizer → pretrained 2D ViT backbone.

Capability rebuild of ``src/models/pix4point.py``. Pipeline: P3Embed
(FPS+kNN conv tokenizer, 2048 → 512 tokens) → linear proj to ViT width →
learned 3D positional MLP → prepend cls token → 12 standard ViT blocks with
the positional embedding *re-added at every block* (pix4point.py:254-255) →
final LN → global feature = concat(max-pool over tokens, cls token) → MLP
head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointvit_tpu.nn.heads import ClsHead
from pointvit_tpu.nn.moe import MoEViTBlock
from pointvit_tpu.nn.pointnet import P3Embed, PosEmbedMLP
from pointvit_tpu.nn.vit import ViTBlock

__all__ = ["PointViT", "Pix4Point", "pix4point_trainable_mask", "VIT_PRESETS"]

# depth / heads / embed presets for the timm backbones the reference names
# (train_pix4point.py:7, vit.py:57).
VIT_PRESETS = {
    "vit_small_patch16_384.augreg_in21k_ft_in1k": dict(embed_dim=384, depth=12, num_heads=6),
    "vit_small_patch16_384": dict(embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch16_384.augreg_in21k_ft_in1k": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_base_patch16_384": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12),
}


class PointViT(nn.Module):
    """Point tokenizer + ViT trunk returning the global classification feature.

    Reference: ``PointViT`` (pix4point.py:194-291). ``global_features``
    follows the reference's iteration order over ``'max,cls'`` — max-pooled
    tokens first, then the cls token (pix4point.py:260-271).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    k_neighbors: int = 16
    in_channels: int = 3
    global_features: str = "max,cls"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # None = auto; 'xla' forces the XLA FPS/kNN/attention paths end-to-end.
    implementation: str | None = None
    # Beyond-reference capacity scale-out (docs/SCALING.md "Expert
    # parallelism"): 0 = dense MLPs everywhere (reference parity). With
    # moe_experts > 0, every ``moe_every``-th block's MLP is a
    # mixture-of-experts (nn/moe.py); pass ``moe_mesh`` (+ axis names) to run
    # it expert-parallel. Aux losses are sown under intermediates/aux_loss —
    # collect with nn.collect_moe_aux_loss.
    moe_experts: int = 0
    moe_every: int = 2
    moe_top_k: int = 2
    moe_normalize_gates: bool = False
    moe_mesh: object | None = None
    moe_expert_axis: str = "expert"
    moe_data_axis: str | None = None

    @nn.compact
    def __call__(self, points: jax.Array, features: jax.Array | None = None, *, train: bool = False) -> jax.Array:
        B = points.shape[0]
        if features is None:
            features = points  # reference clones coords as features (pix4point.py:237-238)

        # Block-level implementation values ('fused'/'attn') don't apply to
        # the tokenizer's FPS/kNN samplers — those only know 'xla' vs auto.
        tok_impl = self.implementation if self.implementation == "xla" else None
        centers, tokens = P3Embed(
            in_channels=self.in_channels,
            k=self.k_neighbors,
            dtype=self.dtype,
            implementation=tok_impl,
            name="patch_embed",
        )(points, features, train=train)

        x = nn.Dense(
            self.embed_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="proj",
        )(tokens)
        pos = PosEmbedMLP(self.embed_dim, dtype=self.dtype, name="pos_embed")(centers)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, self.embed_dim)
        )
        cls_pos = self.param(
            "cls_pos", nn.initializers.normal(stddev=0.02), (1, 1, self.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)).astype(x.dtype), x], axis=1
        )
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (B, 1, self.embed_dim)).astype(pos.dtype), pos], axis=1
        )

        # The positional embedding is re-added before *every* block
        # (pix4point.py:254-255), not just once. Passing it as the block's
        # ``pos`` keeps the add inside the fused kernel on the TPU inference
        # path (x+pos never materializes in HBM); the XLA path adds it at the
        # top of the block — identical math either way.
        for i in range(self.depth):
            if self.moe_experts and i % self.moe_every == self.moe_every - 1:
                x = MoEViTBlock(
                    self.num_heads,
                    num_experts=self.moe_experts,
                    top_k=self.moe_top_k,
                    normalize_gates=self.moe_normalize_gates,
                    dropout_rate=self.dropout_rate,
                    dtype=self.dtype,
                    mesh=self.moe_mesh,
                    expert_axis=self.moe_expert_axis,
                    data_axis=self.moe_data_axis,
                    implementation=self.implementation,
                    name=f"blocks_{i}",
                )(x, pos=pos, deterministic=not train)
                continue
            x = ViTBlock(
                self.num_heads,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                implementation=self.implementation,
                name=f"blocks_{i}",
            )(x, pos=pos, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)

        token_features = x[:, 1:, :]
        feats = []
        for token_type in self.global_features.split(","):
            if "cls" in token_type:
                feats.append(x[:, 0, :])
            if "max" in token_type:
                feats.append(jnp.max(token_features, axis=1))
        return jnp.concatenate(feats, axis=-1)


class Pix4Point(nn.Module):
    """Full Pix4Point classifier (pix4point.py:328-437)."""

    num_classes: int = 15
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    k_neighbors: int = 16
    dtype: jnp.dtype = jnp.float32
    # None = auto; 'xla' forces the XLA paths end-to-end (parity debugging).
    implementation: str | None = None
    # Beyond-reference MoE trunk (see PointViT.moe_*): 0 = reference parity.
    moe_experts: int = 0
    moe_every: int = 2
    moe_top_k: int = 2
    moe_normalize_gates: bool = False
    moe_mesh: object | None = None
    moe_expert_axis: str = "expert"
    moe_data_axis: str | None = None

    @classmethod
    def from_pretrained_name(cls, pretrained_model: str, **kwargs) -> "Pix4Point":
        """Build with the depth/heads/width of a named timm backbone."""
        preset = VIT_PRESETS.get(pretrained_model)
        if preset is None:
            raise ValueError(f"unknown backbone preset: {pretrained_model!r}")
        merged = {**preset, **kwargs}
        return cls(**merged)

    @nn.compact
    def __call__(self, points: jax.Array, *, train: bool = False) -> jax.Array:
        feat = PointViT(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            k_neighbors=self.k_neighbors,
            dtype=self.dtype,
            implementation=self.implementation,
            moe_experts=self.moe_experts,
            moe_every=self.moe_every,
            moe_top_k=self.moe_top_k,
            moe_normalize_gates=self.moe_normalize_gates,
            moe_mesh=self.moe_mesh,
            moe_expert_axis=self.moe_expert_axis,
            moe_data_axis=self.moe_data_axis,
            name="model",
        )(points, train=train)
        return ClsHead(self.num_classes, dtype=self.dtype, name="cls_head")(
            feat, train=train
        )


def pix4point_trainable_mask(params, *, frozen: bool = False):
    """Trainable-parameter mask. ``frozen=True`` freezes the ViT trunk
    (blocks + final norm — reference pattern ``'vit' in name``,
    pix4point.py:229-232) while the tokenizer, proj, pos-embed MLP, cls
    token/pos, and head train.

    cls_token/cls_pos stay TRAINABLE in frozen mode: the reference registers
    the shared cls parameters directly on PointViT (pix4point.py:226-227),
    so deduped ``named_parameters()`` yields them under their un-prefixed
    names first and ``'vit' in name`` never matches them."""
    import jax.tree_util as jtu

    if not frozen:
        return jax.tree.map(lambda _: True, params)

    frozen_markers = ("blocks_", "/norm/")

    def trainable(path) -> bool:
        keys = "/" + "/".join(
            p.key for p in path if isinstance(p, jtu.DictKey)
        ) + "/"
        return not any(m in keys for m in frozen_markers)

    flat = jtu.tree_flatten_with_path(params)[0]
    return jtu.tree_unflatten(
        jtu.tree_structure(params), [trainable(p) for p, _ in flat]
    )
