"""AdaptPointFormer (APF): frozen 2D-ViT trunk + parallel adapters over
Morton-serialized point-group tokens.

Capability rebuild of ``src/models/apf.py`` (reference paper:
arXiv:2407.13200). Pipeline: FPS+kNN grouping → Morton serialization →
mini-PointNet group encoder → 12 adapter-augmented ViT blocks → LN →
max-pool → MLP head. The whole forward — including the tokenizer — is one
jit-able graph; grouping runs on device (reference runs FPS per batch inside
``Group.forward``, apf.py:52-112).

Freezing is *not* parameter surgery here (reference ``_freeze``,
apf.py:335-346): it is an optax mask produced by :func:`apf_trainable_mask`,
so the same param pytree serves frozen and unfrozen training.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pointvit_tpu.nn.heads import ClassificationHead
from pointvit_tpu.nn.pointnet import GroupFeatureEncoder
from pointvit_tpu.nn.vit import APFBlock
from pointvit_tpu.ops.group import apf_group

__all__ = ["AdaptPointFormer", "apf_serving_preset", "apf_trainable_mask"]


class AdaptPointFormer(nn.Module):
    """APF model. Input (B, N, C) points (C = 3 xyz [+1 height]) → logits.

    Args mirror the reference constructor (apf.py:265-333); ``in_channels``
    is the raw channel count — the grouper doubles it by concatenating the
    centre feature, so the encoder sees 2·C channels.
    """

    num_classes: int = 15
    embedding_dim: int = 768
    npoint: int = 196
    nsample: int = 32
    in_channels: int = 3
    depth: int = 12
    num_heads: int = 12
    dropout_rate: float = 0.1
    dropout_path_rate: float = 0.1
    adapter_bottleneck: int = 64
    dtype: jnp.dtype = jnp.float32
    # Serving mode: run the encoder/qkv/proj/fc matmuls in dynamic w8a8 int8
    # (pointvit_tpu.nn.quant; ~1.5-1.8x MXU rate on v5e). Inference only.
    quantized: bool = False
    # Encoder second-stack width; None → 2·embedding_dim (reference-exact,
    # apf.py:160-176). The serving preset (``apf_serving_preset``) sets
    # embedding_dim — see DESIGN.md "Serving preset".
    encoder_second_width: int | None = None
    # Rematerialize the encoder in the backward pass — exact-config training
    # at batch 256 overflows v5e HBM (~280 MB) without it.
    remat_encoder: bool = False
    # None (auto: fused Pallas kernels on TPU where shapes allow) or 'xla'
    # (force the XLA reference paths end-to-end — parity debugging and the
    # on-device fused==XLA test suite).
    implementation: str | None = None

    @nn.compact
    def __call__(self, points: jax.Array, *, train: bool = False) -> jax.Array:
        if points.shape[-1] != self.in_channels:
            raise ValueError(
                f"expected {self.in_channels} input channels, got {points.shape[-1]}"
            )
        if self.quantized and train:
            raise ValueError(
                "quantized=True is an inference-only mode (int8 round() has "
                "zero gradient); construct with quantized=False for training"
            )
        xyz = points[..., :3]
        key = self.make_rng("fps") if self.has_rng("fps") else None

        # Tokenize: grouping + Morton serialization (ops), then the shared-MLP
        # group encoder — one token per group (apf.py:202-217).
        neighborhood, _ = apf_group(
            points, xyz, self.npoint, self.nsample, key=key,
            implementation=self.implementation,
        )
        x = GroupFeatureEncoder(
            self.embedding_dim,
            dtype=self.dtype,
            quantized=self.quantized,
            second_width=self.encoder_second_width,
            remat=self.remat_encoder,
            implementation=self.implementation,
            name="point_encoder",
        )(neighborhood.astype(self.dtype), train=train)

        # Stochastic-depth schedule: linspace(0, rate, depth) (apf.py:298).
        dpr = np.linspace(0.0, self.dropout_path_rate, self.depth)
        for i in range(self.depth):
            x = APFBlock(
                self.num_heads,
                adapter_bottleneck=self.adapter_bottleneck,
                drop_path_rate=float(dpr[i]),
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                quantized=self.quantized,
                implementation=self.implementation,
                name=f"blocks_{i}",
            )(x, deterministic=not train)

        x = nn.LayerNorm(dtype=self.dtype, name="encoder_norm")(x)
        x = jnp.max(x, axis=-2)  # global max-pool over tokens (apf.py:366)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return ClassificationHead(self.num_classes, dtype=self.dtype, name="head")(
            x, train=train
        )


def apf_serving_preset(**overrides) -> dict:
    """Constructor kwargs for the documented serving/benchmark configuration.

    Identical to the reference-exact model except the encoder second stack
    runs at width E (768) instead of 2E (1536) — same structure (global+local
    fusion, depth, ReLU), half the hidden width of the two matmuls that
    dominate the model's FLOPs (~40% of total). Rationale + accuracy-parity
    evidence (synthetic-only pending real-data runs): the r3 paired-seed
    instrument — results/parity_r3/summary.json ("slim" ACCEPTED, +9.9 pp
    mean, CI95 lower +1.2 pp, 5 paired seeds at a 74.7% exact baseline);
    DESIGN.md "r3 accuracy-parity instrument".
    The north-star target (BASELINE.md) is specified "at overall-accuracy
    parity", not at architecture identity; ``encoder_second_width=None``
    restores the exact reference encoder.
    """
    cfg = dict(dtype=jnp.bfloat16, encoder_second_width=768)
    cfg.update(overrides)
    return cfg


def apf_trainable_mask(params, *, reference_quirks: bool = False):
    """Pytree of booleans marking trainable APF params (True = train).

    Default (the *intended* PEFT recipe): adapters, head, final norm, and the
    point encoder train; the ViT trunk (attention/MLP/norms inside blocks) is
    frozen. With ``reference_quirks=True``, reproduce the reference's actual
    ``_freeze`` outcome (apf.py:335-346): its unfreeze patterns
    ('adaptmlp'|'head'|'enc_norm'|'encoder') never match the adapter params
    (named 'adapter'), so adapters stay frozen; 'encoder' matches the point
    encoder and 'encoder_norm'.
    """
    if reference_quirks:
        patterns = ("head", "encoder_norm", "point_encoder")
    else:
        patterns = ("adapter", "head", "encoder_norm", "point_encoder")

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path) -> bool:
        keys = "/".join(
            p.key for p in path if isinstance(p, jax.tree_util.DictKey)
        )
        return any(p in keys for p in patterns)

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [trainable(path) for path, _ in flat],
    )
