"""Common Flax building blocks: attention, MLP, stochastic depth, adapters.

These are the TPU-native equivalents of the reference's layer vocabulary
(``src/models/apf_utils.py``): parameter layouts are chosen so pretrained
timm/torchvision checkpoints map 1:1 (see :mod:`pointvit_tpu.pretrained`),
and all matmuls run in a configurable compute dtype (bf16 by default at the
model level) with f32 parameters.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointvit_tpu.nn.quant import dense

__all__ = [
    "Mlp",
    "Attention",
    "DropPath",
    "AdapterLayer",
    "SimpleAdapter",
    "Identity",
]


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return x


class Mlp(nn.Module):
    """Transformer MLP: fc1 → GELU → drop → fc2 → drop (timm ``Mlp`` layout).

    Used by APF blocks (apf_utils.py:259-262, hidden = 4·dim, no dropout) and
    timm/torchvision ViT blocks.
    """

    hidden_features: int
    out_features: int | None = None
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        out_features = self.out_features or x.shape[-1]
        x = dense(self.quantized, self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = dense(self.quantized, out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x


def _use_fused_attention() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection.

    Parameter layout matches timm/the reference ``AttentionLayer``
    (apf_utils.py:106-160): one ``qkv`` Dense of width 3·dim and a ``proj``
    output Dense. On TPU the attention contraction runs in the fused Pallas
    kernel (:mod:`pointvit_tpu.ops.pallas_attention`) — sequences here are a
    single VMEM tile, so the (B, H, S, S) probability tensor never touches
    HBM; elsewhere (CPU tests) the einsum reference path is used.
    ``implementation`` forces 'fused' / 'einsum' / 'xla'.
    """

    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    implementation: str | None = None
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = dense(
            self.quantized, 3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)

        impl = self.implementation
        if impl is None:
            impl = "fused" if _use_fused_attention() else "einsum"
        if impl == "fused":
            # Packed-qkv kernel: the (B, N, 3C) projection feeds straight
            # into VMEM — no q/k/v slice copies in HBM.
            from pointvit_tpu.ops.pallas_attention import fused_mha_qkv

            out = fused_mha_qkv(qkv, self.num_heads)
        else:
            r = qkv.reshape(B, N, 3, self.num_heads, head_dim)
            q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]  # (B, N, H, D)
            if impl == "einsum":
                from pointvit_tpu.ops.pallas_attention import reference_mha

                out = reference_mha(q, k, v)
            else:
                out = jax.nn.dot_product_attention(q, k, v)
            out = out.reshape(B, N, C)
        return dense(self.quantized, C, dtype=self.dtype, name="proj")(out)


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample.

    Equivalent of timm ``DropPath`` used at apf_utils.py:258. Identity when
    ``deterministic`` or rate == 0.
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def _kaiming_uniform_a5(key, shape, dtype):
    """torch ``kaiming_uniform_(a=sqrt(5))`` — the reference adapter's
    down-projection init (apf_utils.py:192). For a (in, out) Dense kernel this
    is U(-1/sqrt(in), 1/sqrt(in))."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class AdapterLayer(nn.Module):
    """APF bottleneck adapter: LN → down → ReLU → drop → up → ×scale (+x).

    Reference: ``AdapterLayer`` (apf_utils.py:162-233). The up-projection is
    zero-init so the adapter starts as (scaled) identity; ``add_residual``
    preserves the reference's internal residual add (which, combined with the
    outer residual in the APF block, doubles the skip path — a reference
    quirk we reproduce; see :class:`pointvit_tpu.nn.vit.APFBlock`).
    """

    bottleneck: int = 64
    dropout_rate: float = 0.0
    add_residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        residual = x
        h = nn.LayerNorm(dtype=self.dtype, name="adapter_norm")(x)
        h = nn.Dense(
            self.bottleneck,
            kernel_init=_kaiming_uniform_a5,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="down_proj",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(
            x.shape[-1],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="up_proj",
        )(h)
        scale = self.param("scale", nn.initializers.ones, (1,))
        h = h * scale.astype(h.dtype)
        return h + residual if self.add_residual else h


class SimpleAdapter(nn.Module):
    """Serial adapter for image-ViT blocks: x + up(GELU(down(x))).

    Reference: ``SimpleAdapterLayer`` (apf_utils.py:296-326); near-identity
    init — tiny xavier on the down projection, zeros on the up projection.
    """

    bottleneck: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # xavier_uniform with gain 1e-3 (apf_utils.py:312): gain multiplies the
        # std, so the variance-scaling factor is gain² = 1e-6.
        h = nn.Dense(
            self.bottleneck,
            kernel_init=nn.initializers.variance_scaling(1e-6, "fan_avg", "uniform"),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="down_proj",
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            x.shape[-1],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="up_proj",
        )(h)
        return x + h
