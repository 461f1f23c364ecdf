"""ViT block zoo and image-ViT backbone, TPU-native Flax.

Three block flavours mirror the reference's three uses of transformer blocks:

- :class:`ViTBlock` — standard pre-norm timm block (used by Pix4Point's
  backbone, ``src/models/pix4point.py:254-255``).
- :class:`APFBlock` — APF's parallel-adapter block
  (``src/models/apf_utils.py:236-293``).
- :class:`SerialAdapterBlock` — torchvision encoder block with serial
  adapters after attention and MLP (``src/models/apf_utils.py:328-375``),
  used per-view by the renderer classifier.
- :class:`ImageViT` — a torchvision-layout Vision Transformer (patchify conv
  → cls token → learned pos-embed → encoder blocks → LN → cls feature), the
  frozen backbone of the renderer path (``src/models/vit.py:6-37``,
  ``src/models/renderer.py:230-244``).

All blocks take a compute ``dtype`` (bf16 by default at the model level);
parameters stay f32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointvit_tpu.nn.layers import (
    AdapterLayer,
    Attention,
    DropPath,
    Mlp,
    SimpleAdapter,
)

__all__ = ["ViTBlock", "APFBlock", "SerialAdapterBlock", "ImageViT"]


def _fused_block_ok(
    module: nn.Module, x: jax.Array, deterministic: bool, gate_param: str,
    config_ok: bool,
) -> bool:
    """Dispatch predicate for the fused whole-block kernels, shared by the
    three block flavours. ``config_ok`` is the block's static-config support
    (mlp_ratio / quantization); shape support (E % num_heads, head_dim
    alignment, the VMEM logits-scratch bound on S) comes from
    :func:`pointvit_tpu.ops.pallas_block.fused_block_shapes_ok`.

    ``implementation='fused'`` demands a supported configuration — an
    unsupported one raises rather than silently measuring the XLA path — but
    stochastic (training) calls still take the XLA path, the only one with
    dropout/drop-path.
    """
    impl = module.implementation
    if impl in ("xla", "attn"):
        return False
    from pointvit_tpu.ops.pallas_block import fused_block_shapes_ok

    supported = config_ok and fused_block_shapes_ok(
        x.shape[-2], x.shape[-1], module.num_heads
    )
    if impl == "fused" and not supported:
        raise ValueError(
            f"{type(module).__name__}(implementation='fused') does not support "
            f"this configuration (x.shape={x.shape}, num_heads="
            f"{module.num_heads}): the fused block kernels require "
            "E % num_heads == 0, head_dim % 8 == 0, S <= 1024, the default "
            "mlp_ratio 4.0, and quantized=False. Use implementation=None "
            "(auto) or 'attn'/'xla' instead."
        )
    if not supported or not deterministic:
        return False
    if module.is_initializing() or not module.has_variable("params", gate_param):
        return False
    if impl == "fused":
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


class ViTBlock(nn.Module):
    """Standard pre-norm transformer block (timm layout: norm1/attn/norm2/mlp).

    ``pos`` (optional) is added to the input before the block — Pix4Point's
    per-block positional re-add (pix4point.py:254-255). On the fused path the
    add happens inside the attention-half kernel, so x+pos never exists in HBM.

    ``implementation``: None = auto (whole-block fused Pallas kernels for TPU
    inference, XLA + fused attention otherwise); 'fused' forces the fused
    block for deterministic calls (raises on an unsupported config, falls
    back to XLA only for stochastic training calls); 'attn' keeps the block
    glue in XLA with only the attention fused; 'xla' forces the einsum
    attention path (no Pallas anywhere).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
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
        # The kernel is oracle-tested at the timm 4·dim hidden only.
        if _fused_block_ok(self, x, deterministic, "norm1", self.mlp_ratio == 4.0):
            # Inference: the whole block runs as two Pallas kernels — the
            # pos re-add, LayerNorms, and residuals never round-trip HBM
            # (ops/pallas_block.py::fused_vit_block).
            from pointvit_tpu.ops.pallas_block import (
                fused_vit_block,
                vit_block_weights,
            )

            weights = vit_block_weights(self.variables["params"])
            interpret = jax.default_backend() not in ("tpu", "axon")
            return fused_vit_block(
                x.astype(self.dtype), weights, self.num_heads, pos, interpret
            )
        if pos is not None:
            x = x + pos.astype(x.dtype)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        impl = self.implementation
        if impl == "xla":
            impl = "einsum"
        elif impl in ("attn", "fused"):
            impl = None  # auto: fused attention kernel on TPU
        h = Attention(
            self.num_heads,
            dtype=self.dtype,
            implementation=impl,
            name="attn",
        )(h)
        x = x + DropPath(self.drop_path_rate)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            int(dim * self.mlp_ratio),
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="mlp",
        )(h, deterministic=deterministic)
        return x + DropPath(self.drop_path_rate)(h, deterministic=deterministic)


class APFBlock(nn.Module):
    """APF ViT block: attention + parallel bottleneck adapter + MLP.

    Reference combination (apf_utils.py:269-293)::

        x   = x + drop_path(attn(norm1(x)))
        out = drop_path(mlp(norm2(x))) + adapter(x) + x

    where ``adapter(x)`` *internally* adds its own residual, so the skip path
    is counted twice (out ≈ mlp + adapter_up + 2x). That is the reference's
    actual arithmetic and we reproduce it exactly; the adapter's zero-init up
    projection makes it an identity+x at initialization.
    """

    num_heads: int
    adapter_bottleneck: int = 64
    drop_path_rate: float = 0.0
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    # None = auto (two fused Pallas kernels on TPU inference); 'fused' forces
    # them for deterministic calls (raises on an unsupported config); 'xla'
    # disables Pallas entirely.
    implementation: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]
        if _fused_block_ok(self, x, deterministic, "norm1", not self.quantized):
            # Inference: the whole block runs as two Pallas kernels (attn
            # half / mlp+adapter half) — LayerNorms, residuals, and the
            # adapter glue never round-trip HBM (ops/pallas_block.py).
            from pointvit_tpu.ops.pallas_block import (
                apf_block_weights,
                fused_apf_block,
            )

            weights = apf_block_weights(self.variables["params"])
            interpret = jax.default_backend() not in ("tpu", "axon")
            return fused_apf_block(
                x.astype(self.dtype), weights, self.num_heads, interpret
            )
        impl = self.implementation
        if impl == "xla":
            # Block-level 'xla' means no Pallas anywhere: route the
            # contraction to the einsum reference formulation (which IS the
            # XLA path).
            impl = "einsum"
        elif impl in ("attn", "fused"):
            impl = None  # auto: fused attention fwd + flash-style bwd on TPU
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(
            self.num_heads,
            dtype=self.dtype,
            quantized=self.quantized,
            implementation=impl,
            name="attention",
        )(h)
        x = x + DropPath(self.drop_path_rate)(h, deterministic=deterministic)

        adapt = AdapterLayer(
            self.adapter_bottleneck,
            dropout_rate=self.dropout_rate,
            add_residual=True,
            dtype=self.dtype,
            name="adapter",
        )(x, deterministic=deterministic)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            dim * 4, dtype=self.dtype, quantized=self.quantized, name="mlp"
        )(h, deterministic=deterministic)
        h = DropPath(self.drop_path_rate)(h, deterministic=deterministic)
        return h + adapt + x


class SerialAdapterBlock(nn.Module):
    """Torchvision encoder block with serial adapters (renderer path).

    Layout mirrors ``torchvision.models.vision_transformer.EncoderBlock``
    with the reference's adapter insertion (apf_utils.py:353-374)::

        y = dropout(self_attention(ln_1(x)));  x = x + adapter1(y)
        y = mlp(ln_2(x));                      x = x + adapter2(y)

    (each adapter is itself residual: a(y) = y + up(gelu(down(y)))).
    """

    num_heads: int
    adapter_bottleneck: int = 64
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # None = auto (whole-block fused kernels for TPU inference); 'fused'
    # forces them for deterministic calls (raises on an unsupported config);
    # 'attn' keeps the glue in XLA with only the attention fused; 'xla'
    # forces the einsum path (no Pallas).
    implementation: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]
        # The kernel is oracle-tested at the torchvision 4·dim hidden only.
        if _fused_block_ok(self, x, deterministic, "ln_1", self.mlp_ratio == 4.0):
            # Inference: the whole block runs as two Pallas kernels — LNs,
            # residuals, and both serial adapters never round-trip HBM
            # (ops/pallas_block.py::fused_serial_block).
            from pointvit_tpu.ops.pallas_block import (
                fused_serial_block,
                serial_block_weights,
            )

            weights = serial_block_weights(self.variables["params"])
            interpret = jax.default_backend() not in ("tpu", "axon")
            return fused_serial_block(
                x.astype(self.dtype), weights, self.num_heads, interpret
            )
        impl = self.implementation
        if impl == "xla":
            impl = "einsum"
        elif impl in ("attn", "fused"):
            impl = None  # auto: fused attention kernel on TPU
        h = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        h = Attention(
            self.num_heads,
            dtype=self.dtype,
            implementation=impl,
            name="self_attention",
        )(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = SimpleAdapter(self.adapter_bottleneck, dtype=self.dtype, name="adapter1")(h)
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = Mlp(
            int(dim * self.mlp_ratio),
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="mlp",
        )(h, deterministic=deterministic)
        h = SimpleAdapter(self.adapter_bottleneck, dtype=self.dtype, name="adapter2")(h)
        return x + h


class _PatchifyDense(nn.Module):
    """Stride-P patch embedding as reshape + matmul, with nn.Conv's param
    layout (kernel (P, P, C_in, E), bias (E,)) for checkpoint compatibility.
    Output (B, N_patches, E), rows in row-major patch order — identical to
    ``nn.Conv(..., strides=(P, P))`` followed by the (B, -1, E) reshape."""

    embed_dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        B, H, W, C = images.shape
        P = self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (P, P, C, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        x = images.reshape(B, H // P, P, W // P, P, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // P) * (W // P), P * P * C)
        k = kernel.reshape(P * P * C, self.embed_dim)
        x = x.astype(self.dtype) @ k.astype(self.dtype)
        return x + bias.astype(self.dtype)


class ImageViT(nn.Module):
    """Torchvision-layout image ViT returning the cls-token feature.

    Matches ``torchvision.models.vit_b_16`` structure consumed by the
    renderer classifier (renderer.py:230-244): 16×16 patchify conv, cls
    token, learned positional embedding, ``depth`` encoder blocks (here the
    adapter-augmented :class:`SerialAdapterBlock`), final LN, cls feature.

    Input is NHWC (TPU-native); the reference's NCHW is a host-format detail.
    """

    depth: int = 12
    embed_dim: int = 768
    num_heads: int = 12
    patch_size: int = 16
    adapter_bottleneck: int = 64
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # None = auto; 'xla' forces the einsum attention path (no Pallas).
    implementation: str | None = None

    @nn.compact
    def __call__(self, images: jax.Array, *, deterministic: bool = True) -> jax.Array:
        B, H, W, _ = images.shape
        # Patchify as reshape + matmul rather than nn.Conv: a stride-16 conv
        # is mathematically a Dense over flattened patches, but this
        # backend's conv backward-to-input is pathological (79 ms vs 3.1 ms
        # at (48, 224², 3) — and the renderer trains THROUGH the images, so
        # that grad is on the training path). Params keep nn.Conv's exact
        # layout ((kh, kw, cin, E) kernel under 'conv_proj') so torchvision/
        # reference checkpoint importers are unaffected.
        x = _PatchifyDense(
            self.embed_dim, self.patch_size, dtype=self.dtype, name="conv_proj"
        )(images)

        cls = self.param(
            "class_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(x.dtype), x], axis=1
        )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, x.shape[1], self.embed_dim),
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        for i in range(self.depth):
            x = SerialAdapterBlock(
                self.num_heads,
                adapter_bottleneck=self.adapter_bottleneck,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                implementation=self.implementation,
                name=f"encoder_layer_{i}",
            )(x, deterministic=deterministic)

        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        return x[:, 0]  # torchvision returns the cls-token feature
