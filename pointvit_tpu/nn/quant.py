"""Dynamic w8a8 int8 quantization for inference-time matmuls.

The v5e MXU runs int8×int8→int32 matmuls at ~1.5-1.8× the bf16 rate at this
model's shapes (measured: XLA int8 287-370 TOP/s vs bf16 176-200 TFLOP/s,
``benchmarks/matmul_precision_bench.py`` + slope-fit methodology in
CLAUDE.md). :class:`QuantDense` is a drop-in replacement for ``nn.Dense``
with an IDENTICAL parameter pytree (f32 ``kernel``/``bias``), so checkpoints,
trainable masks, and pretrained-weight importers are unaffected — the int8
quantization happens on the fly inside the forward:

- weights: symmetric per-output-channel int8 (scale = amax(|W|, col)/127),
- activations: symmetric dynamic per-row int8 (scale = amax(|x|, row)/127),
- accumulation: int32 on the MXU, dequantized as f32 ``row_scale · col_scale``.

This is the standard dynamic-activation w8a8 recipe (per-channel weights +
per-token activations); on transformer workloads it typically costs <0.5%
accuracy. It is an inference-time path: ``jnp.round`` has zero gradient, so
models must not enable it for training steps (the model wrappers assert).

The reference has no quantized path (pure f32 torch, SURVEY.md §2); this is
TPU-native capability beyond parity, used by ``bench.py``'s serving config.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["QuantDense", "dynamic_quant_matmul", "dense"]

_EPS = 1e-8


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def dynamic_quant_matmul(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """int8×int8→int32 matmul of ``x @ kernel`` with dynamic scales.

    ``x``: (..., K) any float dtype; ``kernel``: (K, N) f32. Returns f32.
    """
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    # per-row (token/point) activation scale
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, _EPS)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    # per-output-channel weight scale
    sw = jnp.max(jnp.abs(kf), axis=0, keepdims=True) / 127.0
    sw = jnp.maximum(sw, _EPS)
    wq = jnp.round(kf / sw).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sw)


class QuantDense(nn.Module):
    """``nn.Dense`` drop-in running the matmul in dynamic w8a8 int8.

    Same parameter names/shapes/dtypes as ``nn.Dense`` (f32 master weights);
    only the forward arithmetic differs. Inference-only (round() has zero
    gradient).
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if _on_tpu():
            # fused Pallas kernel: quant + int8 dot + dequant never leave VMEM
            from pointvit_tpu.ops.pallas_quant import quant_dense

            return quant_dense(x, kernel, bias, out_dtype=self.dtype)
        y = dynamic_quant_matmul(x, kernel)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def dense(quantized: bool, features: int, **kwargs) -> nn.Module:
    """Factory: ``QuantDense`` when ``quantized`` else ``nn.Dense``."""
    if quantized:
        return QuantDense(features, **kwargs)
    return nn.Dense(features, **kwargs)
