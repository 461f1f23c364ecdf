"""Classification heads for the three model families."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ClassificationHead", "ClsHead", "RendererHead"]

_BN = dict(momentum=0.9, epsilon=1e-5)


class ClassificationHead(nn.Module):
    """APF head: E→512→256→classes with BN+ReLU+Dropout(0.4) (apf.py:219-251)."""

    num_classes: int
    dropout_rate: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i, width in enumerate((512, 256)):
            x = nn.Dense(width, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn{i}", **_BN)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="out")(x)


class ClsHead(nn.Module):
    """Pix4Point head: 2E→256→256→classes, BN+ReLU+Dropout(0.5) (pix4point.py:294-325).
    Linears are xavier-initialized per the reference's ``_init_weights``
    (pix4point.py:376-383)."""

    num_classes: int
    mlps: Sequence[int] = (256, 256)
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        xavier = nn.initializers.xavier_uniform()
        for i, width in enumerate(self.mlps):
            x = nn.Dense(width, kernel_init=xavier, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn{i}", **_BN)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, kernel_init=xavier, dtype=self.dtype, name="out")(x)


class RendererHead(nn.Module):
    """Renderer classifier: LN→E→512→GELU→drop→256→GELU→drop→classes
    (renderer.py:250-259)."""

    num_classes: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        for i, width in enumerate((512, 256)):
            x = nn.Dense(width, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="out")(x)
