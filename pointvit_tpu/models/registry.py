"""ViT acquisition helpers — capability parity with ``src/models/vit.py``.

The reference fetches live torch modules from the torchvision/timm hubs
(vit.py:6-66). Here acquisition means: resolve a model name to its
architecture preset, build the Flax backbone, and (when a local weight cache
exists — this environment has no egress) return the mapped parameters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pointvit_tpu.models.pix4point import VIT_PRESETS
from pointvit_tpu.models.renderer import TORCHVISION_VIT_PRESETS

__all__ = ["get_vit", "get_timm_vit"]


def get_vit(
    vit_name: str,
    pretrained: bool = True,
    *,
    adapter_bottleneck: int = 64,
    dtype: jnp.dtype = jnp.float32,
) -> tuple[Any, int]:
    """Build a torchvision-layout :class:`~pointvit_tpu.nn.vit.ImageViT`.

    Reference: ``get_vit`` (vit.py:6-37) — returns ``(module, embed_dim)``.
    With ``pretrained``, weights are loaded from the local cache on first
    ``init`` via :func:`pointvit_tpu.pretrained.load_torchvision_vit_weights`
    (callers apply it to their param tree; construction itself is pure).
    """
    from pointvit_tpu.nn.vit import ImageViT

    preset = TORCHVISION_VIT_PRESETS.get(vit_name)
    if preset is None:
        raise ValueError(f"Unsupported ViT model: {vit_name}")
    module = ImageViT(
        depth=preset["depth"],
        embed_dim=preset["embed_dim"],
        num_heads=preset["num_heads"],
        patch_size=preset["patch_size"],
        adapter_bottleneck=adapter_bottleneck,
        dtype=dtype,
    )
    return module, preset["embed_dim"]


def get_timm_vit(
    name: str,
    pretrained: bool = True,
    delete: list[str] | None = None,
) -> dict | None:
    """Fetch a timm-layout state dict from the local weight cache.

    Reference: ``get_timm_vit`` (vit.py:40-66) — returns the state dict with
    the listed keys removed (the APF path deletes the classification head,
    apf.py:323-327). Returns None when no cache entry exists (random-init
    fallback) or when ``pretrained`` is False.
    """
    if not pretrained:
        return None
    if name not in VIT_PRESETS:
        raise ValueError(f"unknown timm ViT preset: {name}")
    from pointvit_tpu.pretrained import load_state_dict

    sd = load_state_dict(name)
    if sd is None:
        return None
    if delete:
        for key in delete:
            sd.pop(key, None)
    return sd
