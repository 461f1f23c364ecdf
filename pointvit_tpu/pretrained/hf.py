"""HuggingFace ``transformers`` ViT checkpoint layout converters.

The reference pulls ViT trunks from timm (``src/models/vit.py:22-33``) and
torchvision (``src/models/renderer.py:230-244``). In the wild, ViT weights
also circulate in the HF ``ViTModel`` layout (separate q/k/v Linears,
``encoder.layer.N.*`` names); these converters remap that layout onto the
timm / torchvision name schemas our loaders consume, so an HF checkpoint
dropped into the weight cache "just works".

The q/k/v → packed-qkv concatenation is validated end-to-end against a real
``transformers.ViTModel`` forward in ``tests/test_pretrained_hf.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_hf_vit_state_dict", "hf_vit_to_timm", "hf_vit_to_torchvision"]


def _strip_prefix(sd: dict) -> dict:
    """Drop a leading 'vit.' (ViTForImageClassification nests the trunk)."""
    if any(k.startswith("vit.") for k in sd):
        return {k[len("vit."):]: v for k, v in sd.items() if k.startswith("vit.")}
    return sd


def is_hf_vit_state_dict(sd: dict) -> bool:
    sd = _strip_prefix(sd)
    return any(k.startswith("encoder.layer.0.attention") for k in sd)


def _num_layers(sd: dict) -> int:
    i = 0
    while f"encoder.layer.{i}.layernorm_before.weight" in sd:
        i += 1
    return i


def _packed_qkv(sd: dict, i: int) -> tuple[np.ndarray, np.ndarray]:
    """HF's separate q/k/v Linears → timm's packed (3E, E) weight / (3E,) bias."""
    base = f"encoder.layer.{i}.attention.attention"
    w = np.concatenate(
        [np.asarray(sd[f"{base}.{n}.weight"]) for n in ("query", "key", "value")], axis=0
    )
    b = np.concatenate(
        [np.asarray(sd[f"{base}.{n}.bias"]) for n in ("query", "key", "value")], axis=0
    )
    return w, b


def hf_vit_to_timm(sd: dict) -> dict[str, np.ndarray]:
    """HF ViTModel state dict → timm ``vit_*`` name schema (torch layouts)."""
    sd = _strip_prefix(sd)
    out: dict[str, np.ndarray] = {}
    if "embeddings.cls_token" in sd:
        out["cls_token"] = np.asarray(sd["embeddings.cls_token"])
    if "embeddings.position_embeddings" in sd:
        out["pos_embed"] = np.asarray(sd["embeddings.position_embeddings"])
    if "embeddings.patch_embeddings.projection.weight" in sd:
        out["patch_embed.proj.weight"] = np.asarray(
            sd["embeddings.patch_embeddings.projection.weight"]
        )
        out["patch_embed.proj.bias"] = np.asarray(
            sd["embeddings.patch_embeddings.projection.bias"]
        )
    for i in range(_num_layers(sd)):
        p, t = f"encoder.layer.{i}", f"blocks.{i}"
        out[f"{t}.norm1.weight"] = np.asarray(sd[f"{p}.layernorm_before.weight"])
        out[f"{t}.norm1.bias"] = np.asarray(sd[f"{p}.layernorm_before.bias"])
        out[f"{t}.norm2.weight"] = np.asarray(sd[f"{p}.layernorm_after.weight"])
        out[f"{t}.norm2.bias"] = np.asarray(sd[f"{p}.layernorm_after.bias"])
        w, b = _packed_qkv(sd, i)
        out[f"{t}.attn.qkv.weight"] = w
        out[f"{t}.attn.qkv.bias"] = b
        out[f"{t}.attn.proj.weight"] = np.asarray(sd[f"{p}.attention.output.dense.weight"])
        out[f"{t}.attn.proj.bias"] = np.asarray(sd[f"{p}.attention.output.dense.bias"])
        out[f"{t}.mlp.fc1.weight"] = np.asarray(sd[f"{p}.intermediate.dense.weight"])
        out[f"{t}.mlp.fc1.bias"] = np.asarray(sd[f"{p}.intermediate.dense.bias"])
        out[f"{t}.mlp.fc2.weight"] = np.asarray(sd[f"{p}.output.dense.weight"])
        out[f"{t}.mlp.fc2.bias"] = np.asarray(sd[f"{p}.output.dense.bias"])
    if "layernorm.weight" in sd:
        out["norm.weight"] = np.asarray(sd["layernorm.weight"])
        out["norm.bias"] = np.asarray(sd["layernorm.bias"])
    return out


def hf_vit_to_torchvision(sd: dict) -> dict[str, np.ndarray]:
    """HF ViTModel state dict → torchvision ``vit_b_16`` name schema."""
    sd = _strip_prefix(sd)
    out: dict[str, np.ndarray] = {}
    if "embeddings.patch_embeddings.projection.weight" in sd:
        out["conv_proj.weight"] = np.asarray(
            sd["embeddings.patch_embeddings.projection.weight"]
        )
        out["conv_proj.bias"] = np.asarray(
            sd["embeddings.patch_embeddings.projection.bias"]
        )
    if "embeddings.cls_token" in sd:
        out["class_token"] = np.asarray(sd["embeddings.cls_token"])
    if "embeddings.position_embeddings" in sd:
        out["encoder.pos_embedding"] = np.asarray(sd["embeddings.position_embeddings"])
    for i in range(_num_layers(sd)):
        p, t = f"encoder.layer.{i}", f"encoder.layers.encoder_layer_{i}"
        out[f"{t}.ln_1.weight"] = np.asarray(sd[f"{p}.layernorm_before.weight"])
        out[f"{t}.ln_1.bias"] = np.asarray(sd[f"{p}.layernorm_before.bias"])
        out[f"{t}.ln_2.weight"] = np.asarray(sd[f"{p}.layernorm_after.weight"])
        out[f"{t}.ln_2.bias"] = np.asarray(sd[f"{p}.layernorm_after.bias"])
        w, b = _packed_qkv(sd, i)
        out[f"{t}.self_attention.in_proj_weight"] = w
        out[f"{t}.self_attention.in_proj_bias"] = b
        out[f"{t}.self_attention.out_proj.weight"] = np.asarray(
            sd[f"{p}.attention.output.dense.weight"]
        )
        out[f"{t}.self_attention.out_proj.bias"] = np.asarray(
            sd[f"{p}.attention.output.dense.bias"]
        )
        out[f"{t}.mlp.0.weight"] = np.asarray(sd[f"{p}.intermediate.dense.weight"])
        out[f"{t}.mlp.0.bias"] = np.asarray(sd[f"{p}.intermediate.dense.bias"])
        out[f"{t}.mlp.3.weight"] = np.asarray(sd[f"{p}.output.dense.weight"])
        out[f"{t}.mlp.3.bias"] = np.asarray(sd[f"{p}.output.dense.bias"])
    if "layernorm.weight" in sd:
        out["encoder.ln.weight"] = np.asarray(sd["layernorm.weight"])
        out["encoder.ln.bias"] = np.asarray(sd["layernorm.bias"])
    return out
