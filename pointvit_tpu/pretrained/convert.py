"""Checkpoint loading + torch→Flax name/layout mapping."""

from __future__ import annotations

import os
import warnings

import numpy as np

__all__ = [
    "cache_dir",
    "load_state_dict",
    "torch_linear_to_flax",
    "load_apf_vit_weights",
    "load_pix4point_vit_weights",
    "load_torchvision_vit_weights",
]


def cache_dir() -> str:
    return os.environ.get(
        "POINTVIT_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "pointvit_tpu", "weights"),
    )


def load_state_dict(model_name: str) -> dict[str, np.ndarray] | None:
    """Load ``<cache>/<model_name>.<ext>`` as a flat name→array dict, or None."""
    base = os.path.join(cache_dir(), model_name)
    for ext in (".safetensors", ".npz", ".pth", ".bin", ".pt"):
        path = base + ext
        if not os.path.exists(path):
            continue
        if ext == ".npz":
            with np.load(path) as f:
                return {k: f[k] for k in f.files}
        if ext == ".safetensors":
            try:
                from safetensors.numpy import load_file

                return load_file(path)
            except ImportError:
                warnings.warn("safetensors not available; skipping " + path)
                continue
        # torch pickle
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()

        def to_numpy(v):
            # numpy has no bf16/f16-exotic dtypes; upcast such tensors
            # (common in hub-downloaded half-precision checkpoints) instead
            # of letting Tensor.numpy() raise.
            if v.dtype in (torch.bfloat16, torch.float16):
                v = v.float()
            return v.numpy()

        return {k: to_numpy(v) for k, v in sd.items() if hasattr(v, "numpy")}
    warnings.warn(
        f"No cached weights for {model_name!r} under {cache_dir()} — "
        "keeping random initialization (no-egress environment)."
    )
    return None


def torch_linear_to_flax(weight: np.ndarray) -> np.ndarray:
    """torch Linear stores (out, in); Flax Dense kernels are (in, out)."""
    return np.ascontiguousarray(weight.T)


def _maybe_hf(sd, target: str):
    """Auto-convert a HuggingFace ViTModel state dict to the expected schema."""
    from pointvit_tpu.pretrained.hf import (
        hf_vit_to_timm,
        hf_vit_to_torchvision,
        is_hf_vit_state_dict,
    )

    if sd is not None and is_hf_vit_state_dict(sd):
        return hf_vit_to_timm(sd) if target == "timm" else hf_vit_to_torchvision(sd)
    return sd


def _set(params, path: list[str], value: np.ndarray) -> bool:
    """Assign into a nested dict if the leaf exists with a matching shape."""
    node = params
    for key in path[:-1]:
        if key not in node:
            return False
        node = node[key]
    leaf = path[-1]
    if leaf not in node:
        return False
    if tuple(np.shape(node[leaf])) != tuple(value.shape):
        warnings.warn(
            f"shape mismatch at {'/'.join(path)}: "
            f"{np.shape(node[leaf])} vs {value.shape}; skipping"
        )
        return False
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    return True


def _copy_tree(params):
    import jax

    return jax.tree.map(np.asarray, params)


def _map_timm_block(
    sd, prefix: str, block, *, attn_name: str, include_attention: bool = True
) -> int:
    """Map one timm ViT block's params into our block dict. Returns #loaded."""
    n = 0
    pairs = [
        (f"{prefix}.norm1.weight", ["norm1", "scale"], None),
        (f"{prefix}.norm1.bias", ["norm1", "bias"], None),
        (f"{prefix}.norm2.weight", ["norm2", "scale"], None),
        (f"{prefix}.norm2.bias", ["norm2", "bias"], None),
        (f"{prefix}.mlp.fc1.weight", ["mlp", "fc1", "kernel"], torch_linear_to_flax),
        (f"{prefix}.mlp.fc1.bias", ["mlp", "fc1", "bias"], None),
        (f"{prefix}.mlp.fc2.weight", ["mlp", "fc2", "kernel"], torch_linear_to_flax),
        (f"{prefix}.mlp.fc2.bias", ["mlp", "fc2", "bias"], None),
    ]
    if include_attention:
        pairs += [
            (f"{prefix}.attn.qkv.weight", [attn_name, "qkv", "kernel"], torch_linear_to_flax),
            (f"{prefix}.attn.qkv.bias", [attn_name, "qkv", "bias"], None),
            (f"{prefix}.attn.proj.weight", [attn_name, "proj", "kernel"], torch_linear_to_flax),
            (f"{prefix}.attn.proj.bias", [attn_name, "proj", "bias"], None),
        ]
    for src, dst, transform in pairs:
        if src in sd:
            value = sd[src]
            if transform is not None:
                value = transform(value)
            n += _set(block, dst, value)
    return n


def load_apf_vit_weights(
    params, vit_name: str, *, reference_quirks: bool = False, state_dict=None
):
    """Load a timm ViT into the APF trunk (blocks_i + encoder_norm).

    Default: full load (norms, attention, MLPs, final norm). With
    ``reference_quirks``: only norms + MLPs — the subset the reference's
    ``strict=False`` load actually matches (apf.py:323-331).
    Returns an updated param tree, or None if no cache entry exists.
    """
    sd = state_dict if state_dict is not None else load_state_dict(vit_name)
    sd = _maybe_hf(sd, "timm")
    if sd is None:
        return None
    params = _copy_tree(params)
    loaded = 0
    i = 0
    while f"blocks_{i}" in params:
        loaded += _map_timm_block(
            sd,
            f"blocks.{i}",
            params[f"blocks_{i}"],
            attn_name="attention",
            include_attention=not reference_quirks,
        )
        i += 1
    if not reference_quirks and "norm.weight" in sd:
        loaded += _set(params, ["encoder_norm", "scale"], sd["norm.weight"])
        loaded += _set(params, ["encoder_norm", "bias"], sd["norm.bias"])
    print(f"APF: loaded {loaded} pretrained tensors from {vit_name}")
    return params


def load_pix4point_vit_weights(params, model_name: str, *, state_dict=None):
    """Load a timm ViT into PointViT (model/blocks_i, model/norm, cls token/pos)."""
    sd = state_dict if state_dict is not None else load_state_dict(model_name)
    sd = _maybe_hf(sd, "timm")
    if sd is None:
        return None
    params = _copy_tree(params)
    trunk = params["model"]
    loaded = 0
    i = 0
    while f"blocks_{i}" in trunk:
        loaded += _map_timm_block(sd, f"blocks.{i}", trunk[f"blocks_{i}"], attn_name="attn")
        i += 1
    if "norm.weight" in sd:
        loaded += _set(trunk, ["norm", "scale"], sd["norm.weight"])
        loaded += _set(trunk, ["norm", "bias"], sd["norm.bias"])
    if "cls_token" in sd:
        loaded += _set(trunk, ["cls_token"], sd["cls_token"])
    if "pos_embed" in sd:
        # cls positional embedding = pos_embed[:, :1, :] (pix4point.py:227)
        loaded += _set(trunk, ["cls_pos"], sd["pos_embed"][:, :1, :])
    print(f"Pix4Point: loaded {loaded} pretrained tensors from {model_name}")
    return params


def load_torchvision_vit_weights(params, vit_name: str, *, state_dict=None):
    """Load a torchvision ViT into the renderer's ImageViT (params['vit'])."""
    sd = state_dict if state_dict is not None else load_state_dict(vit_name)
    sd = _maybe_hf(sd, "torchvision")
    if sd is None:
        return None
    params = _copy_tree(params)
    vit = params["vit"]
    loaded = 0

    if "conv_proj.weight" in sd:
        # torch Conv2d (O, I, kh, kw) → Flax Conv (kh, kw, I, O)
        loaded += _set(
            vit, ["conv_proj", "kernel"], sd["conv_proj.weight"].transpose(2, 3, 1, 0)
        )
        loaded += _set(vit, ["conv_proj", "bias"], sd["conv_proj.bias"])
    if "class_token" in sd:
        loaded += _set(vit, ["class_token"], sd["class_token"])
    if "encoder.pos_embedding" in sd:
        loaded += _set(vit, ["pos_embedding"], sd["encoder.pos_embedding"])

    i = 0
    while f"encoder_layer_{i}" in vit:
        block = vit[f"encoder_layer_{i}"]
        prefix = f"encoder.layers.encoder_layer_{i}"
        pairs = [
            (f"{prefix}.ln_1.weight", ["ln_1", "scale"], None),
            (f"{prefix}.ln_1.bias", ["ln_1", "bias"], None),
            (f"{prefix}.ln_2.weight", ["ln_2", "scale"], None),
            (f"{prefix}.ln_2.bias", ["ln_2", "bias"], None),
            (
                f"{prefix}.self_attention.in_proj_weight",
                ["self_attention", "qkv", "kernel"],
                torch_linear_to_flax,
            ),
            (
                f"{prefix}.self_attention.in_proj_bias",
                ["self_attention", "qkv", "bias"],
                None,
            ),
            (
                f"{prefix}.self_attention.out_proj.weight",
                ["self_attention", "proj", "kernel"],
                torch_linear_to_flax,
            ),
            (
                f"{prefix}.self_attention.out_proj.bias",
                ["self_attention", "proj", "bias"],
                None,
            ),
        ]
        # torchvision MLPBlock: Sequential indices (mlp.0 / mlp.3) in current
        # torchvision; 'linear_1'/'linear_2' in some releases.
        for src_fc1, src_fc2 in (("mlp.0", "mlp.3"), ("mlp.linear_1", "mlp.linear_2")):
            if f"{prefix}.{src_fc1}.weight" in sd:
                pairs += [
                    (f"{prefix}.{src_fc1}.weight", ["mlp", "fc1", "kernel"], torch_linear_to_flax),
                    (f"{prefix}.{src_fc1}.bias", ["mlp", "fc1", "bias"], None),
                    (f"{prefix}.{src_fc2}.weight", ["mlp", "fc2", "kernel"], torch_linear_to_flax),
                    (f"{prefix}.{src_fc2}.bias", ["mlp", "fc2", "bias"], None),
                ]
                break
        for src, dst, transform in pairs:
            if src in sd:
                value = sd[src]
                if transform is not None:
                    value = transform(value)
                loaded += _set(block, dst, value)
        i += 1

    if "encoder.ln.weight" in sd:
        loaded += _set(vit, ["ln", "scale"], sd["encoder.ln.weight"])
        loaded += _set(vit, ["ln", "bias"], sd["encoder.ln.bias"])
    print(f"Renderer: loaded {loaded} pretrained tensors from {vit_name}")
    return params
