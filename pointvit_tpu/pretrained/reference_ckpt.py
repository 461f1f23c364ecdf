"""Import the reference framework's trained checkpoints.

The reference saves ``{'model_state_dict': ...}`` dicts via ``torch.save``
(apf_trainer.py:329-346 et al.). These loaders map a full reference model
state (APF / Pix4Point / Renderer) into this framework's param + batch-stats
pytrees, so users migrating from the reference keep their trained weights.

Layout notes (all verified against the reference module definitions):
- torch Linear (out, in) → Flax Dense kernel (in, out); Conv1d/2d k=1 →
  Dense; Conv2d k=16 → Flax Conv (kh, kw, in, out).
- BatchNorm weight/bias → scale/bias params; running stats → batch_stats.
- The group encoder's fused ``second_conv.0`` kernel splits into this
  framework's global/local halves (rows [0:E] / [E:2E] — concat order is
  [global, local], apf.py:162-163).
- PointViT aliases ``self.norm = self.vit.norm`` so its state dict carries
  the final norm under both names; either is accepted.
"""

from __future__ import annotations

import numpy as np

from pointvit_tpu.pretrained.convert import torch_linear_to_flax as _lin

__all__ = [
    "load_reference_apf_checkpoint",
    "load_reference_pix4point_checkpoint",
    "load_reference_renderer_checkpoint",
    "load_reference_state_dict",
]


def load_reference_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a reference ``torch.save`` checkpoint file → flat name→array."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


class _Mapper:
    def __init__(self, sd):
        self.sd = sd
        self.loaded = 0
        self.missing: list[str] = []

    def get(self, *names):
        for name in names:
            if name in self.sd:
                return self.sd[name]
        self.missing.append(names[0])
        return None

    def dense(self, tree, dst, src):
        w = self.get(src + ".weight")
        if w is not None:
            tree[dst]["kernel"] = _lin(w).astype(np.asarray(tree[dst]["kernel"]).dtype)
            self.loaded += 1
        b = self.get(src + ".bias")
        if b is not None and "bias" in tree[dst]:
            tree[dst]["bias"] = b.astype(np.asarray(tree[dst]["bias"]).dtype)
            self.loaded += 1

    def conv1x1(self, tree, dst, src, *, bias=True):
        w = self.get(src + ".weight")
        if w is not None:
            # Conv1d (out, in, 1) or Conv2d (out, in, 1, 1) → (in, out)
            w2 = w.reshape(w.shape[0], w.shape[1])
            tree[dst]["kernel"] = np.ascontiguousarray(w2.T).astype(
                np.asarray(tree[dst]["kernel"]).dtype
            )
            self.loaded += 1
        if bias:
            b = self.get(src + ".bias")
            if b is not None and "bias" in tree[dst]:
                tree[dst]["bias"] = b
                self.loaded += 1

    def ln(self, tree, dst, *srcs):
        w = self.get(*[s + ".weight" for s in srcs])
        b = self.get(*[s + ".bias" for s in srcs])
        if w is not None:
            tree[dst]["scale"] = w
            self.loaded += 1
        if b is not None:
            tree[dst]["bias"] = b
            self.loaded += 1

    def bn(self, params, stats, dst, src):
        self.ln(params, dst, src)
        m = self.get(src + ".running_mean")
        v = self.get(src + ".running_var")
        if m is not None:
            stats[dst]["mean"] = m
            self.loaded += 1
        if v is not None:
            stats[dst]["var"] = v
            self.loaded += 1

    def raw(self, tree, dst, src, reshape=None):
        w = self.get(src)
        if w is not None:
            if reshape is not None:
                w = w.reshape(reshape)
            tree[dst] = w.astype(np.asarray(tree[dst]).dtype)
            self.loaded += 1


def _copy(variables):
    import jax

    return jax.tree.map(np.asarray, variables)


def _map_timm_style_block(m, block, prefix, attn_name):
    m.ln(block, "norm1", f"{prefix}.norm1")
    m.ln(block, "norm2", f"{prefix}.norm2")
    m.dense(block[attn_name], "qkv", f"{prefix}.{'attention' if attn_name == 'attention' else 'attn'}.qkv")
    m.dense(block[attn_name], "proj", f"{prefix}.{'attention' if attn_name == 'attention' else 'attn'}.proj")
    m.dense(block["mlp"], "fc1", f"{prefix}.mlp.fc1")
    m.dense(block["mlp"], "fc2", f"{prefix}.mlp.fc2")


def load_reference_apf_checkpoint(variables: dict, source) -> tuple[dict, dict, int]:
    """Map a reference AdaptPointFormer state dict into our variables.

    Args:
        variables: {'params': ..., 'batch_stats': ...} from ``model.init``.
        source: path to a reference ``.pt`` checkpoint, or a flat state dict.

    Returns:
        (params, batch_stats, tensors_loaded).
    """
    sd = source if isinstance(source, dict) else load_reference_state_dict(source)
    v = _copy(variables)
    p, bs = v["params"], v.get("batch_stats", {})
    m = _Mapper(sd)

    # mini-PointNet encoder (point_encoder.encoder.*, apf.py:114-143)
    enc = p["point_encoder"]
    enc_bs = bs["point_encoder"]
    m.conv1x1(enc, "first_0", "point_encoder.encoder.first_conv.0")
    m.bn(enc, enc_bs, "first_bn0", "point_encoder.encoder.first_conv.1")
    m.conv1x1(enc, "first_1", "point_encoder.encoder.first_conv.3")
    m.bn(enc, enc_bs, "first_bn1", "point_encoder.encoder.first_conv.4")
    m.conv1x1(enc, "first_2", "point_encoder.encoder.first_conv.6")
    # fused second_conv.0 splits into global/local halves
    w = m.get("point_encoder.encoder.second_conv.0.weight")
    if w is not None:
        w2 = np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)  # (2E_in, 2E_out)
        e = w2.shape[0] // 2
        enc["second_0_global"]["kernel"] = w2[:e]
        enc["second_0_local"]["kernel"] = w2[e:]
        m.loaded += 2
    b = m.get("point_encoder.encoder.second_conv.0.bias")
    if b is not None:
        enc["second_0_global"]["bias"] = b
        m.loaded += 1
    m.bn(enc, enc_bs, "second_bn0", "point_encoder.encoder.second_conv.1")
    m.conv1x1(enc, "second_1", "point_encoder.encoder.second_conv.3")

    # transformer blocks (blocks.{i}.*, apf_utils.py:236-293)
    i = 0
    while f"blocks_{i}" in p:
        block = p[f"blocks_{i}"]
        prefix = f"blocks.{i}"
        _map_timm_style_block(m, block, prefix, "attention")
        ad = block["adapter"]
        m.ln(ad, "adapter_norm", f"{prefix}.adapter.adapter_norm")
        m.dense(ad, "down_proj", f"{prefix}.adapter.down_proj")
        m.dense(ad, "up_proj", f"{prefix}.adapter.up_proj")
        m.raw(ad, "scale", f"{prefix}.adapter.scale")
        i += 1

    m.ln(p, "encoder_norm", "encoder_norm")

    # classification head (head.mlp_head.{0,1,4,5,8}, apf.py:229-240)
    head, head_bs = p["head"], bs["head"]
    m.dense(head, "fc0", "head.mlp_head.0")
    m.bn(head, head_bs, "bn0", "head.mlp_head.1")
    m.dense(head, "fc1", "head.mlp_head.4")
    m.bn(head, head_bs, "bn1", "head.mlp_head.5")
    m.dense(head, "out", "head.mlp_head.8")

    print(f"reference APF checkpoint: loaded {m.loaded} tensors"
          + (f", {len(m.missing)} missing" if m.missing else ""))
    return p, bs, m.loaded


def load_reference_pix4point_checkpoint(variables: dict, source) -> tuple[dict, dict, int]:
    """Map a reference Pix4Point state dict into our variables."""
    sd = source if isinstance(source, dict) else load_reference_state_dict(source)
    v = _copy(variables)
    p, bs = v["params"], v.get("batch_stats", {})
    m = _Mapper(sd)
    trunk, trunk_bs = p["model"], bs["model"]

    # P3Embed stage 0 (model.patch_embed.convs.0.{0,1}.*, pix4point.py:135-158)
    pe, pe_bs = trunk["patch_embed"], trunk_bs["patch_embed"]
    m.conv1x1(pe, "s0_conv1_0", "model.patch_embed.convs.0.0.0", bias=False)
    m.conv1x1(pe, "s0_conv1_1", "model.patch_embed.convs.0.0.1")
    m.bn(pe, pe_bs, "s0_conv1_bn", "model.patch_embed.convs.0.0.2")
    m.conv1x1(pe, "s0_conv2_0", "model.patch_embed.convs.0.1.0", bias=False)
    m.bn(pe, pe_bs, "s0_conv2_bn0", "model.patch_embed.convs.0.1.1")
    m.conv1x1(pe, "s0_conv2_1", "model.patch_embed.convs.0.1.3", bias=False)
    m.bn(pe, pe_bs, "s0_conv2_bn1", "model.patch_embed.convs.0.1.4")

    m.dense(trunk, "proj", "model.proj")
    m.dense(trunk["pos_embed"], "fc1", "model.pos_embed.0")
    m.dense(trunk["pos_embed"], "fc2", "model.pos_embed.2")
    m.raw(trunk, "cls_token", "model.cls_token")
    m.raw(trunk, "cls_pos", "model.cls_pos")

    i = 0
    while f"blocks_{i}" in trunk:
        _map_timm_style_block(m, trunk[f"blocks_{i}"], f"model.vit.blocks.{i}", "attn")
        i += 1
    m.ln(trunk, "norm", "model.norm", "model.vit.norm")

    head, head_bs = p["cls_head"], bs["cls_head"]
    m.dense(head, "fc0", "cls_head.head.0")
    m.bn(head, head_bs, "bn0", "cls_head.head.1")
    m.dense(head, "fc1", "cls_head.head.4")
    m.bn(head, head_bs, "bn1", "cls_head.head.5")
    m.dense(head, "out", "cls_head.head.8")

    print(f"reference Pix4Point checkpoint: loaded {m.loaded} tensors"
          + (f", {len(m.missing)} missing" if m.missing else ""))
    return p, bs, m.loaded


def load_reference_renderer_checkpoint(variables: dict, source) -> tuple[dict, dict, int]:
    """Map a reference PointCloudRendererClassifier state dict into our variables."""
    sd = source if isinstance(source, dict) else load_reference_state_dict(source)
    v = _copy(variables)
    p, bs = v["params"], v.get("batch_stats", {})
    m = _Mapper(sd)

    # view-transform network (diff_renderer.py:25-60), present when diff
    if "view_transform_net" in p:
        vtn, vtn_bs = p["view_transform_net"], bs["view_transform_net"]
        for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4), (6, 7))):
            m.conv1x1(vtn, f"enc{i}", f"view_transform_net.point_encoder.{conv_idx}")
            m.bn(vtn, vtn_bs, f"enc_bn{i}", f"view_transform_net.point_encoder.{bn_idx}")
        m.dense(vtn, "pred0", "view_transform_net.view_predictor.0")
        m.dense(vtn, "pred1", "view_transform_net.view_predictor.2")
        m.dense(vtn, "azimuth_head", "view_transform_net.azimuth_head")
        m.dense(vtn, "elevation_head", "view_transform_net.elevation_head")

    # adapted torchvision ViT (renderer.py:230-244)
    vit = p["vit"]
    w = m.get("vit.conv_proj.weight")
    if w is not None:
        vit["conv_proj"]["kernel"] = w.transpose(2, 3, 1, 0)
        m.loaded += 1
    b = m.get("vit.conv_proj.bias")
    if b is not None:
        vit["conv_proj"]["bias"] = b
        m.loaded += 1
    m.raw(vit, "class_token", "vit.class_token")
    m.raw(vit, "pos_embedding", "vit.encoder.pos_embedding")
    i = 0
    while f"encoder_layer_{i}" in vit:
        block = vit[f"encoder_layer_{i}"]
        # wrapped block: vit.encoder.layers.{i}.vit_block.* + adapters
        prefix = f"vit.encoder.layers.{i}"
        m.ln(block, "ln_1", f"{prefix}.vit_block.ln_1")
        m.ln(block, "ln_2", f"{prefix}.vit_block.ln_2")
        w = m.get(f"{prefix}.vit_block.self_attention.in_proj_weight")
        if w is not None:
            block["self_attention"]["qkv"]["kernel"] = _lin(w)
            m.loaded += 1
        b = m.get(f"{prefix}.vit_block.self_attention.in_proj_bias")
        if b is not None:
            block["self_attention"]["qkv"]["bias"] = b
            m.loaded += 1
        m.dense(block["self_attention"], "proj", f"{prefix}.vit_block.self_attention.out_proj")
        for dst, srcs in (("fc1", ("mlp.0", "mlp.linear_1")), ("fc2", ("mlp.3", "mlp.linear_2"))):
            w = m.get(*[f"{prefix}.vit_block.{s}.weight" for s in srcs])
            if w is not None:
                block["mlp"][dst]["kernel"] = _lin(w)
                m.loaded += 1
            b = m.get(*[f"{prefix}.vit_block.{s}.bias" for s in srcs])
            if b is not None:
                block["mlp"][dst]["bias"] = b
                m.loaded += 1
        for adapter in ("adapter1", "adapter2"):
            m.dense(block[adapter], "down_proj", f"{prefix}.{adapter}.down_proj")
            m.dense(block[adapter], "up_proj", f"{prefix}.{adapter}.up_proj")
        i += 1
    m.ln(vit, "ln", "vit.encoder.ln")

    m.raw(p, "view_aggregation", "view_aggregation")
    cls = p["classifier"]
    m.ln(cls, "norm", "classifier.0")
    m.dense(cls, "fc0", "classifier.1")
    m.dense(cls, "fc1", "classifier.4")
    m.dense(cls, "out", "classifier.7")

    print(f"reference renderer checkpoint: loaded {m.loaded} tensors"
          + (f", {len(m.missing)} missing" if m.missing else ""))
    return p, bs, m.loaded
