"""Reference-checkpoint import tests: synthetic state dicts with the
reference's exact key names/layouts, spot-checked into our param trees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointvit_tpu.pretrained.reference_ckpt import (
    load_reference_apf_checkpoint,
    load_reference_pix4point_checkpoint,
    load_reference_renderer_checkpoint,
)


def _mark(shape, tag):
    """Deterministic distinguishable tensor."""
    rng = np.random.default_rng(abs(hash(tag)) % 2**32)
    return rng.standard_normal(shape).astype(np.float32)


def _apf_reference_sd(dim=32, depth=2, in_ch=8, num_classes=15):
    sd = {}
    # point_encoder.encoder: Conv1d stacks
    for name, (o, i) in (
        ("first_conv.0", (256, in_ch)), ("first_conv.3", (512, 256)),
        ("first_conv.6", (dim, 512)),
        ("second_conv.3", (dim, 2 * dim)),
    ):
        sd[f"point_encoder.encoder.{name}.weight"] = _mark((o, i, 1), name)
        sd[f"point_encoder.encoder.{name}.bias"] = _mark((o,), name + "b")
    sd["point_encoder.encoder.second_conv.0.weight"] = _mark((2 * dim, 2 * dim, 1), "sc0")
    sd["point_encoder.encoder.second_conv.0.bias"] = _mark((2 * dim,), "sc0b")
    for name, ch in (
        ("first_conv.1", 256), ("first_conv.4", 512), ("second_conv.1", 2 * dim),
    ):
        base = f"point_encoder.encoder.{name}"
        sd[base + ".weight"] = _mark((ch,), name + "w")
        sd[base + ".bias"] = _mark((ch,), name + "bb")
        sd[base + ".running_mean"] = _mark((ch,), name + "m")
        sd[base + ".running_var"] = np.abs(_mark((ch,), name + "v")) + 0.5
    for i in range(depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = _mark((dim,), f"{p}n1")
        sd[f"{p}.norm1.bias"] = _mark((dim,), f"{p}n1b")
        sd[f"{p}.norm2.weight"] = _mark((dim,), f"{p}n2")
        sd[f"{p}.norm2.bias"] = _mark((dim,), f"{p}n2b")
        sd[f"{p}.attention.qkv.weight"] = _mark((3 * dim, dim), f"{p}qkv")
        sd[f"{p}.attention.qkv.bias"] = _mark((3 * dim,), f"{p}qkvb")
        sd[f"{p}.attention.proj.weight"] = _mark((dim, dim), f"{p}proj")
        sd[f"{p}.attention.proj.bias"] = _mark((dim,), f"{p}projb")
        sd[f"{p}.mlp.fc1.weight"] = _mark((4 * dim, dim), f"{p}fc1")
        sd[f"{p}.mlp.fc1.bias"] = _mark((4 * dim,), f"{p}fc1b")
        sd[f"{p}.mlp.fc2.weight"] = _mark((dim, 4 * dim), f"{p}fc2")
        sd[f"{p}.mlp.fc2.bias"] = _mark((dim,), f"{p}fc2b")
        sd[f"{p}.adapter.adapter_norm.weight"] = _mark((dim,), f"{p}an")
        sd[f"{p}.adapter.adapter_norm.bias"] = _mark((dim,), f"{p}anb")
        sd[f"{p}.adapter.down_proj.weight"] = _mark((64, dim), f"{p}dp")
        sd[f"{p}.adapter.down_proj.bias"] = _mark((64,), f"{p}dpb")
        sd[f"{p}.adapter.up_proj.weight"] = _mark((dim, 64), f"{p}up")
        sd[f"{p}.adapter.up_proj.bias"] = _mark((dim,), f"{p}upb")
        sd[f"{p}.adapter.scale"] = _mark((1,), f"{p}s")
    sd["encoder_norm.weight"] = _mark((dim,), "en")
    sd["encoder_norm.bias"] = _mark((dim,), "enb")
    for name, (o, i) in (
        ("mlp_head.0", (512, dim)), ("mlp_head.4", (256, 512)),
        ("mlp_head.8", (num_classes, 256)),
    ):
        sd[f"head.{name}.weight"] = _mark((o, i), name)
        sd[f"head.{name}.bias"] = _mark((o,), name + "b")
    for name, ch in (("mlp_head.1", 512), ("mlp_head.5", 256)):
        base = f"head.{name}"
        sd[base + ".weight"] = _mark((ch,), name + "w")
        sd[base + ".bias"] = _mark((ch,), name + "bb")
        sd[base + ".running_mean"] = _mark((ch,), name + "m")
        sd[base + ".running_var"] = np.abs(_mark((ch,), name + "v")) + 0.5
    return sd


def test_apf_reference_import():
    from pointvit_tpu.models import AdaptPointFormer

    model = AdaptPointFormer(
        num_classes=15, embedding_dim=32, npoint=8, nsample=4,
        in_channels=4, depth=2, num_heads=4,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 4)))
    sd = _apf_reference_sd(dim=32, depth=2, in_ch=8)
    params, batch_stats, loaded = load_reference_apf_checkpoint(variables, sd)
    assert loaded == len(sd) + 1  # fused second_conv.0 splits into 2 tensors

    # spot checks (torch (out,in) → flax (in,out))
    np.testing.assert_allclose(
        np.asarray(params["blocks_1"]["attention"]["qkv"]["kernel"]),
        sd["blocks.1.attention.qkv.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["point_encoder"]["first_0"]["kernel"]),
        sd["point_encoder.encoder.first_conv.0.weight"][:, :, 0].T,
    )
    fused = sd["point_encoder.encoder.second_conv.0.weight"][:, :, 0].T
    np.testing.assert_allclose(
        np.asarray(params["point_encoder"]["second_0_global"]["kernel"]), fused[:32]
    )
    np.testing.assert_allclose(
        np.asarray(params["point_encoder"]["second_0_local"]["kernel"]), fused[32:]
    )
    np.testing.assert_allclose(
        np.asarray(batch_stats["head"]["bn0"]["mean"]),
        sd["head.mlp_head.1.running_mean"],
    )
    np.testing.assert_allclose(
        np.asarray(params["head"]["out"]["kernel"]), sd["head.mlp_head.8.weight"].T
    )
    np.testing.assert_allclose(
        np.asarray(params["blocks_0"]["adapter"]["scale"]), sd["blocks.0.adapter.scale"]
    )

    # the imported model must run
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.zeros((2, 64, 4))
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_pix4point_reference_import():
    from pointvit_tpu.models import Pix4Point

    dim = 32
    model = Pix4Point(num_classes=15, embed_dim=dim, depth=1, num_heads=4, k_neighbors=4)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 3)))
    p = variables["params"]["model"]["patch_embed"]
    stage_dim = p["s0_conv1_0"]["kernel"].shape[-1]

    sd = {
        "model.patch_embed.convs.0.0.0.weight": _mark((stage_dim, 6, 1, 1), "c10"),
        "model.patch_embed.convs.0.0.1.weight": _mark((stage_dim, stage_dim, 1, 1), "c11"),
        "model.patch_embed.convs.0.0.1.bias": _mark((stage_dim,), "c11b"),
        "model.proj.weight": _mark((dim, stage_dim), "proj"),
        "model.proj.bias": _mark((dim,), "projb"),
        "model.pos_embed.0.weight": _mark((128, 3), "pe0"),
        "model.pos_embed.0.bias": _mark((128,), "pe0b"),
        "model.pos_embed.2.weight": _mark((dim, 128), "pe2"),
        "model.pos_embed.2.bias": _mark((dim,), "pe2b"),
        "model.cls_token": _mark((1, 1, dim), "cls"),
        "model.cls_pos": _mark((1, 1, dim), "clsp"),
        "model.vit.blocks.0.attn.qkv.weight": _mark((3 * dim, dim), "qkv"),
        "model.vit.norm.weight": _mark((dim,), "n"),
        "model.vit.norm.bias": _mark((dim,), "nb"),
        "cls_head.head.0.weight": _mark((256, 2 * dim), "h0"),
        "cls_head.head.8.weight": _mark((15, 256), "h8"),
    }
    params, batch_stats, loaded = load_reference_pix4point_checkpoint(variables, sd)
    assert loaded >= len(sd)
    np.testing.assert_allclose(
        np.asarray(params["model"]["proj"]["kernel"]), sd["model.proj.weight"].T
    )
    np.testing.assert_allclose(
        np.asarray(params["model"]["cls_pos"]), sd["model.cls_pos"]
    )
    np.testing.assert_allclose(
        np.asarray(params["model"]["norm"]["scale"]), sd["model.vit.norm.weight"]
    )
    np.testing.assert_allclose(
        np.asarray(params["model"]["blocks_0"]["attn"]["qkv"]["kernel"]),
        sd["model.vit.blocks.0.attn.qkv.weight"].T,
    )


def test_renderer_reference_import():
    from pointvit_tpu.models import renderer as rmod
    from pointvit_tpu.models import PointCloudRendererClassifier

    rmod.TORCHVISION_VIT_PRESETS["vit_test_ckpt"] = dict(
        patch_size=8, embed_dim=32, depth=1, num_heads=4
    )
    model = PointCloudRendererClassifier(
        num_classes=15, vit_name="vit_test_ckpt", adapter_dim=8, num_views=2,
        img_size=32, diff_renderer=True, view_transform_hidden=16,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 3))
    )
    sd = {
        "view_transform_net.point_encoder.0.weight": _mark((64, 3, 1), "e0"),
        "view_transform_net.azimuth_head.weight": _mark((2, 16), "az"),
        "view_transform_net.azimuth_head.bias": _mark((2,), "azb"),
        "vit.conv_proj.weight": _mark((32, 3, 8, 8), "cp"),
        "vit.class_token": _mark((1, 1, 32), "ct"),
        "vit.encoder.pos_embedding": _mark((1, 17, 32), "pe"),
        "vit.encoder.layers.0.vit_block.ln_1.weight": _mark((32,), "l1"),
        "vit.encoder.layers.0.vit_block.self_attention.in_proj_weight": _mark((96, 32), "inp"),
        "vit.encoder.layers.0.vit_block.mlp.0.weight": _mark((128, 32), "m0"),
        "vit.encoder.layers.0.adapter1.down_proj.weight": _mark((8, 32), "a1"),
        "view_aggregation": _mark((2,), "va"),
        "classifier.0.weight": _mark((32,), "c0"),
        "classifier.1.weight": _mark((512, 32), "c1"),
        "classifier.7.weight": _mark((15, 256), "c7"),
    }
    params, batch_stats, loaded = load_reference_renderer_checkpoint(variables, sd)
    assert loaded >= len(sd)
    np.testing.assert_allclose(
        np.asarray(params["vit"]["conv_proj"]["kernel"]),
        sd["vit.conv_proj.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(np.asarray(params["view_aggregation"]), sd["view_aggregation"])
    np.testing.assert_allclose(
        np.asarray(params["vit"]["encoder_layer_0"]["self_attention"]["qkv"]["kernel"]),
        sd["vit.encoder.layers.0.vit_block.self_attention.in_proj_weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["classifier"]["norm"]["scale"]), sd["classifier.0.weight"]
    )


def test_torch_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from pointvit_tpu.pretrained.reference_ckpt import load_reference_state_dict

    sd = {"encoder_norm.weight": torch.ones(8), "epoch_marker": torch.arange(3.0)}
    path = str(tmp_path / "ckpt.pt")
    torch.save({"model_state_dict": sd, "epoch": 3}, path)
    loaded = load_reference_state_dict(path)
    np.testing.assert_allclose(loaded["encoder_norm.weight"], np.ones(8))
