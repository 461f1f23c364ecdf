"""Real-checkpoint-layout ingestion: HuggingFace ViTModel → our loaders.

Unlike ``test_pretrained.py`` (fabricated state dicts), these tests flow a
REAL third-party state dict — ``transformers.ViTModel`` (random weights but
the genuine layout, produced by the genuine library) — through the
converters, and validate the mapping NUMERICALLY: a full HF ViT forward must
equal our ImageViT forward after conversion (the serial adapters are exactly
identity at init: up-projection is zero-init).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pointvit_tpu.pretrained import (  # noqa: E402
    hf_vit_to_timm,
    is_hf_vit_state_dict,
    load_apf_vit_weights,
    load_torchvision_vit_weights,
)

# intermediate = 4·hidden to match ImageViT's fixed mlp_ratio of 4
E, DEPTH, HEADS, IMG, PATCH, MLP = 32, 2, 4, 8, 4, 128


@pytest.fixture(scope="module")
def hf_vit():
    cfg = transformers.ViTConfig(
        hidden_size=E,
        num_hidden_layers=DEPTH,
        num_attention_heads=HEADS,
        intermediate_size=MLP,
        image_size=IMG,
        patch_size=PATCH,
        layer_norm_eps=1e-6,  # flax.linen.LayerNorm default, for exact parity
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(11)
    model = transformers.ViTModel(cfg, add_pooling_layer=False).eval()
    # non-degenerate weights everywhere (HF inits some embeddings ~0)
    with torch.no_grad():
        model.embeddings.cls_token.normal_(0, 0.5)
        model.embeddings.position_embeddings.normal_(0, 0.5)
    return model


def test_detects_hf_layout(hf_vit):
    sd = {k: v.numpy() for k, v in hf_vit.state_dict().items()}
    assert is_hf_vit_state_dict(sd)
    assert not is_hf_vit_state_dict({"blocks.0.attn.qkv.weight": np.zeros(1)})


def test_hf_forward_matches_imagevit_after_conversion(hf_vit):
    """Full numerics: HF ViTModel forward == our ImageViT with converted
    weights (adapters identity at init). Covers patchify transpose, cls
    token, pos embed, packed qkv, MLP, and the final LN."""
    from pointvit_tpu.nn.vit import ImageViT

    rng = np.random.default_rng(5)
    img = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)

    vit = ImageViT(
        depth=DEPTH, embed_dim=E, num_heads=HEADS, patch_size=PATCH,
        adapter_bottleneck=4, dtype=jnp.float32,
    )
    variables = vit.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(img))

    sd = {k: v.numpy() for k, v in hf_vit.state_dict().items()}
    loaded = load_torchvision_vit_weights(
        {"vit": jax.tree.map(np.asarray, variables["params"])},
        "hf_vit_test",
        state_dict=sd,
    )
    assert loaded is not None

    with jax.default_matmul_precision("highest"):
        got = np.asarray(vit.apply({"params": loaded["vit"]}, jnp.asarray(img)))
    with torch.no_grad():
        # HF expects NCHW pixel values; last_hidden_state is post-final-LN
        expected = (
            hf_vit(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
            .last_hidden_state[:, 0]
            .numpy()
        )
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


def test_hf_to_timm_qkv_packing(hf_vit):
    """Packed qkv == concat(q, k, v) along the out dimension, per block."""
    sd = {k: v.numpy() for k, v in hf_vit.state_dict().items()}
    timm_sd = hf_vit_to_timm(sd)
    for i in range(DEPTH):
        q = sd[f"encoder.layer.{i}.attention.attention.query.weight"]
        k = sd[f"encoder.layer.{i}.attention.attention.key.weight"]
        v = sd[f"encoder.layer.{i}.attention.attention.value.weight"]
        np.testing.assert_array_equal(
            timm_sd[f"blocks.{i}.attn.qkv.weight"], np.concatenate([q, k, v], 0)
        )
        assert timm_sd[f"blocks.{i}.attn.qkv.bias"].shape == (3 * E,)
    assert "norm.weight" in timm_sd and "pos_embed" in timm_sd


def test_hf_flows_into_apf_loader(hf_vit):
    """load_apf_vit_weights auto-detects the HF layout and fills every block's
    attention/norm/mlp tensors."""
    from pointvit_tpu.models import AdaptPointFormer

    model = AdaptPointFormer(
        num_classes=5, in_channels=3, embedding_dim=E, npoint=8, nsample=4,
        depth=DEPTH, num_heads=HEADS,
    )
    pts = jnp.zeros((1, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts)
    sd = {k: v.numpy() for k, v in hf_vit.state_dict().items()}
    params = load_apf_vit_weights(variables["params"], "hf_vit_test", state_dict=sd)
    assert params is not None
    for i in range(DEPTH):
        got = params[f"blocks_{i}"]["attention"]["qkv"]["kernel"]
        q = sd[f"encoder.layer.{i}.attention.attention.query.weight"]
        k = sd[f"encoder.layer.{i}.attention.attention.key.weight"]
        v = sd[f"encoder.layer.{i}.attention.attention.value.weight"]
        np.testing.assert_allclose(
            np.asarray(got), np.concatenate([q, k, v], 0).T, rtol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(params["encoder_norm"]["scale"]), sd["layernorm.weight"], rtol=1e-6
    )


# ---------------------------------------------------------------------------
# File-artifact round trips: the tests above hand the converters an in-memory
# state dict; these write REAL checkpoint files (torch pickle / safetensors —
# genuine library serialization, genuine key sets and dtypes) into a weights
# cache and flow them through ``load_state_dict``'s format-sniffing loader,
# then validate the full forward numerics from the file.
# ---------------------------------------------------------------------------


def _assert_loads_numerically(hf_vit, model_name):
    """ImageViT weights loaded from <cache>/<model_name>.<ext> must reproduce
    the HF forward (same check as the in-memory test, via the file path)."""
    from pointvit_tpu.nn.vit import ImageViT

    rng = np.random.default_rng(7)
    img = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    vit = ImageViT(
        depth=DEPTH, embed_dim=E, num_heads=HEADS, patch_size=PATCH,
        adapter_bottleneck=4, dtype=jnp.float32,
    )
    variables = vit.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(img))
    loaded = load_torchvision_vit_weights(
        {"vit": jax.tree.map(np.asarray, variables["params"])}, model_name
    )
    assert loaded is not None
    with jax.default_matmul_precision("highest"):
        got = np.asarray(vit.apply({"params": loaded["vit"]}, jnp.asarray(img)))
    with torch.no_grad():
        expected = (
            hf_vit(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
            .last_hidden_state[:, 0]
            .numpy()
        )
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


def test_torch_pickle_checkpoint_file(hf_vit, tmp_path, monkeypatch):
    """torch.save artifact → load_state_dict (.pth branch) → full numerics."""
    from pointvit_tpu.pretrained import load_state_dict

    monkeypatch.setenv("POINTVIT_WEIGHTS", str(tmp_path))
    torch.save(hf_vit.state_dict(), tmp_path / "hf_vit_pickle.pth")
    sd = load_state_dict("hf_vit_pickle")
    assert sd is not None and is_hf_vit_state_dict(sd)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    _assert_loads_numerically(hf_vit, "hf_vit_pickle")


def test_safetensors_checkpoint_file(hf_vit, tmp_path, monkeypatch):
    """safetensors artifact → load_state_dict (.safetensors branch) → numerics."""
    st = pytest.importorskip("safetensors.torch")
    from pointvit_tpu.pretrained import load_state_dict

    monkeypatch.setenv("POINTVIT_WEIGHTS", str(tmp_path))
    st.save_file(
        {k: v.contiguous() for k, v in hf_vit.state_dict().items()},
        str(tmp_path / "hf_vit_st.safetensors"),
    )
    sd = load_state_dict("hf_vit_st")
    assert sd is not None and is_hf_vit_state_dict(sd)
    _assert_loads_numerically(hf_vit, "hf_vit_st")


def test_bf16_torch_checkpoint_upcasts(hf_vit, tmp_path, monkeypatch):
    """Half-precision hub checkpoints load as f32 (Tensor.numpy() would raise
    on bf16); no tensor may be silently dropped."""
    from pointvit_tpu.pretrained import load_state_dict

    monkeypatch.setenv("POINTVIT_WEIGHTS", str(tmp_path))
    full = hf_vit.state_dict()
    torch.save(
        {k: v.to(torch.bfloat16) for k, v in full.items()},
        tmp_path / "hf_vit_bf16.pth",
    )
    sd = load_state_dict("hf_vit_bf16")
    assert sd is not None and set(sd) == set(full)
    assert all(v.dtype == np.float32 for v in sd.values())
    np.testing.assert_allclose(
        sd["layernorm.weight"],
        full["layernorm.weight"].to(torch.bfloat16).float().numpy(),
    )
