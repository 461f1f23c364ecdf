"""Pretrained-weight ingestion tests.

The highest-value check runs a *real* torchvision VisionTransformer (random
init — no downloads in this environment) and verifies our ImageViT with
mapped weights reproduces its forward outputs numerically: this validates
the name mapping, the kernel transposes, the patchify order, the attention
packing, and the architecture itself in one shot. (Our serial adapters are
near-identity at init — zero up-projections — so the adapted block equals
the vanilla block numerically at init.)

timm is not installed here; the timm-layout mappings are validated against
hand-built state dicts with timm's exact key names and torch layouts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointvit_tpu.pretrained import (
    load_apf_vit_weights,
    load_pix4point_vit_weights,
    load_torchvision_vit_weights,
    torch_linear_to_flax,
)


def _timm_like_state_dict(depth, dim, rng, prefix_extra=True):
    """Fabricate a timm ViT state dict (torch layouts: Linear = (out, in))."""
    sd = {}
    for i in range(depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"{p}.norm1.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"{p}.norm2.weight"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"{p}.norm2.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"{p}.attn.qkv.weight"] = rng.standard_normal((3 * dim, dim)).astype(np.float32)
        sd[f"{p}.attn.qkv.bias"] = rng.standard_normal(3 * dim).astype(np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.standard_normal((dim, dim)).astype(np.float32)
        sd[f"{p}.attn.proj.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.standard_normal((4 * dim, dim)).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = rng.standard_normal(4 * dim).astype(np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.standard_normal((dim, 4 * dim)).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = rng.standard_normal(dim).astype(np.float32)
    sd["norm.weight"] = rng.standard_normal(dim).astype(np.float32)
    sd["norm.bias"] = rng.standard_normal(dim).astype(np.float32)
    sd["cls_token"] = rng.standard_normal((1, 1, dim)).astype(np.float32)
    sd["pos_embed"] = rng.standard_normal((1, 10, dim)).astype(np.float32)
    return sd


class TestTimmMapping:
    def test_apf_full_load(self, rng):
        from pointvit_tpu.models import AdaptPointFormer

        dim, depth = 32, 2
        model = AdaptPointFormer(
            num_classes=5, embedding_dim=dim, npoint=8, nsample=4,
            in_channels=3, depth=depth, num_heads=4,
        )
        pts = jnp.zeros((1, 32, 3))
        params = model.init({"params": jax.random.PRNGKey(0)}, pts)["params"]
        sd = _timm_like_state_dict(depth, dim, rng)
        out = load_apf_vit_weights(params, "x", state_dict=sd)

        np.testing.assert_allclose(
            np.asarray(out["blocks_0"]["attention"]["qkv"]["kernel"]),
            sd["blocks.0.attn.qkv.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(out["blocks_1"]["mlp"]["fc2"]["kernel"]),
            sd["blocks.1.mlp.fc2.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(out["encoder_norm"]["scale"]), sd["norm.weight"]
        )
        # Untouched params stay intact (head).
        np.testing.assert_allclose(
            np.asarray(out["head"]["out"]["kernel"]),
            np.asarray(params["head"]["out"]["kernel"]),
        )

    def test_apf_reference_quirks_partial_load(self, rng):
        from pointvit_tpu.models import AdaptPointFormer

        dim, depth = 32, 1
        model = AdaptPointFormer(
            num_classes=5, embedding_dim=dim, npoint=8, nsample=4,
            in_channels=3, depth=depth, num_heads=4,
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 3))
        )["params"]
        sd = _timm_like_state_dict(depth, dim, rng)
        out = load_apf_vit_weights(params, "x", state_dict=sd, reference_quirks=True)
        # Quirks: attention + final norm stay random (the reference's
        # strict=False load never matches them, apf.py:323-331).
        np.testing.assert_allclose(
            np.asarray(out["blocks_0"]["attention"]["qkv"]["kernel"]),
            np.asarray(params["blocks_0"]["attention"]["qkv"]["kernel"]),
        )
        np.testing.assert_allclose(
            np.asarray(out["encoder_norm"]["scale"]),
            np.asarray(params["encoder_norm"]["scale"]),
        )
        # ...but MLP + norms load.
        np.testing.assert_allclose(
            np.asarray(out["blocks_0"]["mlp"]["fc1"]["kernel"]),
            sd["blocks.0.mlp.fc1.weight"].T,
        )

    def test_pix4point_load(self, rng):
        from pointvit_tpu.models import Pix4Point

        dim, depth = 32, 2
        model = Pix4Point(num_classes=5, embed_dim=dim, depth=depth, num_heads=4, k_neighbors=4)
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 3))
        )["params"]
        sd = _timm_like_state_dict(depth, dim, rng)
        out = load_pix4point_vit_weights(params, "x", state_dict=sd)
        np.testing.assert_allclose(
            np.asarray(out["model"]["blocks_1"]["attn"]["qkv"]["kernel"]),
            sd["blocks.1.attn.qkv.weight"].T,
        )
        np.testing.assert_allclose(np.asarray(out["model"]["cls_token"]), sd["cls_token"])
        np.testing.assert_allclose(
            np.asarray(out["model"]["cls_pos"]), sd["pos_embed"][:, :1, :]
        )

    def test_missing_cache_returns_none(self, tmp_path, monkeypatch):
        monkeypatch.setenv("POINTVIT_WEIGHTS", str(tmp_path))
        from pointvit_tpu.models import AdaptPointFormer

        model = AdaptPointFormer(
            num_classes=5, embedding_dim=16, npoint=4, nsample=2,
            in_channels=3, depth=1, num_heads=2,
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 16, 3))
        )["params"]
        with pytest.warns(UserWarning, match="No cached weights"):
            assert load_apf_vit_weights(params, "vit_base_patch16_224") is None

    def test_npz_cache_roundtrip(self, tmp_path, monkeypatch, rng):
        monkeypatch.setenv("POINTVIT_WEIGHTS", str(tmp_path))
        sd = _timm_like_state_dict(1, 16, rng)
        np.savez(tmp_path / "tiny_vit.npz", **sd)
        from pointvit_tpu.pretrained import load_state_dict

        loaded = load_state_dict("tiny_vit")
        assert loaded is not None
        np.testing.assert_allclose(loaded["norm.weight"], sd["norm.weight"])


def _build_torch_vit(dim, depth, heads, mlp_dim, patch, img):
    """A torch model with torchvision VisionTransformer's exact module names,
    layouts, and forward semantics (vision_transformer.py upstream):
    conv_proj → [cls | patches] + pos → EncoderBlocks (pre-LN, MHA, MLP) →
    encoder.ln → cls feature. torchvision itself isn't installed here."""
    import torch
    import torch.nn as nn

    class EncoderBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
            self.self_attention = nn.MultiheadAttention(dim, heads, batch_first=True)
            self.dropout = nn.Dropout(0.0)
            self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = nn.Sequential(
                nn.Linear(dim, mlp_dim), nn.GELU(), nn.Dropout(0.0),
                nn.Linear(mlp_dim, dim), nn.Dropout(0.0),
            )

        def forward(self, x):
            y = self.ln_1(x)
            y, _ = self.self_attention(y, y, y, need_weights=False)
            y = self.dropout(y)
            x = x + y
            y = self.mlp(self.ln_2(x))
            return x + y

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            n_tokens = (img // patch) ** 2 + 1
            self.pos_embedding = nn.Parameter(torch.randn(1, n_tokens, dim) * 0.02)
            self.layers = nn.ModuleDict(
                {f"encoder_layer_{i}": EncoderBlock() for i in range(depth)}
            )
            self.ln = nn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            x = x + self.pos_embedding
            for i in range(depth):
                x = self.layers[f"encoder_layer_{i}"](x)
            return self.ln(x)

    class ViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_proj = nn.Conv2d(3, dim, patch, patch)
            self.class_token = nn.Parameter(torch.zeros(1, 1, dim))
            self.encoder = Encoder()

        def forward(self, x):  # NCHW
            n = x.shape[0]
            x = self.conv_proj(x)
            x = x.reshape(n, dim, -1).permute(0, 2, 1)
            x = torch.cat([self.class_token.expand(n, -1, -1), x], dim=1)
            x = self.encoder(x)
            return x[:, 0]

    return ViT()


class TestTorchvisionNumericalParity:
    def test_imagevit_matches_torchvision_layout(self):
        """Map a (random-init) torchvision-layout torch ViT into ImageViT and
        compare forward outputs on random images — validates the name
        mapping, kernel transposes, qkv packing, patch ordering, and the
        architecture numerically. Our serial adapters are near-identity at
        init (zero up-projections), so the adapted block equals the vanilla
        block."""
        torch = pytest.importorskip("torch")

        from pointvit_tpu.nn import ImageViT

        torch.manual_seed(0)
        tv = _build_torch_vit(dim=64, depth=2, heads=4, mlp_dim=256, patch=16, img=32)
        tv.eval()
        sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
        # torchvision names attention weights in_proj_weight/in_proj_bias —
        # torch MultiheadAttention produces exactly those keys. Sequential MLP
        # gives mlp.0/mlp.3, one of the layouts the mapper handles.
        assert "encoder.layers.encoder_layer_0.self_attention.in_proj_weight" in sd
        assert "encoder.layers.encoder_layer_0.mlp.0.weight" in sd

        ours = ImageViT(depth=2, embed_dim=64, num_heads=4, patch_size=16,
                        adapter_bottleneck=8, dtype=jnp.float32)
        imgs = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(imgs))

        params = {"vit": jax.tree.map(np.asarray, variables["params"])}
        mapped = load_torchvision_vit_weights(params, "x", state_dict=sd)["vit"]

        # This XLA CPU build runs default-precision matmuls in a bf16-like
        # fast path; pin to highest so the comparison is f32-vs-f32.
        with jax.default_matmul_precision("highest"):
            got = np.asarray(ours.apply({"params": mapped}, jnp.asarray(imgs)))
        with torch.no_grad():
            expected = tv(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()

        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)
