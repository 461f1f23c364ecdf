"""Numerical parity tests against torch oracles built to the reference's
exact module definitions (timm/torchvision aren't installed here, so the
oracles replicate the reference's arithmetic directly from
``src/models/apf_utils.py`` / ``src/models/apf.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _t2f(w):
    return np.ascontiguousarray(w.detach().numpy().T)


class TorchAdapter(tnn.Module):
    """Reference AdapterLayer (apf_utils.py:162-233)."""

    def __init__(self, dim, bottleneck):
        super().__init__()
        self.adapter_norm = tnn.LayerNorm(dim)
        self.scale = tnn.Parameter(torch.ones(1))
        self.down_proj = tnn.Linear(dim, bottleneck)
        self.up_proj = tnn.Linear(bottleneck, dim)

    def forward(self, x):
        residual = x
        h = self.adapter_norm(x)
        h = torch.relu(self.down_proj(h))
        h = self.up_proj(h)
        return h * self.scale + residual


class TorchAPFBlock(tnn.Module):
    """Reference APFViTLayer (apf_utils.py:236-293) with its exact
    combination x = mlp(norm2(x)) + adapter(x) + x (double residual)."""

    def __init__(self, dim, heads, bottleneck=64):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.fc1 = tnn.Linear(dim, 4 * dim)
        self.fc2 = tnn.Linear(4 * dim, dim)
        self.adapter = TorchAdapter(dim, bottleneck)
        self.heads = heads

    def attention(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))

    def forward(self, x):
        x = x + self.attention(self.norm1(x))
        adapt = self.adapter(x)
        mlp = self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))
        return mlp + adapt + x


def _map_apf_block(tb, params):
    """Copy torch oracle weights into our APFBlock param tree."""
    p = jax.tree.map(np.asarray, params)
    p["norm1"]["scale"] = tb.norm1.weight.detach().numpy()
    p["norm1"]["bias"] = tb.norm1.bias.detach().numpy()
    p["norm2"]["scale"] = tb.norm2.weight.detach().numpy()
    p["norm2"]["bias"] = tb.norm2.bias.detach().numpy()
    p["attention"]["qkv"]["kernel"] = _t2f(tb.qkv.weight)
    p["attention"]["qkv"]["bias"] = tb.qkv.bias.detach().numpy()
    p["attention"]["proj"]["kernel"] = _t2f(tb.proj.weight)
    p["attention"]["proj"]["bias"] = tb.proj.bias.detach().numpy()
    p["mlp"]["fc1"]["kernel"] = _t2f(tb.fc1.weight)
    p["mlp"]["fc1"]["bias"] = tb.fc1.bias.detach().numpy()
    p["mlp"]["fc2"]["kernel"] = _t2f(tb.fc2.weight)
    p["mlp"]["fc2"]["bias"] = tb.fc2.bias.detach().numpy()
    ad = p["adapter"]
    ad["adapter_norm"]["scale"] = tb.adapter.adapter_norm.weight.detach().numpy()
    ad["adapter_norm"]["bias"] = tb.adapter.adapter_norm.bias.detach().numpy()
    ad["down_proj"]["kernel"] = _t2f(tb.adapter.down_proj.weight)
    ad["down_proj"]["bias"] = tb.adapter.down_proj.bias.detach().numpy()
    ad["up_proj"]["kernel"] = _t2f(tb.adapter.up_proj.weight)
    ad["up_proj"]["bias"] = tb.adapter.up_proj.bias.detach().numpy()
    ad["scale"] = tb.adapter.scale.detach().numpy()
    return p


def test_apf_block_matches_torch_oracle():
    from pointvit_tpu.nn import APFBlock

    torch.manual_seed(0)
    dim, heads = 64, 4
    tb = TorchAPFBlock(dim, heads).eval()
    # make the adapter non-trivial (reference zero-inits up_proj)
    with torch.no_grad():
        tb.adapter.up_proj.weight.normal_(0, 0.05)

    x = np.random.default_rng(0).standard_normal((2, 10, dim)).astype(np.float32)
    ours = APFBlock(heads, adapter_bottleneck=64, dtype=jnp.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    mapped = _map_apf_block(tb, variables["params"])

    with jax.default_matmul_precision("highest"):
        got = np.asarray(ours.apply({"params": mapped}, jnp.asarray(x)))
    with torch.no_grad():
        expected = tb(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


class TorchGroupEncoder(tnn.Module):
    """Reference Encoder (apf.py:114-181): Conv1d stacks over (BG, C, K)."""

    def __init__(self, in_ch, e):
        super().__init__()
        self.first = tnn.Sequential(
            tnn.Conv1d(in_ch, 256, 1), tnn.BatchNorm1d(256), tnn.ReLU(),
            tnn.Conv1d(256, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, e, 1),
        )
        self.second = tnn.Sequential(
            tnn.Conv1d(2 * e, 2 * e, 1), tnn.BatchNorm1d(2 * e), tnn.ReLU(),
            tnn.Conv1d(2 * e, e, 1),
        )
        self.e = e

    def forward(self, groups):  # (B, G, K, C)
        B, G, K, C = groups.shape
        x = groups.reshape(B * G, K, C).transpose(2, 1)
        f = self.first(x)
        g = torch.max(f, dim=2, keepdim=True)[0]
        f = torch.cat([g.expand(-1, -1, K), f], dim=1)
        f = self.second(f)
        return torch.max(f, dim=2)[0].reshape(B, G, self.e)


def test_group_encoder_matches_torch_oracle():
    """Eval-mode parity: our split-matmul encoder equals the reference's
    fused concat formulation when the split kernels are the slices of the
    fused kernel (W·[g; l] = W_g·g + W_l·l)."""
    from pointvit_tpu.nn import GroupFeatureEncoder

    torch.manual_seed(1)
    in_ch, e = 6, 32
    te = TorchGroupEncoder(in_ch, e).eval()
    # randomize running stats so BN is non-trivial
    with torch.no_grad():
        for m in te.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    groups = np.random.default_rng(1).standard_normal((2, 4, 8, in_ch)).astype(np.float32)
    ours = GroupFeatureEncoder(e, dtype=jnp.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(groups))
    p = jax.tree.map(np.asarray, variables["params"])
    bs = jax.tree.map(np.asarray, variables["batch_stats"])

    def conv_w(conv):  # Conv1d k=1 weight (out, in, 1) → Dense kernel (in, out)
        return np.ascontiguousarray(conv.weight.detach().numpy()[:, :, 0].T)

    p["first_0"]["kernel"] = conv_w(te.first[0]); p["first_0"]["bias"] = te.first[0].bias.detach().numpy()
    p["first_1"]["kernel"] = conv_w(te.first[3]); p["first_1"]["bias"] = te.first[3].bias.detach().numpy()
    p["first_2"]["kernel"] = conv_w(te.first[6]); p["first_2"]["bias"] = te.first[6].bias.detach().numpy()
    fused = conv_w(te.second[0])  # (2e, 2e): rows 0:e = global half, e:2e = local
    p["second_0_global"]["kernel"] = fused[:e]
    p["second_0_global"]["bias"] = te.second[0].bias.detach().numpy()
    p["second_0_local"]["kernel"] = fused[e:]
    p["second_1"]["kernel"] = conv_w(te.second[3]); p["second_1"]["bias"] = te.second[3].bias.detach().numpy()

    for ours_bn, tbn in (
        ("first_bn0", te.first[1]), ("first_bn1", te.first[4]), ("second_bn0", te.second[1]),
    ):
        p[ours_bn]["scale"] = tbn.weight.detach().numpy()
        p[ours_bn]["bias"] = tbn.bias.detach().numpy()
        bs[ours_bn]["mean"] = tbn.running_mean.detach().numpy()
        bs[ours_bn]["var"] = tbn.running_var.detach().numpy()

    with jax.default_matmul_precision("highest"):
        got = np.asarray(
            ours.apply({"params": p, "batch_stats": bs}, jnp.asarray(groups))
        )
    with torch.no_grad():
        expected = te(torch.from_numpy(groups)).numpy()
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)
