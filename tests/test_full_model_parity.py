"""End-to-end APF forward parity against an independent torch/numpy oracle.

The oracle replays the reference pipeline (``src/models/apf.py``) from raw
points to logits with fresh code: numpy FPS (start pinned to index 0, the
rebuild's ``key=None`` convention) → f64 kNN → centre-relative concat →
numpy Morton serialization → torch Encoder → torch APF blocks → LayerNorm →
max-pool → torch MLP head (eval mode). Block/encoder-level oracles live in
``test_reference_parity.py``; this test covers the composed model, including
the tokenizer hand-off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_reference_parity import (  # noqa: E402
    TorchAPFBlock,
    TorchGroupEncoder,
    _map_apf_block,
    _t2f,
)

B, N, C_IN, G, K, E, HEADS, DEPTH, CLASSES = 2, 64, 4, 8, 4, 32, 4, 2, 5


# -- numpy tokenizer oracle ---------------------------------------------------


def _np_part1by2(n):
    n = n & 0x000003FF
    n = (n ^ (n << 16)) & 0xFF0000FF
    n = (n ^ (n << 8)) & 0x0300F00F
    n = (n ^ (n << 4)) & 0x030C30C3
    n = (n ^ (n << 2)) & 0x09249249
    return n


def _np_morton_order(centers_f32):
    """Reference points_to_morton (apf_utils.py:66-104), resolution 1024."""
    pmin = centers_f32.min(axis=0, keepdims=True)
    pmax = centers_f32.max(axis=0, keepdims=True)
    normalized = (centers_f32 - pmin) / (pmax - pmin + 1e-8)
    d = (normalized * 1023).astype(np.int64)
    code = (
        (_np_part1by2(d[:, 2]) << 2)
        + (_np_part1by2(d[:, 1]) << 1)
        + _np_part1by2(d[:, 0])
    )
    return np.argsort(code, kind="stable")


def np_apf_group(points):
    """FPS(start 0) → kNN → centre-relative concat → Morton sort, per cloud."""
    out_nb = np.zeros((B, G, K, 2 * C_IN), np.float32)
    for b in range(B):
        xyz = points[b, :, :3].astype(np.float64)
        idx = np.zeros(G, np.int64)
        dist = np.full(N, 1e10)
        far = 0
        for i in range(G):
            idx[i] = far
            d = ((xyz - xyz[far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
        ctr = xyz[idx]  # (G, 3)
        ctr_feat = points[b][idx]  # (G, C) full features
        d2 = ((ctr[:, None, :] - xyz[None]) ** 2).sum(-1)  # (G, N)
        nb_idx = np.argsort(d2, axis=1, kind="stable")[:, :K]
        nb = points[b][nb_idx]  # (G, K, C)
        nb = nb - ctr_feat[:, None, :]
        nb = np.concatenate([nb, np.repeat(ctr_feat[:, None, :], K, axis=1)], -1)
        order = _np_morton_order(ctr.astype(np.float32))
        out_nb[b] = nb[order]
    return out_nb


# -- torch model oracle ---------------------------------------------------


class TorchHead(tnn.Module):
    """Reference ClassificationHead (apf.py:219-251), eval mode."""

    def __init__(self, e, classes):
        super().__init__()
        self.fc0 = tnn.Linear(e, 512)
        self.bn0 = tnn.BatchNorm1d(512)
        self.fc1 = tnn.Linear(512, 256)
        self.bn1 = tnn.BatchNorm1d(256)
        self.out = tnn.Linear(256, classes)

    def forward(self, x):
        x = torch.relu(self.bn0(self.fc0(x)))
        x = torch.relu(self.bn1(self.fc1(x)))
        return self.out(x)


def _rand_bn_stats(module):
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d,)):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)


def _map_group_encoder(te, p, bs, e):
    """Copy TorchGroupEncoder weights into GroupFeatureEncoder collections."""

    def conv_w(conv):
        return np.ascontiguousarray(conv.weight.detach().numpy()[:, :, 0].T)

    p["first_0"]["kernel"] = conv_w(te.first[0]); p["first_0"]["bias"] = te.first[0].bias.detach().numpy()
    p["first_1"]["kernel"] = conv_w(te.first[3]); p["first_1"]["bias"] = te.first[3].bias.detach().numpy()
    p["first_2"]["kernel"] = conv_w(te.first[6]); p["first_2"]["bias"] = te.first[6].bias.detach().numpy()
    fused = conv_w(te.second[0])
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


def test_full_apf_forward_matches_oracle():
    from pointvit_tpu.models import AdaptPointFormer

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    points = rng.standard_normal((B, N, C_IN)).astype(np.float32)

    # torch oracle modules with non-trivial weights/stats
    te = TorchGroupEncoder(2 * C_IN, E).eval()
    blocks = [TorchAPFBlock(E, HEADS, bottleneck=16).eval() for _ in range(DEPTH)]
    with torch.no_grad():
        for tb in blocks:
            tb.adapter.up_proj.weight.normal_(0, 0.05)
            tb.adapter.scale.fill_(1.2)
        _rand_bn_stats(te)
    norm = tnn.LayerNorm(E).eval()
    head = TorchHead(E, CLASSES).eval()
    with torch.no_grad():
        norm.weight.normal_(1.0, 0.1)
        norm.bias.normal_(0, 0.1)
        _rand_bn_stats(head)

    # our model, with the oracle's weights copied in
    model = AdaptPointFormer(
        num_classes=CLASSES, in_channels=C_IN, embedding_dim=E, npoint=G,
        nsample=K, depth=DEPTH, num_heads=HEADS, adapter_bottleneck=16,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(points[:1]))
    p = jax.tree.map(np.asarray, variables["params"])
    bs = jax.tree.map(np.asarray, variables["batch_stats"])

    _map_group_encoder(te, p["point_encoder"], bs["point_encoder"], E)
    for i, tb in enumerate(blocks):
        p[f"blocks_{i}"] = _map_apf_block(tb, p[f"blocks_{i}"])
    p["encoder_norm"]["scale"] = norm.weight.detach().numpy()
    p["encoder_norm"]["bias"] = norm.bias.detach().numpy()
    hp, hbs = p["head"], bs["head"]
    for i, (fc, bn) in enumerate(((head.fc0, head.bn0), (head.fc1, head.bn1))):
        hp[f"fc{i}"]["kernel"] = _t2f(fc.weight)
        hp[f"fc{i}"]["bias"] = fc.bias.detach().numpy()
        hp[f"bn{i}"]["scale"] = bn.weight.detach().numpy()
        hp[f"bn{i}"]["bias"] = bn.bias.detach().numpy()
        hbs[f"bn{i}"]["mean"] = bn.running_mean.detach().numpy()
        hbs[f"bn{i}"]["var"] = bn.running_var.detach().numpy()
    hp["out"]["kernel"] = _t2f(head.out.weight)
    hp["out"]["bias"] = head.out.bias.detach().numpy()

    with jax.default_matmul_precision("highest"):
        got = np.asarray(
            model.apply({"params": p, "batch_stats": bs}, jnp.asarray(points), train=False)
        )

    # oracle forward: numpy tokenizer → torch model
    nb = torch.from_numpy(np_apf_group(points))  # (B, G, K, 2C)
    with torch.no_grad():
        x = te(nb)  # (B, G, E)
        for tb in blocks:
            x = tb(x)
        x = norm(x)
        x = x.max(dim=-2)[0]
        expected = head(x).numpy()

    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


def test_tokenizer_matches_numpy_oracle():
    """apf_group alone vs the numpy FPS/kNN/Morton replay."""
    from pointvit_tpu.ops import apf_group

    rng = np.random.default_rng(3)
    points = rng.standard_normal((B, N, C_IN)).astype(np.float32)
    nb, _ = jax.jit(
        lambda pts: apf_group(pts, pts[..., :3], G, K)
    )(jnp.asarray(points))
    want = np_apf_group(points)
    np.testing.assert_allclose(np.asarray(nb), want, rtol=1e-5, atol=1e-6)
