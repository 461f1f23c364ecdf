"""Equivalence tests for the fused group-encoder kernel (ops/pallas_encoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvit_tpu.nn.pointnet import GroupFeatureEncoder
from pointvit_tpu.ops.pallas_encoder import (
    fold_encoder_params,
    fused_group_encoder,
    reference_folded_encoder,
)

B, G, K, C, E = 2, 8, 4, 6, 32


def _init_encoder(seed=0, with_stats=True):
    enc = GroupFeatureEncoder(embed_dim=E)
    groups = jax.random.normal(jax.random.PRNGKey(seed), (B, G, K, C), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(1), groups, train=False)
    if with_stats:
        # non-trivial running stats so BN folding is actually exercised
        variables = jax.tree.map(lambda a: a, variables)
        bs = jax.tree.map(
            lambda a: a + 0.25 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
            variables["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": bs}
    return enc, variables, groups


def test_kernel_matches_xla_inference():
    enc, variables, groups = _init_encoder()
    with jax.default_matmul_precision("highest"):
        want = GroupFeatureEncoder(embed_dim=E, implementation="xla").apply(
            variables, groups, train=False
        )
        weights = fold_encoder_params(variables["params"], variables["batch_stats"])
        got = fused_group_encoder(
            groups.reshape(B * G, K, C), weights, True
        ).reshape(B, G, E)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_kernel_matches_reference_folded():
    enc, variables, groups = _init_encoder(seed=3)
    weights = fold_encoder_params(variables["params"], variables["batch_stats"])
    x = groups.reshape(B * G, K, C)
    with jax.default_matmul_precision("highest"):
        got = fused_group_encoder(x, weights, True)
        want = reference_folded_encoder(x, weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_module_auto_path_matches_xla():
    """implementation='fused' (interpret on CPU) == implementation='xla'."""
    enc, variables, groups = _init_encoder(seed=5)
    with jax.default_matmul_precision("highest"):
        want = GroupFeatureEncoder(embed_dim=E, implementation="xla").apply(
            variables, groups, train=False
        )
        got = GroupFeatureEncoder(embed_dim=E, implementation="fused").apply(
            variables, groups, train=False
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_train_mode_ignores_fused():
    """train=True must take the XLA/batch-stats path even when forced fused."""
    enc, variables, groups = _init_encoder(seed=7)
    out, upd = GroupFeatureEncoder(embed_dim=E, implementation="fused").apply(
        variables, groups, train=True, mutable=["batch_stats"]
    )
    ref, upd2 = GroupFeatureEncoder(embed_dim=E, implementation="xla").apply(
        variables, groups, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_flow_through_fused():
    enc, variables, groups = _init_encoder(seed=9)
    weights = fold_encoder_params(variables["params"], variables["batch_stats"])
    x = groups.reshape(B * G, K, C)

    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(lambda t: jnp.sum(fused_group_encoder(t, weights, True) ** 2))(x)
        g_ref = jax.grad(lambda t: jnp.sum(reference_folded_encoder(t, weights) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_shape_gate_falls_back():
    """B·G not divisible by 16 -> auto path must still produce correct output."""
    enc = GroupFeatureEncoder(embed_dim=E)
    groups = jax.random.normal(jax.random.PRNGKey(11), (1, 7, K, C), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(1), groups, train=False)
    out = enc.apply(variables, groups, train=False)
    assert out.shape == (1, 7, E)


def test_slim_second_stack_matches_xla():
    """Serving preset (second_width=E): fused kernel == XLA at the slim width."""
    enc = GroupFeatureEncoder(embed_dim=E, second_width=E)
    groups = jax.random.normal(jax.random.PRNGKey(13), (B, G, K, C), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(1), groups, train=False)
    assert variables["params"]["second_0_local"]["kernel"].shape == (E, E)
    with jax.default_matmul_precision("highest"):
        want = GroupFeatureEncoder(
            embed_dim=E, second_width=E, implementation="xla"
        ).apply(variables, groups, train=False)
        got = GroupFeatureEncoder(
            embed_dim=E, second_width=E, implementation="fused"
        ).apply(variables, groups, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


# --- Pix4Point P3Embed stage kernel (fused_p3_embed) ------------------------

from pointvit_tpu.nn.pointnet import P3Embed
from pointvit_tpu.ops.pallas_encoder import (
    fold_p3_stage_params,
    fused_p3_embed,
    reference_folded_p3,
)

P3_B, P3_N, P3_K, P3_E = 2, 64, 4, 32  # one stage: 64 pts -> 16 centers


def _init_p3(seed=0):
    emb = P3Embed(embed_dim=P3_E, k=P3_K)
    pts = jax.random.normal(jax.random.PRNGKey(seed), (P3_B, P3_N, 3), jnp.float32)
    variables = emb.init(jax.random.PRNGKey(1), pts, pts, train=False)
    # non-trivial running stats so BN folding is actually exercised
    bs = jax.tree.map(
        lambda a: a + 0.25 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["batch_stats"],
    )
    return {"params": variables["params"], "batch_stats": bs}, pts


def test_p3_kernel_matches_reference_folded():
    variables, _ = _init_p3(seed=3)
    weights = fold_p3_stage_params(variables["params"], variables["batch_stats"])
    x = jax.random.normal(jax.random.PRNGKey(4), (P3_B * 16, P3_K, 6), jnp.float32)
    with jax.default_matmul_precision("highest"):
        got = fused_p3_embed(x, weights, True)
        want = reference_folded_p3(x, weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_p3_module_fused_matches_xla():
    """P3Embed(implementation='fused') (interpret on CPU) == 'xla' inference."""
    variables, pts = _init_p3(seed=5)
    with jax.default_matmul_precision("highest"):
        cw, want = P3Embed(embed_dim=P3_E, k=P3_K, implementation="xla").apply(
            variables, pts, pts, train=False
        )
        cg, got = P3Embed(embed_dim=P3_E, k=P3_K, implementation="fused").apply(
            variables, pts, pts, train=False
        )
    np.testing.assert_allclose(np.asarray(cg), np.asarray(cw))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_p3_kernel_conv1_pair_fold_is_exact():
    """The folded (C,D) matmul == the module's two unfused conv1 Denses."""
    variables, pts = _init_p3(seed=6)
    p = variables["params"]
    v0 = p["s0_conv1_0"]["kernel"]
    v1 = p["s0_conv1_1"]["kernel"]
    b1 = p["s0_conv1_1"]["bias"]
    bn_p, bn_s = p["s0_conv1_bn"], variables["batch_stats"]["s0_conv1_bn"]
    s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
    t = bn_p["bias"] - bn_s["mean"] * s
    w01, c01 = fold_p3_stage_params(p, variables["batch_stats"])[:2]
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 6), jnp.float32)
    with jax.default_matmul_precision("highest"):
        want = ((x @ v0) @ v1 + b1) * s + t
        got = x @ w01 + c01
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_p3_train_mode_ignores_fused():
    variables, pts = _init_p3(seed=7)
    out, _ = P3Embed(embed_dim=P3_E, k=P3_K, implementation="fused").apply(
        variables, pts, pts, train=True, mutable=["batch_stats"]
    )
    ref, _ = P3Embed(embed_dim=P3_E, k=P3_K, implementation="xla").apply(
        variables, pts, pts, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), rtol=1e-5, atol=1e-5)


def test_p3_fused_gate_odd_group_count():
    """B·S % 16 != 0 falls back to the XLA stack instead of asserting."""
    emb = P3Embed(embed_dim=P3_E, k=P3_K)
    pts = jax.random.normal(jax.random.PRNGKey(8), (1, 28, 3), jnp.float32)  # S=7
    variables = emb.init(jax.random.PRNGKey(1), pts, pts, train=False)
    c, f = P3Embed(embed_dim=P3_E, k=P3_K, implementation="fused").apply(
        variables, pts, pts, train=False
    )
    assert f.shape == (1, 7, P3_E)
