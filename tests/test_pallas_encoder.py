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
