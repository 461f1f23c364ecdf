"""Equivalence tests for the fused APF-block kernels (ops/pallas_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointvit_tpu.nn.vit import APFBlock
from pointvit_tpu.ops.pallas_block import (
    apf_block_weights,
    fused_apf_block,
    reference_apf_block,
)

B, S, E, H = 2, 10, 32, 4


def _init_block(seed=0):
    block = APFBlock(H, adapter_bottleneck=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, S, E), jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(1)}, x)
    # non-trivial adapter (reference zero-inits up_proj) and scale
    p = variables["params"]
    p = jax.tree.map(lambda a: a, p)
    p["adapter"]["up_proj"]["kernel"] = (
        0.05 * jax.random.normal(jax.random.PRNGKey(2), p["adapter"]["up_proj"]["kernel"].shape)
    )
    p["adapter"]["scale"] = jnp.asarray([1.3])
    return {"params": p}, x


def test_fused_block_matches_xla_inference():
    variables, x = _init_block()
    with jax.default_matmul_precision("highest"):
        want = APFBlock(H, adapter_bottleneck=16, implementation="xla").apply(
            variables, x, deterministic=True
        )
        got = APFBlock(H, adapter_bottleneck=16, implementation="fused").apply(
            variables, x, deterministic=True
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_kernel_matches_reference_impl():
    variables, x = _init_block(seed=3)
    w = apf_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        got = fused_apf_block(x, w, H, True)
        want = reference_apf_block(x, w, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_gradients_flow_through_fused_block():
    variables, x = _init_block(seed=5)
    w = apf_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(lambda t: jnp.sum(fused_apf_block(t, w, H, True) ** 2))(x)
        g_ref = jax.grad(lambda t: jnp.sum(reference_apf_block(t, w, H) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_training_mode_keeps_xla_path():
    """deterministic=False (dropout live) must not take the fused path —
    outputs must match the forced-XLA path exactly under the same rngs."""
    variables, x = _init_block(seed=7)
    rngs = {"dropout": jax.random.PRNGKey(9)}
    out_auto = APFBlock(H, adapter_bottleneck=16, dropout_rate=0.5).apply(
        variables, x, deterministic=False, rngs=rngs
    )
    out_xla = APFBlock(
        H, adapter_bottleneck=16, dropout_rate=0.5, implementation="xla"
    ).apply(variables, x, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla))
