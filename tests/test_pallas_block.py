"""Equivalence tests for the fused APF/ViT-block kernels (ops/pallas_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointvit_tpu.nn.vit import APFBlock, SerialAdapterBlock, ViTBlock
from pointvit_tpu.ops.pallas_block import (
    apf_block_weights,
    fused_apf_block,
    fused_serial_block,
    fused_vit_block,
    reference_apf_block,
    reference_serial_block,
    reference_vit_block,
    serial_block_weights,
    vit_block_weights,
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


def _init_vit_block(seed=0, S=S, E=E, H=H):
    block = ViTBlock(H, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, S, E), jnp.float32)
    pos = 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 100), (B, S, E), jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(1)}, x)
    return variables, x, pos


def test_fused_vit_block_matches_xla_inference():
    variables, x, pos = _init_vit_block()
    with jax.default_matmul_precision("highest"):
        want = ViTBlock(H, implementation="xla").apply(
            variables, x, pos=pos, deterministic=True
        )
        got = ViTBlock(H, implementation="fused").apply(
            variables, x, pos=pos, deterministic=True
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_fused_vit_block_no_pos():
    variables, x, _ = _init_vit_block(seed=2)
    with jax.default_matmul_precision("highest"):
        want = ViTBlock(H, implementation="xla").apply(variables, x, deterministic=True)
        got = ViTBlock(H, implementation="fused").apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_vit_kernel_matches_reference_impl():
    variables, x, pos = _init_vit_block(seed=3)
    w = vit_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        got = fused_vit_block(x, w, H, pos, True)
        want = reference_vit_block(x, w, H, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_vit_kernel_head_chunked_schedule():
    """Pix4Point geometry (S=513 → head-chunked two-pass) vs the oracle."""
    variables, x, pos = _init_vit_block(seed=4, S=513, E=96, H=6)
    from pointvit_tpu.ops import pallas_block

    assert pallas_block._vit_attn_chunk(513, 6) == 3  # the Pix4Point case
    w = vit_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        got = fused_vit_block(x, w, 6, pos, True)
        want = reference_vit_block(x, w, 6, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_gradients_flow_through_fused_vit_block():
    variables, x, pos = _init_vit_block(seed=5)
    w = vit_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        loss_f = lambda t, p: jnp.sum(fused_vit_block(t, w, H, p, True) ** 2)
        loss_r = lambda t, p: jnp.sum(reference_vit_block(t, w, H, p) ** 2)
        gx_f, gp_f = jax.grad(loss_f, argnums=(0, 1))(x, pos)
        gx_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(x, pos)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r), rtol=1e-4, atol=1e-4)


def test_fused_block_shapes_ok_gate():
    from pointvit_tpu.ops.pallas_block import fused_block_shapes_ok

    assert fused_block_shapes_ok(197, 768, 12)  # APF / renderer shape
    assert fused_block_shapes_ok(513, 384, 6)  # Pix4Point shape
    assert not fused_block_shapes_ok(10, 32, 3)  # E % H != 0 would mis-slice
    assert not fused_block_shapes_ok(10, 36, 9)  # head_dim 4 unaligned
    assert not fused_block_shapes_ok(1040, 768, 12)  # logits scratch > budget


def test_fused_raises_on_unsupported_config():
    """implementation='fused' must refuse (not silently run XLA) when the
    kernels can't support the configuration."""
    import pytest

    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, E), jnp.float32)
    with pytest.raises(ValueError, match="fused"):
        ViTBlock(3, implementation="fused").init({"params": jax.random.PRNGKey(1)}, x)
    variables, x, pos = _init_vit_block(seed=11)
    with pytest.raises(ValueError, match="mlp_ratio"):
        ViTBlock(H, mlp_ratio=3.0, implementation="fused").apply(
            variables, x, pos=pos, deterministic=True
        )


def test_fused_training_mode_falls_back_to_xla():
    """Documented exception to the force: stochastic calls keep the XLA path
    (the only one with dropout/drop-path) even under implementation='fused'."""
    variables, x, pos = _init_vit_block(seed=12)
    rngs = {"dropout": jax.random.PRNGKey(9)}
    out_fused = ViTBlock(H, dropout_rate=0.3, implementation="fused").apply(
        variables, x, pos=pos, deterministic=False, rngs=rngs
    )
    out_xla = ViTBlock(H, dropout_rate=0.3, implementation="xla").apply(
        variables, x, pos=pos, deterministic=False, rngs=rngs
    )
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla))


def test_vit_kernel_shared_pos():
    """A (1, S, E) shared positional embedding (constant-index BlockSpec
    path) matches the oracle, and its cotangent keeps the (1, S, E) shape."""
    variables, x, _ = _init_vit_block(seed=13)
    pos1 = 0.1 * jax.random.normal(jax.random.PRNGKey(14), (1, S, E), jnp.float32)
    w = vit_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        got = fused_vit_block(x, w, H, pos1, True)
        want = reference_vit_block(x, w, H, pos1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)
        gp_f = jax.grad(lambda p: jnp.sum(fused_vit_block(x, w, H, p, True) ** 2))(pos1)
        gp_r = jax.grad(lambda p: jnp.sum(reference_vit_block(x, w, H, p) ** 2))(pos1)
    assert gp_f.shape == (1, S, E)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r), rtol=1e-4, atol=1e-4)


def test_vit_training_mode_keeps_xla_path():
    """deterministic=False must not take the fused path — outputs must match
    the forced-XLA path exactly under the same rngs."""
    variables, x, pos = _init_vit_block(seed=7)
    rngs = {"dropout": jax.random.PRNGKey(9)}
    out_auto = ViTBlock(H, dropout_rate=0.3).apply(
        variables, x, pos=pos, deterministic=False, rngs=rngs
    )
    out_xla = ViTBlock(H, dropout_rate=0.3, implementation="xla").apply(
        variables, x, pos=pos, deterministic=False, rngs=rngs
    )
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla))


def _init_serial_block(seed=0):
    block = SerialAdapterBlock(H, adapter_bottleneck=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, S, E), jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(1)}, x)
    # non-trivial adapters (reference zero-inits the up projections)
    p = jax.tree.map(lambda a: a, variables["params"])
    for name in ("adapter1", "adapter2"):
        p[name]["up_proj"]["kernel"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(seed + 10), p[name]["up_proj"]["kernel"].shape
        )
    return {"params": p}, x


def test_fused_serial_block_matches_xla_inference():
    variables, x = _init_serial_block()
    with jax.default_matmul_precision("highest"):
        want = SerialAdapterBlock(H, adapter_bottleneck=16, implementation="xla").apply(
            variables, x, deterministic=True
        )
        got = SerialAdapterBlock(H, adapter_bottleneck=16, implementation="fused").apply(
            variables, x, deterministic=True
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_serial_kernel_matches_reference_impl():
    variables, x = _init_serial_block(seed=3)
    w = serial_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        got = fused_serial_block(x, w, H, True)
        want = reference_serial_block(x, w, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_gradients_flow_through_fused_serial_block():
    variables, x = _init_serial_block(seed=5)
    w = serial_block_weights(variables["params"])
    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(lambda t: jnp.sum(fused_serial_block(t, w, H, True) ** 2))(x)
        g_ref = jax.grad(lambda t: jnp.sum(reference_serial_block(t, w, H) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_serial_training_mode_keeps_xla_path():
    variables, x = _init_serial_block(seed=7)
    rngs = {"dropout": jax.random.PRNGKey(9)}
    out_auto = SerialAdapterBlock(H, adapter_bottleneck=16, dropout_rate=0.3).apply(
        variables, x, deterministic=False, rngs=rngs
    )
    out_xla = SerialAdapterBlock(
        H, adapter_bottleneck=16, dropout_rate=0.3, implementation="xla"
    ).apply(variables, x, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla))


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
