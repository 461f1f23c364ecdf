"""Pipeline parallelism: GPipe schedule over pipe mesh == sequential trunk.

The reference has no distribution (SURVEY.md §2); `parallel/pipeline.py` is
TPU-rebuild scaling surface. These tests pin, on the 8-virtual-device CPU
mesh, that streaming microbatches through `pipe`-sharded stage groups
produces the same outputs AND the same parameter/input gradients as applying
the stacked blocks sequentially on one device — including composed with a
data axis, with remat, and at degenerate stage counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

# Exact-precision matmuls: this CPU backend's default f32 matmul runs a
# bf16-like fast path, which makes the two schedules' reduction orders
# diverge visibly (CLAUDE.md).
pytestmark = pytest.mark.usefixtures("highest_precision")


@pytest.fixture
def highest_precision():
    with jax.default_matmul_precision("highest"):
        yield

from pointvit_tpu.nn.vit import APFBlock
from pointvit_tpu.parallel.pipeline import (
    pipeline_blocks,
    stack_block_params,
    unstack_block_params,
)

DEPTH, HEADS, EMB = 8, 4, 32
BATCH, TOKENS = 8, 12


def _trunk():
    """A DEPTH-block APF trunk as (block_apply, stacked_params, tokens)."""
    block = APFBlock(num_heads=HEADS, adapter_bottleneck=8, implementation="xla")
    keys = jax.random.split(jax.random.PRNGKey(0), DEPTH)
    x0 = jnp.zeros((1, TOKENS, EMB))
    params = {
        f"blocks_{i}": block.init(keys[i], x0)["params"] for i in range(DEPTH)
    }
    tokens = jax.random.normal(jax.random.PRNGKey(7), (BATCH, TOKENS, EMB))

    def block_apply(p, x):
        # The 1/3 damp keeps activations O(1): random-init APF blocks roughly
        # triple activation scale per block (double-residual quirk), and 3^8
        # ~ 6.5e3 turns f32 cancellation noise into visible diffs. The
        # pipeline machinery is agnostic to what the block computes.
        return block.apply({"params": p}, x, deterministic=True) / 3.0

    stacked, depth = stack_block_params(params)
    assert depth == DEPTH
    return block_apply, stacked, tokens, params


def _sequential(block_apply, stacked, tokens):
    return jax.lax.scan(lambda h, p: (block_apply(p, h), None), tokens, stacked)[0]


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (8, 2), (2, 1), (1, 4)])
def test_pipeline_forward_matches_sequential(n_stages, n_micro):
    block_apply, stacked, tokens, _ = _trunk()
    ref = _sequential(block_apply, stacked, tokens)
    mesh = _mesh((n_stages,), ("pipe",))
    out = pipeline_blocks(
        block_apply, stacked, tokens, mesh, n_microbatches=n_micro
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_with_data_axis():
    block_apply, stacked, tokens, _ = _trunk()
    ref = _sequential(block_apply, stacked, tokens)
    mesh = _mesh((2, 4), ("data", "pipe"))
    out = pipeline_blocks(
        block_apply, stacked, tokens, mesh,
        n_microbatches=2, data_axis="data",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential():
    block_apply, stacked, tokens, _ = _trunk()
    mesh = _mesh((4,), ("pipe",))

    def loss_pipe(p, t):
        out = pipeline_blocks(block_apply, p, t, mesh, n_microbatches=4)
        return jnp.sum(out * out)

    def loss_seq(p, t):
        out = _sequential(block_apply, p, t)
        return jnp.sum(out * out)

    (lp, gp) = jax.value_and_grad(loss_pipe, argnums=(0, 1))(stacked, tokens)
    (ls, gs) = jax.value_and_grad(loss_seq, argnums=(0, 1))(stacked, tokens)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    flat_p = jax.tree.leaves(gp)
    flat_s = jax.tree.leaves(gs)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_pipeline_remat_matches():
    block_apply, stacked, tokens, _ = _trunk()
    mesh = _mesh((4,), ("pipe",))
    base = pipeline_blocks(block_apply, stacked, tokens, mesh, n_microbatches=2)
    remat = pipeline_blocks(
        block_apply, stacked, tokens, mesh, n_microbatches=2, remat=True
    )
    np.testing.assert_allclose(np.asarray(remat), np.asarray(base), rtol=1e-6)

    # remat must also keep gradients intact (it only changes what is saved)
    def loss(p):
        return jnp.sum(
            pipeline_blocks(
                block_apply, p, tokens, mesh, n_microbatches=2, remat=True
            )
        )

    g = jax.grad(loss)(stacked)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


def test_stack_unstack_roundtrip():
    _, stacked, _, params = _trunk()
    rebuilt = unstack_block_params(stacked)
    assert set(rebuilt) == set(params)
    for k in params:
        a = jax.tree.leaves(params[k])
        b = jax.tree.leaves(rebuilt[k])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_pipeline_shape_validation():
    block_apply, stacked, tokens, _ = _trunk()
    mesh3 = _mesh((3,), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(block_apply, stacked, tokens, mesh3, n_microbatches=2)
    mesh4 = _mesh((4,), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(block_apply, stacked, tokens, mesh4, n_microbatches=3)
