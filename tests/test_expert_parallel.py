"""Expert parallelism: EP MoE FFN == single-device dense MoE.

Pins, on the 8-virtual-device CPU mesh, that the all_to_all dispatch
(`parallel/expert.py::moe_ffn`) matches the identical routing math run
unsharded — forward and gradients, composed with a data axis, at top_k 1
and 2, in bf16 — plus GShard capacity-drop semantics and the balance loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pointvit_tpu.parallel import init_moe_params, moe_ffn
from pointvit_tpu.parallel.expert import upcycle_dense_mlp

# Exact-precision matmuls: this CPU backend's default f32 matmul runs a
# bf16-like fast path that visibly perturbs router logits (CLAUDE.md).
pytestmark = pytest.mark.usefixtures("highest_precision")


@pytest.fixture
def highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


B, S, M, F, E = 8, 6, 16, 32, 4
# capacity_factor=E ⇒ per-expert capacity ≥ local_tokens·K: nothing drops on
# any shard layout, so the EP and dense paths are bitwise the same routing.
NODROP = float(E)


def _inputs(key=0, dtype=jnp.float32):
    kx, kp = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (B, S, M), dtype)
    params = init_moe_params(kp, M, F, E, dtype=jnp.float32)
    return x, params


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


@pytest.mark.parametrize("n_exp", [1, 2, 4])
@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_ffn_matches_dense(n_exp, top_k):
    x, params = _inputs()
    ref, _ = moe_ffn(x, params, None, top_k=top_k, capacity_factor=NODROP)
    mesh = _mesh((n_exp,), ("expert",))
    out, aux = moe_ffn(x, params, mesh, top_k=top_k, capacity_factor=NODROP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_ffn_with_data_axis():
    x, params = _inputs(key=1)
    ref, _ = moe_ffn(x, params, None, capacity_factor=NODROP)
    mesh = _mesh((2, 4), ("data", "expert"))
    out, _ = moe_ffn(x, params, mesh, data_axis="data", capacity_factor=NODROP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_ffn_grads_match_dense(top_k):
    x, params = _inputs(key=2)
    mesh = _mesh((4,), ("expert",))
    g = jax.random.normal(jax.random.PRNGKey(9), (B, S, M))

    # Note: the aux loss is deliberately excluded — its per-shard f_e/p_e are
    # pmean'd (mean of per-shard products), which differs from the dense
    # global estimator by design; only the token path is exactly equivalent.
    def loss(fn_mesh):
        def f(x, p):
            out, _ = moe_ffn(x, p, fn_mesh, top_k=top_k, capacity_factor=NODROP)
            return jnp.sum(out * g)

        return f

    gx_ep, gp_ep = jax.grad(loss(mesh), argnums=(0, 1))(x, params)
    gx_d, gp_d = jax.grad(loss(None), argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_ep), np.asarray(gx_d), rtol=2e-5, atol=2e-5)
    for k in gp_d:
        np.testing.assert_allclose(
            np.asarray(gp_ep[k]), np.asarray(gp_d[k]), rtol=2e-5, atol=2e-5, err_msg=k
        )
    # Router gets gradient through the gate-weighted combine (and the aux).
    assert float(jnp.max(jnp.abs(gp_d["gate"]))) > 0


def test_capacity_drop_zeroes_overflow_tokens():
    # Router biased so hard that every token's top-1 is expert 0; with
    # capacity_factor 1/K·E/T·C' the first C' slots survive, the rest drop to
    # exactly zero (GShard semantics) — callers keep the residual skip.
    # (Tokens made positive: the router is linear, so a constant gate column
    # only dominates when the token feature sum has a fixed sign.)
    x, params = _inputs(key=3)
    x = jnp.abs(x) + 0.1
    params = dict(params)
    params["gate"] = jnp.zeros_like(params["gate"]).at[:, 0].set(100.0)
    t = B * S
    cap = 4
    out, _ = moe_ffn(x, params, None, top_k=1, capacity_factor=cap * E / t)
    flat = np.asarray(out).reshape(t, M)
    assert np.all(flat[cap:] == 0)
    assert np.all(np.any(flat[:cap] != 0, axis=-1))


def test_moe_ffn_bf16():
    x, params = _inputs(key=4, dtype=jnp.bfloat16)
    mesh = _mesh((4,), ("expert",))
    out, aux = moe_ffn(x, params, mesh, capacity_factor=NODROP)
    assert out.dtype == jnp.bfloat16
    ref, _ = moe_ffn(x.astype(jnp.float32), params, None, capacity_factor=NODROP)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )
    assert np.isfinite(float(aux))


def test_moe_ffn_shape_validation():
    x, params = _inputs()
    with pytest.raises(ValueError, match="experts"):
        moe_ffn(x, params, _mesh((3,), ("expert",)))
    with pytest.raises(ValueError, match="batch"):
        moe_ffn(x[:6], params, _mesh((4,), ("expert",)))
    with pytest.raises(ValueError, match="top_k"):
        moe_ffn(x, params, None, top_k=E + 1)


@pytest.mark.parametrize("top_k", [1, 2])
def test_upcycled_moe_preserves_dense_mlp(top_k):
    # Sparse upcycling + normalized gates: identical experts whose top-k
    # gates sum to 1 reproduce the dense MLP exactly (until experts diverge).
    x, _ = _inputs(key=6)
    k1, k2, kg = jax.random.split(jax.random.PRNGKey(7), 3)
    fc1_k = jax.random.normal(k1, (M, F)) * 0.1
    fc1_b = jax.random.normal(k1, (F,)) * 0.1
    fc2_k = jax.random.normal(k2, (F, M)) * 0.1
    fc2_b = jax.random.normal(k2, (M,)) * 0.1
    params = upcycle_dense_mlp(kg, fc1_k, fc1_b, fc2_k, fc2_b, E)

    tokens = x.reshape(-1, M)
    # Exact GELU: moe_ffn's default activation matches nn.layers.Mlp.
    dense_ref = (
        jax.nn.gelu(tokens @ fc1_k + fc1_b, approximate=False) @ fc2_k + fc2_b
    )

    mesh = _mesh((4,), ("expert",))
    out, _ = moe_ffn(
        x, params, mesh, top_k=top_k, capacity_factor=NODROP, normalize_gates=True
    )
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, M), np.asarray(dense_ref), rtol=1e-5, atol=1e-5
    )


def test_balance_loss_discriminates():
    # Uniform router → aux ≈ 1 (optimum); collapsed router → aux ≈ E.
    x, params = _inputs(key=5)
    x = jnp.abs(x) + 0.1  # positive token sums so a gate column dominates
    params_uniform = dict(params, gate=jnp.zeros_like(params["gate"]))
    _, aux_u = moe_ffn(x, params_uniform, None, top_k=1, capacity_factor=NODROP)
    params_collapsed = dict(
        params, gate=jnp.zeros_like(params["gate"]).at[:, 2].set(100.0)
    )
    _, aux_c = moe_ffn(x, params_collapsed, None, top_k=1, capacity_factor=NODROP)
    assert float(aux_c) > 0.9 * E
    assert float(aux_u) < float(aux_c)
