"""Sequence parallelism: ring attention == full einsum attention.

Pins, on the 8-virtual-device CPU mesh, that rotating K/V blocks through
the online-softmax recurrence (`parallel/sequence.py::ring_mha`) matches
the unsharded einsum reference exactly — forward and gradients, composed
with a data axis, at degenerate ring sizes, and in bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pointvit_tpu.parallel import ring_mha
from pointvit_tpu.parallel.sequence import ulysses_mha

# Exact-precision matmuls: this CPU backend's default f32 matmul runs a
# bf16-like fast path that visibly perturbs softmax logits (CLAUDE.md).
pytestmark = pytest.mark.usefixtures("highest_precision")


@pytest.fixture
def highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


B, S, H, D = 4, 24, 3, 8


def _qkv(key=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(
        jax.random.normal(k, (B, S, H, D), dtype) for k in ks
    )


def _reference(q, k, v):
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * (D**-0.5)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", w, v)


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


@pytest.mark.parametrize("n_seq", [1, 2, 4, 8])
def test_ring_mha_matches_reference(n_seq):
    q, k, v = _qkv()
    ref = _reference(q, k, v)
    mesh = _mesh((n_seq,), ("seq",))
    out = ring_mha(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ring_mha_with_data_axis():
    q, k, v = _qkv()
    ref = _reference(q, k, v)
    mesh = _mesh((2, 4), ("data", "seq"))
    out = ring_mha(q, k, v, mesh, data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ring_mha_grads_match_reference():
    q, k, v = _qkv()
    mesh = _mesh((4,), ("seq",))
    g = jax.random.normal(jax.random.PRNGKey(9), (B, S, H, D))

    def loss_ring(q, k, v):
        return jnp.sum(ring_mha(q, k, v, mesh) * g)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v) * g)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_ring_mha_bf16():
    q, k, v = _qkv(dtype=jnp.bfloat16)
    mesh = _mesh((4,), ("seq",))
    out = ring_mha(q, k, v, mesh)
    assert out.dtype == jnp.bfloat16
    ref = _reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    # f32 accumulators inside; only the final cast is bf16.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("n_seq", [1, 3])  # H=3 heads → n_seq must divide 3
def test_ulysses_mha_matches_reference(n_seq):
    q, k, v = _qkv()
    ref = _reference(q, k, v)
    mesh = _mesh((n_seq,), ("seq",))
    out = ulysses_mha(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ulysses_mha_with_data_axis_and_grads():
    # mesh (2, 3) = 6 of the 8 virtual devices; H=3 and S=24 divisible by 3
    q, k, v = _qkv()
    ref = _reference(q, k, v)
    mesh = _mesh((2, 3), ("data", "seq"))
    out = ulysses_mha(q, k, v, mesh, data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    g = jax.random.normal(jax.random.PRNGKey(9), (B, S, H, D))
    gr = jax.grad(lambda a, b, c: jnp.sum(ulysses_mha(a, b, c, mesh, data_axis="data") * g),
                  argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(lambda a, b, c: jnp.sum(_reference(a, b, c) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_ulysses_matches_ring():
    q, k, v = _qkv(key=3)
    mesh = _mesh((3,), ("seq",))
    np.testing.assert_allclose(
        np.asarray(ulysses_mha(q, k, v, mesh)),
        np.asarray(ring_mha(q, k, v, mesh)),
        rtol=1e-5, atol=1e-5,
    )


def test_ulysses_head_divisibility_rejected():
    q, k, v = _qkv()  # H=3 does not divide 2
    with pytest.raises(ValueError, match="heads"):
        ulysses_mha(q, k, v, _mesh((2,), ("seq",)))


def test_ring_mha_shape_validation():
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="not divisible"):
        ring_mha(q[:, :18], k[:, :18], v[:, :18], _mesh((4,), ("seq",)))
    with pytest.raises(ValueError, match="not divisible"):
        ring_mha(q[:3], k[:3], v[:3], _mesh((2, 2), ("data", "seq")), data_axis="data")
