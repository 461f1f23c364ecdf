"""Fused-attention kernel tests (Pallas interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvit_tpu.ops.pallas_attention import (
    _mha_pallas,
    _mha_qkv_pallas,
    _reference_mha_qkv,
    fused_mha_qkv,
    reference_mha,
)


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_mha_kernel_matches_reference():
    B, S, H, D = 2, 24, 4, 16
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    ref = reference_mha(q, k, v)
    got = _mha_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_mha_qkv_kernel_matches_reference():
    B, S, H, D = 2, 24, 4, 16
    qkv = _rand((B, S, 3 * H * D), 3)
    ref = _reference_mha_qkv(qkv, H)
    got = _mha_qkv_pallas(qkv, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_mha_qkv_odd_batch_and_legacy_fallback(monkeypatch):
    """Odd B takes the 1-item two-pass kernel; a zero scratch budget forces
    the legacy per-head kernel. All three agree with the einsum reference."""
    import pointvit_tpu.ops.pallas_attention as pa

    B, S, H, D = 3, 20, 4, 16
    qkv = _rand((B, S, 3 * H * D), 11)
    ref = _reference_mha_qkv(qkv, H)
    got_odd = _mha_qkv_pallas(qkv, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got_odd), np.asarray(ref), rtol=1e-5, atol=1e-5)

    monkeypatch.setattr(pa, "_TWO_PASS_SCRATCH_BUDGET", 0)
    qkv2 = _rand((5, S, 3 * H * D), 12)  # new shape → new trace under the patch
    ref2 = _reference_mha_qkv(qkv2, H)
    got_legacy = _mha_qkv_pallas(qkv2, H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_legacy), np.asarray(ref2), rtol=1e-5, atol=1e-5
    )


def test_fused_mha_qkv_grads_match_reference():
    B, S, H, D = 1, 16, 2, 8
    qkv = _rand((B, S, 3 * H * D), 4)

    # custom_vjp backward recomputes through the reference — must equal the
    # plain autodiff gradient of the reference implementation.
    g_fused = jax.grad(
        lambda t: jnp.sum(_reference_mha_qkv(t, H) ** 2)
    )(qkv)
    _, vjp = jax.vjp(lambda t: _reference_mha_qkv(t, H), qkv)
    cot = 2 * _reference_mha_qkv(qkv, H)
    (g_manual,) = vjp(cot)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_manual), rtol=1e-5, atol=1e-6
    )


def test_mha_qkv_bwd_kernel_matches_einsum_vjp():
    """The flash-style Pallas backward (interpret mode) must match jax.vjp
    of the reference einsum formulation — the fallback it replaces on TPU."""
    from pointvit_tpu.ops.pallas_attention import _bwd_pallas_ok, _mha_qkv_bwd_pallas

    for B, S, H, D, seed in [(2, 24, 4, 16, 6), (3, 197, 2, 32, 7)]:
        assert _bwd_pallas_ok(S, H, D)
        qkv = _rand((B, S, 3 * H * D), seed)
        g = _rand((B, S, H * D), seed + 10)
        with jax.default_matmul_precision("highest"):
            got = _mha_qkv_bwd_pallas(qkv, g, H, interpret=True)
            _, vjp = jax.vjp(lambda t: _reference_mha_qkv(t, H), qkv)
            (want,) = vjp(g)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )


def test_mha_qkv_bwd_kernel_bf16():
    """bf16 end-to-end (the training dtype): kernel vs einsum VJP at bf16
    tolerances."""
    from pointvit_tpu.ops.pallas_attention import _mha_qkv_bwd_pallas

    B, S, H, D = 2, 48, 4, 16
    qkv = _rand((B, S, 3 * H * D), 8).astype(jnp.bfloat16)
    g = _rand((B, S, H * D), 9).astype(jnp.bfloat16)
    got = _mha_qkv_bwd_pallas(qkv, g, H, interpret=True)
    _, vjp = jax.vjp(lambda t: _reference_mha_qkv(t, H), qkv)
    (want,) = vjp(g)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.06, atol=0.03,
    )


def test_bwd_pallas_gating():
    from pointvit_tpu.ops.pallas_attention import _bwd_chunk, _bwd_pallas_ok

    assert _bwd_pallas_ok(197, 12, 64)      # APF / renderer
    assert _bwd_chunk(197, 12) == 12        # full two-pass
    assert _bwd_pallas_ok(513, 6, 64)       # Pix4Point vit_small
    assert _bwd_chunk(513, 6) == 3          # head-chunked (12.6 MB full)
    assert not _bwd_pallas_ok(196, 12, 63)  # ragged head_dim
    assert not _bwd_pallas_ok(4096, 16, 64)  # nothing fits -> einsum VJP


def test_mha_qkv_bwd_chunked_matches_einsum_vjp():
    """Long-S shapes route to the head-chunked backward; must match the
    einsum VJP (Pix4Point vit_small geometry, scaled down in batch)."""
    from pointvit_tpu.ops.pallas_attention import _bwd_chunk, _mha_qkv_bwd_pallas

    B, S, H, D = 1, 513, 6, 64
    assert _bwd_chunk(S, H) == 3
    qkv = _rand((B, S, 3 * H * D), 12)
    g = _rand((B, S, H * D), 13)
    with jax.default_matmul_precision("highest"):
        got = _mha_qkv_bwd_pallas(qkv, g, H, interpret=True)
        _, vjp = jax.vjp(lambda t: _reference_mha_qkv(t, H), qkv)
        (want,) = vjp(g)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_softmax_rows_sum_to_one_property():
    # Behavioural check on the kernel: uniform inputs → uniform attention →
    # output equals the mean of v.
    B, S, H, D = 1, 8, 1, 8
    q = jnp.zeros((B, S, H, D))
    k = jnp.zeros((B, S, H, D))
    v = _rand((B, S, H, D), 5)
    out = _mha_pallas(q, k, v, interpret=True)
    expected = jnp.broadcast_to(jnp.mean(v, axis=1, keepdims=True), v.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


@pytest.mark.parametrize("K", [8, 16, 32])  # 16/32 = v2/exact bench presets
def test_knn_group_pallas_interpret_matches_xla(K):
    from pointvit_tpu.ops.knn import knn_gather, knn_indices
    from pointvit_tpu.ops.pallas_knn import knn_group_pallas

    B, N, S = 2, 64, 16
    pts = _rand((B, N, 3), 6)
    ctr = pts[:, :S]
    feats = jnp.concatenate([pts, pts[..., :1]], -1)
    idx_x = knn_indices(ctr, pts, K)
    g_x = knn_gather(feats, idx_x)
    idx_p, g_p = knn_group_pallas(pts, ctr, feats, K, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    # gathered values ride the split-bf16 payload: hi+lo reconstructs ~16
    # mantissa bits (consumers are bf16 = 8); indices stay exact
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-5, atol=2e-5)
    # the split itself must reconstruct to 2^-16 relative
    f32 = np.asarray(feats, np.float32)
    hi = f32.astype(np.dtype("bfloat16") if hasattr(np, "bfloat16") else np.float32)
    recon = np.asarray(jnp.asarray(f32).astype(jnp.bfloat16).astype(jnp.float32)) + np.asarray(
        (jnp.asarray(f32) - jnp.asarray(f32).astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_allclose(recon, f32, rtol=2e-5, atol=2e-5)


def test_fused_attention_block_matches_reference():
    from pointvit_tpu.ops.pallas_attention import (
        _attn_block_pallas,
        _reference_attn_block,
    )

    B, S, H, D = 2, 16, 2, 8
    E = H * D
    x = _rand((B, S, E), 7)
    wqkv = _rand((E, 3 * E), 8) * 0.1
    bqkv = _rand((3 * E,), 9) * 0.1
    wproj = _rand((E, E), 10) * 0.1
    bproj = _rand((E,), 11) * 0.1
    ref = _reference_attn_block(x, wqkv, bqkv, wproj, bproj, H)
    got = _attn_block_pallas(x, wqkv, bqkv, wproj, bproj, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_attention_block_grads():
    from pointvit_tpu.ops.pallas_attention import (
        _reference_attn_block,
        fused_attention_block,
    )

    B, S, H, D = 1, 8, 2, 4
    E = H * D
    args = (_rand((B, S, E), 12), _rand((E, 3 * E), 13) * 0.1,
            _rand((3 * E,), 14) * 0.1, _rand((E, E), 15) * 0.1,
            _rand((E,), 16) * 0.1)
    # the custom-vjp backward must equal plain autodiff of the reference
    g_ref = jax.grad(lambda *a: jnp.sum(_reference_attn_block(*a, num_heads=H) ** 2),
                     argnums=(0, 1, 2, 3, 4))(*args)
    _, vjp = jax.vjp(lambda *a: _reference_attn_block(*a, num_heads=H), *args)
    cot = 2 * _reference_attn_block(*args, num_heads=H)
    g_man = vjp(cot)
    for a, b in zip(g_ref, g_man):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_two_pass_dispatch_respects_vmem_budget():
    """Pix4Point's vit_small shape (S=513, H=6) OOM'd Mosaic's 16 MB scoped
    VMEM with the two-pass scratch (6.3 MB logits/item + blocks); it must
    route to the single-pass kernel. APF/renderer shapes keep 2-item
    two-pass."""
    from pointvit_tpu.ops.pallas_attention import _two_pass_items

    assert _two_pass_items(256, 196, 12) == 2   # APF
    assert _two_pass_items(48, 197, 12) == 2    # renderer B*V
    assert _two_pass_items(64, 513, 6) == 0     # Pix4Point vit_small
    assert _two_pass_items(3, 196, 12) == 1     # odd batch


def test_knn_group_pallas_n2048_lane_bits():
    """N=2048 engages the 11-bit lane packing (Pix4Point's native shape);
    indices must match XLA top_k away from near-ties."""
    from pointvit_tpu.ops.knn import knn_gather, knn_indices
    from pointvit_tpu.ops.pallas_knn import _lane_bits, knn_group_pallas

    assert _lane_bits(1024) == 10 and _lane_bits(1025) == 11 and _lane_bits(2048) == 11

    B, N, S, K = 1, 2048, 32, 16
    pts = _rand((B, N, 3), 11)
    ctr = pts[:, :S]
    idx_x = knn_indices(ctr, pts, K)
    idx_p, g_p = knn_group_pallas(pts, ctr, pts, K, interpret=True)
    match = (np.sort(np.asarray(idx_p), -1) == np.sort(np.asarray(idx_x), -1)).mean()
    assert match > 0.995, match
    g_x = knn_gather(pts, idx_x)
    same = np.sort(np.asarray(idx_p), -1) == np.sort(np.asarray(idx_x), -1)
    np.testing.assert_allclose(
        np.sort(np.asarray(g_p), 2)[same], np.sort(np.asarray(g_x), 2)[same],
        rtol=2e-5, atol=2e-5,
    )


def test_chunked_two_pass_matches_reference_long_seq():
    """S=513/H=6 (Pix4Point vit_small) routes to the head-chunked two-pass
    kernel; outputs must match the reference einsum formulation."""
    from pointvit_tpu.ops.pallas_attention import (
        _head_chunk,
        _mha_qkv_pallas,
        _reference_mha_qkv,
        _two_pass_items,
    )

    assert _two_pass_items(2, 513, 6) == 0
    assert _head_chunk(513, 6) == 3
    qkv = _rand((2, 513, 3 * 384), 21)
    with jax.default_matmul_precision("highest"):
        got = _mha_qkv_pallas(qkv, 6, interpret=True)
        want = _reference_mha_qkv(qkv, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
