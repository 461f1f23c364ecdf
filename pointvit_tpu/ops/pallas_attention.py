"""Pallas TPU kernel: fused multi-head attention for short sequences.

The models here attend over 196–513 tokens — a single VMEM tile. XLA's
attention at these shapes round-trips the (B, H, S, S) probability tensor
through HBM (≈120 MB at the APF shape) three times; this kernel keeps Q/K/V
and the logits in VMEM per batch item and loops heads with static slices,
so the only HBM traffic is Q/K/V in and O out. ~3× over
``jax.nn.dot_product_attention`` at (B=256, S=196, H=12, D=64).

Numerics match the standard formulation: f32 logit accumulation on the MXU,
f32 max-subtracted softmax, bf16 output.

Differentiation: custom VJPs. On TPU at shapes whose scratch fits VMEM the
backward is the fused flash-style kernel (:func:`_mha_qkv_bwd_pallas` —
recompute logits + softmax in VMEM, emit packed d_qkv in one pass);
elsewhere it falls back to ``jax.vjp`` of the reference einsum
implementation. Forward passes (inference, and the forward leg of training)
always take the kernel path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mha", "fused_mha_qkv", "reference_mha"]


def reference_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Einsum attention; q/k/v: (B, S, H, D) → (B, S, H, D)."""
    D = q.shape[-1]
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * (D**-0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", w, v)


def _attn_head(scale, q, k, v, o_ref, sl):
    logits = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (S, S) f32, stays in VMEM
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, :, sl] = jnp.dot(
        p.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _mha_qkv_kernel(num_heads: int, head_dim: int, qkv_ref, o_ref):
    """Variant taking the packed (S, 3·E) qkv projection directly — avoids
    the XLA q/k/v slice copies (3 × a full activation tensor of HBM traffic
    at the caller)."""
    scale = head_dim**-0.5
    E = num_heads * head_dim
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
        k = qkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim]
        v = qkv_ref[0, :, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim]
        _attn_head(scale, q, k, v, o_ref, sl)


# Two-pass scheduling: the per-head QK^T → softmax → PV chain serializes the
# MXU against the VPU (measured 20 TFLOP/s at B256/S196/H12/D64). Issuing all
# heads' QK^T matmuls back-to-back into an f32 VMEM scratch, doing ONE
# vectorized softmax, then all PV matmuls back-to-back lets Mosaic pipeline
# each unit's work: 1.486 → 1.042 ms/block measured (benchmarks/attn_variants.py).
#
# Budget: Mosaic's scoped-VMEM limit is 16 MB and the scratch shares it with
# the double-buffered qkv/out blocks and softmax temporaries. 4 MB keeps
# n_items=2 at the APF/renderer shapes (H12·S197² ≈ 1.9 MB/item) while
# pushing long-sequence shapes (Pix4Point vit_small: H6·S513² ≈ 6.3 MB,
# which OOM'd scoped VMEM at 16.3 MB total) to the single-pass kernel.
_TWO_PASS_SCRATCH_BUDGET = 4 * 2**20  # bytes of f32 logits scratch


def _two_pass_items(B: int, S: int, num_heads: int) -> int:
    """0 = use the single-pass kernel; else items per grid step (1 or 2)."""
    lg_bytes = num_heads * S * S * 4
    if B % 2 == 0 and 2 * lg_bytes <= _TWO_PASS_SCRATCH_BUDGET:
        return 2
    if lg_bytes <= _TWO_PASS_SCRATCH_BUDGET:
        return 1
    return 0


def _head_chunk(S: int, num_heads: int) -> int:
    """Largest head-chunk whose f32 logits scratch fits the budget (for
    long-S shapes where the full-head two-pass doesn't). 0 = none fits."""
    per_head = S * S * 4
    ch = min(num_heads, _TWO_PASS_SCRATCH_BUDGET // per_head)
    while ch > 1 and num_heads % ch:
        ch -= 1
    return ch


def _mha_qkv_kernel_chunked(
    num_heads: int, head_dim: int, chunk: int, qkv_ref, o_ref, lg_ref
):
    """Two-pass schedule over head chunks: all of a chunk's QK^T matmuls
    back-to-back into scratch → one vectorized softmax → the chunk's PV
    matmuls. Keeps the MXU/VPU pipelining win of the full two-pass kernel
    at sequence lengths whose full-head scratch exceeds scoped VMEM
    (Pix4Point vit_small: S=513, H=6 → 6.3 MB; chunks of 3 fit 3.2 MB)."""
    scale = head_dim**-0.5
    E = num_heads * head_dim
    for c in range(0, num_heads, chunk):
        for j in range(chunk):
            h = c + j
            q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
            k = qkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim]
            lg_ref[j] = (
                lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                * scale
            )
        lg = lg_ref[...]
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
        for j in range(chunk):
            h = c + j
            v = qkv_ref[0, :, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim]
            o_ref[0, :, h * head_dim : (h + 1) * head_dim] = jnp.dot(
                p[j], v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _mha_qkv_kernel_two_pass(
    num_heads: int, head_dim: int, n_items: int, qkv_ref, o_ref, lg_ref
):
    scale = head_dim**-0.5
    E = num_heads * head_dim
    for i in range(n_items):
        for h in range(num_heads):
            q = qkv_ref[i, :, h * head_dim : (h + 1) * head_dim]
            k = qkv_ref[i, :, E + h * head_dim : E + (h + 1) * head_dim]
            lg_ref[i * num_heads + h] = (
                lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                * scale
            )
    lg = lg_ref[...]
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
    for i in range(n_items):
        for h in range(num_heads):
            v = qkv_ref[i, :, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim]
            o_ref[i, :, h * head_dim : (h + 1) * head_dim] = jnp.dot(
                p[i * num_heads + h], v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mha_pallas(q, k, v, *, interpret: bool = False):
    """Split-layout entry: pack q/k/v and run the packed-qkv kernel (the
    serving path, incl. its two-pass schedule) — one implementation to
    maintain instead of a parallel single-pass kernel for this layout."""
    B, S, H, D = q.shape
    packed = jnp.concatenate([t.reshape(B, S, H * D) for t in (q, k, v)], axis=-1)
    return _mha_qkv_pallas(packed, H, interpret=interpret).reshape(B, S, H, D)


@jax.custom_vjp
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Fused attention; q/k/v: (B, S, H, D) → (B, S, H, D).

    Public split-head-layout API (for callers holding unpacked q/k/v — e.g.
    cross-attention experiments); the in-repo models project a packed qkv
    and call :func:`fused_mha_qkv` directly, skipping the concat."""
    return _mha_pallas(q, k, v)


def _fused_mha_fwd(q, k, v):
    return _mha_pallas(q, k, v), (q, k, v)


def _fused_mha_bwd(residuals, g):
    q, k, v = residuals
    B, S, H, D = q.shape
    if _on_tpu() and _bwd_pallas_ok(S, H, D):
        E = H * D
        packed = jnp.concatenate([t.reshape(B, S, E) for t in (q, k, v)], axis=-1)
        dqkv = _mha_qkv_bwd_pallas(packed, g.reshape(B, S, E), H)
        return tuple(
            dqkv[..., i * E : (i + 1) * E].reshape(B, S, H, D) for i in range(3)
        )
    # Recompute-style backward through the reference formulation.
    _, vjp = jax.vjp(reference_mha, *residuals)
    return vjp(g)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _mha_qkv_pallas(qkv, num_heads: int, *, interpret: bool = False):
    """qkv: (B, S, 3·E) packed [q | k | v] → (B, S, E)."""
    B, S, three_e = qkv.shape
    E = three_e // 3
    D = E // num_heads
    n_items = _two_pass_items(B, S, num_heads)
    if not n_items:
        ch = _head_chunk(S, num_heads)
        if ch > 1:
            return pl.pallas_call(
                functools.partial(_mha_qkv_kernel_chunked, num_heads, D, ch),
                grid=(B,),
                in_specs=[
                    pl.BlockSpec(
                        (1, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((B, S, E), qkv.dtype),
                scratch_shapes=[pltpu.VMEM((ch, S, S), jnp.float32)],
                interpret=interpret,
            )(qkv)
    if n_items:
        return pl.pallas_call(
            functools.partial(_mha_qkv_kernel_two_pass, num_heads, D, n_items),
            grid=(B // n_items,),
            in_specs=[
                pl.BlockSpec(
                    (n_items, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (n_items, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, S, E), qkv.dtype),
            scratch_shapes=[pltpu.VMEM((n_items * num_heads, S, S), jnp.float32)],
            interpret=interpret,
        )(qkv)
    kernel = functools.partial(_mha_qkv_kernel, num_heads, D)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), qkv.dtype),
        interpret=interpret,
    )(qkv)


# ---------------------------------------------------------------------------
# Flash-style backward: recompute logits + softmax in VMEM, then produce the
# packed d_qkv in one kernel. The XLA recompute VJP materializes the
# (B, H, S, S) probability/cotangent tensors in HBM several times — measured
# 14.0 of the 24.0 ms APF block backward at (256, 197) (DESIGN.md, r3
# corrected anatomy). Here every (S, S) tensor lives in two f32 VMEM
# scratches; HBM traffic is qkv + g in, d_qkv out.
#
# Schedule mirrors the forward two-pass win (MXU/VPU pipelining): all-head
# QK^T → one softmax → all-head dP → one softmax-VJP → all-head dQ/dK/dV.
# ---------------------------------------------------------------------------


def _mha_qkv_bwd_kernel(
    num_heads: int, head_dim: int, qkv_ref, g_ref, dqkv_ref, p_ref, t_ref
):
    """p_ref: probabilities scratch; t_ref: logits → dP → dS scratch
    (both (H, S, S) f32)."""
    scale = head_dim**-0.5
    E = num_heads * head_dim
    # Pass 1 (MXU): all heads' logits.
    for h in range(num_heads):
        q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
        k = qkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim]
        t_ref[h] = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
    # Pass 2 (VPU): one vectorized softmax over all heads.
    lg = t_ref[...]
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p_ref[...] = p / jnp.sum(p, axis=-1, keepdims=True)
    # Pass 3 (MXU): all heads' dP = g · Vᵀ.
    for h in range(num_heads):
        g = g_ref[0, :, h * head_dim : (h + 1) * head_dim]
        v = qkv_ref[0, :, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim]
        t_ref[h] = lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    # Pass 4 (VPU): softmax VJP, vectorized: dS = P ∘ (dP − Σ(dP ∘ P)) · scale.
    p = p_ref[...]
    dp = t_ref[...]
    t_ref[...] = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    # Pass 5 (MXU): dQ = dS·K, dK = dSᵀ·Q, dV = Pᵀ·g.
    for h in range(num_heads):
        q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
        k = qkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim]
        g = g_ref[0, :, h * head_dim : (h + 1) * head_dim]
        ds = t_ref[h].astype(q.dtype)
        pb = p_ref[h].astype(q.dtype)
        dqkv_ref[0, :, h * head_dim : (h + 1) * head_dim] = jnp.dot(
            ds, k, preferred_element_type=jnp.float32
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim] = lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim] = (
            lax.dot_general(
                pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(dqkv_ref.dtype)
        )


def _mha_qkv_bwd_kernel_chunked(
    num_heads: int, head_dim: int, chunk: int, qkv_ref, g_ref, dqkv_ref, p_ref, t_ref
):
    """Head-chunked variant for long-S shapes whose full-head scratches
    exceed the VMEM budget (Pix4Point vit_small: S=513, H=6 → 12.6 MB;
    chunks of 3 fit 6.3 MB). Same five-pass schedule per chunk."""
    scale = head_dim**-0.5
    E = num_heads * head_dim
    for c in range(0, num_heads, chunk):
        for j in range(chunk):
            h = c + j
            q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
            k = qkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim]
            t_ref[j] = (
                lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                * scale
            )
        lg = t_ref[...]
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - m)
        p_ref[...] = p / jnp.sum(p, axis=-1, keepdims=True)
        for j in range(chunk):
            h = c + j
            g = g_ref[0, :, h * head_dim : (h + 1) * head_dim]
            v = qkv_ref[0, :, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim]
            t_ref[j] = lax.dot_general(
                g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
        p = p_ref[...]
        dp = t_ref[...]
        t_ref[...] = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        for j in range(chunk):
            h = c + j
            q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
            k = qkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim]
            g = g_ref[0, :, h * head_dim : (h + 1) * head_dim]
            ds = t_ref[j].astype(q.dtype)
            pb = p_ref[j].astype(q.dtype)
            dqkv_ref[0, :, h * head_dim : (h + 1) * head_dim] = jnp.dot(
                ds, k, preferred_element_type=jnp.float32
            ).astype(dqkv_ref.dtype)
            dqkv_ref[0, :, E + h * head_dim : E + (h + 1) * head_dim] = (
                lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                ).astype(dqkv_ref.dtype)
            )
            dqkv_ref[0, :, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim] = (
                lax.dot_general(
                    pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                ).astype(dqkv_ref.dtype)
            )


# Two (H, S, S) f32 scratches must fit scoped VMEM alongside the
# double-buffered qkv/g/dqkv blocks (≈2.3 MB/item bf16 at the APF shape).
_BWD_SCRATCH_BUDGET = 8 * 2**20


def _bwd_chunk(S: int, num_heads: int) -> int:
    """Heads per chunk whose two (ch, S, S) f32 scratches fit the budget;
    num_heads (full two-pass) when everything fits, 0 when nothing does."""
    per_head = 2 * S * S * 4
    ch = min(num_heads, _BWD_SCRATCH_BUDGET // per_head)
    while ch > 1 and num_heads % ch:
        ch -= 1
    return ch


def _bwd_pallas_ok(S: int, num_heads: int, head_dim: int) -> bool:
    return head_dim % 8 == 0 and _bwd_chunk(S, num_heads) >= 1


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _mha_qkv_bwd_pallas(qkv, g, num_heads: int, *, interpret: bool = False):
    """qkv: (B, S, 3E) packed, g: (B, S, E) output cotangent → d_qkv."""
    B, S, three_e = qkv.shape
    E = three_e // 3
    D = E // num_heads
    ch = _bwd_chunk(S, num_heads)
    if ch >= num_heads:
        kernel = functools.partial(_mha_qkv_bwd_kernel, num_heads, D)
        scratch_heads = num_heads
    else:
        kernel = functools.partial(_mha_qkv_bwd_kernel_chunked, num_heads, D, ch)
        scratch_heads = ch
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, 3 * E), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((scratch_heads, S, S), jnp.float32),
            pltpu.VMEM((scratch_heads, S, S), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, g.astype(qkv.dtype))


def _reference_mha_qkv(qkv, num_heads: int):
    B, S, three_e = qkv.shape
    E = three_e // 3
    r = qkv.reshape(B, S, 3, num_heads, E // num_heads)
    return reference_mha(r[:, :, 0], r[:, :, 1], r[:, :, 2]).reshape(B, S, E)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_mha_qkv(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Fused attention over a packed qkv projection; (B, S, 3E) → (B, S, E)."""
    return _mha_qkv_pallas(qkv, num_heads)


def _fused_mha_qkv_fwd(qkv, num_heads):
    return _mha_qkv_pallas(qkv, num_heads), qkv


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _fused_mha_qkv_bwd(num_heads, qkv, g):
    E = qkv.shape[-1] // 3
    if _on_tpu() and _bwd_pallas_ok(qkv.shape[1], num_heads, E // num_heads):
        return (_mha_qkv_bwd_pallas(qkv, g, num_heads),)
    # Recompute VJP through the reference einsums (CPU, ragged head_dim,
    # and sequences so long that even a single head's scratch overflows).
    _, vjp = jax.vjp(lambda t: _reference_mha_qkv(t, num_heads), qkv)
    return vjp(g)


fused_mha_qkv.defvjp(_fused_mha_qkv_fwd, _fused_mha_qkv_bwd)


# ---------------------------------------------------------------------------
# Fully fused attention: qkv projection + MHA + output projection in-kernel.
# The projection weights use constant-index blocks, so the Pallas pipeline
# keeps them resident in VMEM across the whole batch grid; the (B, S, 3E)
# qkv activation never exists in HBM at all (≈3 full activation tensors of
# traffic saved per block at the APF shape).
# ---------------------------------------------------------------------------


def _attn_block_kernel(
    num_heads: int, head_dim: int, x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref
):
    E = num_heads * head_dim
    scale = head_dim**-0.5
    x = x_ref[0]  # (S, E)
    qkv = (
        jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
        + bqkv_ref[0]
    ).astype(x.dtype)  # (S, 3E), VMEM-only
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * head_dim : (h + 1) * head_dim]
        k = qkv[:, E + h * head_dim : E + (h + 1) * head_dim]
        v = qkv[:, 2 * E + h * head_dim : 2 * E + (h + 1) * head_dim]
        logits = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(
            jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32).astype(
                x.dtype
            )
        )
    o = jnp.concatenate(heads, axis=1)  # (S, E)
    res = jnp.dot(o, wproj_ref[...], preferred_element_type=jnp.float32) + bproj_ref[0]
    o_ref[0] = res.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _attn_block_pallas(x, wqkv, bqkv, wproj, bproj, num_heads: int, *, interpret=False):
    B, S, E = x.shape
    D = E // num_heads
    kernel = functools.partial(_attn_block_kernel, num_heads, D)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * E), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * E), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), x.dtype),
        interpret=interpret,
    )(
        x,
        wqkv.astype(x.dtype),
        bqkv.astype(x.dtype).reshape(1, -1),
        wproj.astype(x.dtype),
        bproj.astype(x.dtype).reshape(1, -1),
    )


def _reference_attn_block(x, wqkv, bqkv, wproj, bproj, num_heads: int):
    qkv = (x @ wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    out = _reference_mha_qkv(qkv, num_heads)
    return (out @ wproj.astype(x.dtype)) + bproj.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_block(x, wqkv, bqkv, wproj, bproj, num_heads: int):
    """qkv-projection + MHA + output-projection, fused. x: (B, S, E)."""
    return _attn_block_pallas(x, wqkv, bqkv, wproj, bproj, num_heads)


def _fab_fwd(x, wqkv, bqkv, wproj, bproj, num_heads):
    out = _attn_block_pallas(x, wqkv, bqkv, wproj, bproj, num_heads)
    return out, (x, wqkv, bqkv, wproj, bproj)


def _fab_bwd(num_heads, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: _reference_attn_block(*a, num_heads=num_heads), *residuals
    )
    return vjp(g)


fused_attention_block.defvjp(_fab_fwd, _fab_bwd)
