"""Pallas TPU kernel: fused dynamic w8a8 quantized Dense.

Motivation (measured, see CLAUDE.md perf notes): the v5e MXU runs int8 at
~1.5-2.1× its bf16 rate, but expressing w8a8 as separate XLA ops loses the
win — the int32 accumulator (4 bytes/elem), the quantized activations, and
the amax reductions all round-trip HBM, making the XLA int8 model *slower*
than bf16 (165.9 vs 159.8 ms measured on the APF flagship). This kernel
fuses the whole pipeline in VMEM per tile:

    x_tile (bf16) → per-row amax → int8 → MXU int8 dot vs resident W tile
    → int32 acc → dequant (row_scale · col_scale) + bias → bf16 out

so HBM sees only x in (bf16), W in (int8, pre-quantized outside), out (bf16).

Weights use symmetric per-output-channel scales, activations symmetric
per-row dynamic scales — identical numerics to
:func:`pointvit_tpu.nn.quant.dynamic_quant_matmul` (the XLA fallback), which
the interpret-mode equivalence tests pin.

Replaces: nothing in the reference (pure f32 torch, SURVEY.md §2) — this is
TPU-native serving capability on top of parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quant_dense", "quantize_weight"]

_EPS = 1e-8


def quantize_weight(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: (K, N) f32 → ((K, N) int8, (1, N) f32)."""
    kf = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=0, keepdims=True) / 127.0, _EPS)
    wq = jnp.round(kf / sw).astype(jnp.int8)
    return wq, sw


def _quant_dense_kernel(x_ref, w_ref, sw_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (bm, K)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, _EPS)
    xq = jnp.round(x / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * (sx * sw_ref[...]) + b_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "out_dtype", "interpret")
)
def _quant_dense_2d(
    x,
    wq,
    sw,
    bias,
    *,
    block_m: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """x: (M, K) float; wq: (K, N) int8; sw/bias: (1, N) f32 → (M, N) out_dtype.

    K and N are kept WHOLE per tile: K so the in-tile row amax sees the full
    row, N so the weight block's index map is constant and the Pallas
    pipeline fetches W (plus scales/bias) into VMEM exactly once, keeping it
    resident across the whole 1-D M sweep. (A 2-D M×N grid re-streams W
    M/bm times — gigabytes at this model's M — which made the first version
    of this kernel slower than bf16.) All this model's weight matrices are
    ≤2.4 MB int8, so residency is cheap; bm is chosen by the caller to keep
    x/acc/out tiles within VMEM.
    """
    M, K = x.shape
    N = wq.shape[1]
    bm = min(block_m, M)
    assert M % bm == 0, (M, bm)
    return pl.pallas_call(
        _quant_dense_kernel,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wq, sw, bias)


def _pick_block_m(M: int, K: int, N: int, budget=10 * 1024 * 1024) -> int:
    """Largest power-of-two bm ≤ 1024 dividing M whose x (bf16, ×2 for
    double buffering), int32 acc, and out tiles fit the VMEM budget next to
    the resident int8 weights."""
    b = 1024
    while b >= 128:
        if M % b == 0 and (b * K * 4 + b * N * 6 + K * N) < budget:
            return b
        b //= 2
    return 0


def quant_dense(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused dynamic-w8a8 dense: ``x @ kernel + bias`` with int8 MXU matmul.

    ``x``: (..., K) float; ``kernel``: (K, N) f32 (quantized here, at trace
    time — under jit the per-call cost is one elementwise pass over W);
    ``bias``: (N,) f32 or None. Falls back to the unfused XLA formulation
    when shapes don't tile cleanly (M or N not divisible by 128).
    """
    from pointvit_tpu.nn.quant import dynamic_quant_matmul

    K = x.shape[-1]
    N = kernel.shape[1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d

    bm = _pick_block_m(M, K, N)
    if bm and N % 128 == 0:
        wq, sw = quantize_weight(kernel)
        b = (
            jnp.zeros((1, N), jnp.float32)
            if bias is None
            else bias.astype(jnp.float32).reshape(1, N)
        )
        out = _quant_dense_2d(
            x.reshape(M, K),
            wq,
            sw,
            b,
            block_m=bm,
            out_dtype=out_dtype,
            interpret=interpret,
        )
        return out.reshape(*lead, N)

    y = dynamic_quant_matmul(x, kernel)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
