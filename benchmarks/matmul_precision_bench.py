"""Microbenchmark: can any low-precision matmul path beat bf16 on this chip?

VERDICT.md round 1 (#3) asks for a re-measurement before deciding the route
past the bf16 throughput ceiling: round 1 measured XLA int8 at ~84 TOP/s vs
bf16 at ~112 TFLOP/s. This benchmark times hand-tiled Pallas matmul kernels
with IDENTICAL structure in bf16 (f32 accumulation) and int8 (int32
accumulation), plus the XLA-native equivalents, at a transformer-block-like
shape. v5e datasheet peaks: 197 bf16 TFLOP/s, 394 int8 TOP/s — if the int8
kernel can't exceed the measured bf16 rate, the 5k-clouds/s route must come
from FLOP reduction, not quantization.

Timing protocol per CLAUDE.md: block_until_ready() lies under the axon
tunnel, so every timing block ends with a host read of a reduced scalar.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/matmul_precision_bench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(nk: int, acc_dtype, a_ref, b_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        a_ref[...], b_ref[...], preferred_element_type=acc_dtype
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype"))
def pallas_matmul(a, b, bm=512, bn=512, bk=512, out_dtype=None):
    """Tiled Pallas matmul; acc dtype follows input (int8→int32, else f32)."""
    M, K = a.shape
    _, N = b.shape
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    out_dtype = out_dtype or acc_dtype
    nk = K // bk
    kernel = functools.partial(_matmul_kernel, nk, acc_dtype)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N) * a.dtype.itemsize + M * N * 4,
            transcendentals=0,
        ),
    )(a, b)


def _time(matmul, a_stack, b, iters=8, reps=3):
    """Time `matmul` over L independent A slices INSIDE one jit dispatch —
    a single 2 ms matmul dispatch is swamped by tunnel per-call overhead, so
    per-matmul time is measured as (dispatch time) / L with L large enough
    (L·iters matmuls per host read)."""
    L = a_stack.shape[0]

    @jax.jit
    def run(a_stack, b):
        s = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            # Serialize iterations through s (defeats CSE of identical
            # matmuls); the perturbation is one cheap pass over b.
            bb = (b.astype(jnp.float32) + s * 1e-30).astype(b.dtype)
            for i in range(L):
                out = matmul(a_stack[i], bb)
                # FULL output sum: a partial read (e.g. out[0]) lets XLA
                # rewrite dot+slice into a 1-row matmul and report rates
                # above hardware peak. XLA fuses this sum into the dot
                # epilogue; Pallas pays one bounded extra HBM pass.
                s = s + jnp.sum(out.astype(jnp.float32))
        return s

    float(run(a_stack, b))  # compile + completion barrier
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(a_stack, b)
        float(out)  # host read = real completion under the tunnel
        best = min(best, (time.perf_counter() - t0) / (iters * L))
    return best


def main():
    M, K, N = 8192, 2048, 2048
    L = 16  # independent A slices per dispatch
    flops = 2 * M * K * N
    key = jax.random.PRNGKey(0)
    a_f = jax.random.normal(key, (L, M, K), jnp.float32)
    b_f = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
    a_bf, b_bf = a_f.astype(jnp.bfloat16), b_f.astype(jnp.bfloat16)
    a_i8 = (a_f * 10).astype(jnp.int8)
    b_i8 = (b_f * 10).astype(jnp.int8)

    results = {}

    xla_bf16 = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32)
    results["xla bf16"] = _time(xla_bf16, a_bf, b_bf)

    xla_i8 = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)
    results["xla int8"] = _time(xla_i8, a_i8, b_i8)

    results["pallas bf16 (512^3 tiles)"] = _time(pallas_matmul, a_bf, b_bf)
    for bm, bn, bk in ((512, 512, 512), (1024, 512, 512), (512, 1024, 1024)):
        results[f"pallas int8 ({bm}x{bn}x{bk} tiles)"] = _time(
            lambda a, b, bm=bm, bn=bn, bk=bk: pallas_matmul(a, b, bm, bn, bk),
            a_i8,
            b_i8,
        )

    print(f"matmul {M}x{K}x{N} ({flops/1e9:.1f} GFLOP), device {jax.devices()[0]}")
    for name, t in results.items():
        print(f"  {name:34s} {t*1e3:7.2f} ms  {flops/t/1e12:7.1f} T(FL)OP/s")


if __name__ == "__main__":
    main()
