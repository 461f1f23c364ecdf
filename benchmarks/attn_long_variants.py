"""Attention variants at the Pix4Point shape (B64, S513, H6, D64).

The head-chunked two-pass kernel sustains ~16.6 TFLOP/s here vs the ~29
TFLOP/s the APF-shape two-pass reaches — and the VPU softmax work per item
(S²·H = 1.58 M f32 elements) is 3.4× the APF shape's, so the schedule may
be VPU-bound at long S. Variants:

  base      head-chunked two-pass, ch=3 (shipped path)
  ch2/ch6   chunk-size sweep (ch=6 = full-head, may OOM scoped VMEM)
  bf16exp   logits max/exp/sum in bf16 (half the VPU element width;
            measured ≤0 at the APF shape where VPU wasn't the bound)
  divpv     normalize after PV: divide the (S,D) output by the row sum
            instead of the (S,S) probabilities (S/D = 8× fewer divides)
  onepass   per-head QK^T→softmax→PV loop (no scratch; the pre-r2 schedule)

Timing: slope of time(n chained ops per dispatch) — tunnel RTT ~24 ms per
synchronized dispatch (CLAUDE.md methodology); full-output host reads.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/attn_long_variants.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, H, D = 64, 513, 6, 64
E = H * D
SCALE = D**-0.5
FLOPS_PER_OP = 4 * B * S * S * D * H  # QK^T + PV per chained application


def _kernel_chunked(chunk, variant, qkv_ref, o_ref, lg_ref):
    for c in range(0, H, chunk):
        for j in range(chunk):
            h = c + j
            q = qkv_ref[0, :, h * D : (h + 1) * D]
            k = qkv_ref[0, :, E + h * D : E + (h + 1) * D]
            lg = (
                lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * SCALE
            )
            lg_ref[j] = lg.astype(lg_ref.dtype)
        lg = lg_ref[...]
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - m)
        if variant == "divpv":
            ssum = jnp.sum(p, axis=-1, keepdims=True)  # (chunk, S, 1)
            pc = p.astype(o_ref.dtype)
            for j in range(chunk):
                h = c + j
                v = qkv_ref[0, :, 2 * E + h * D : 2 * E + (h + 1) * D]
                o = jnp.dot(pc[j], v, preferred_element_type=jnp.float32)
                o_ref[0, :, h * D : (h + 1) * D] = (o / ssum[j]).astype(o_ref.dtype)
        else:
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
            for j in range(chunk):
                h = c + j
                v = qkv_ref[0, :, 2 * E + h * D : 2 * E + (h + 1) * D]
                o_ref[0, :, h * D : (h + 1) * D] = jnp.dot(
                    p[j], v, preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)


def _kernel_onepass(qkv_ref, o_ref):
    for h in range(H):
        q = qkv_ref[0, :, h * D : (h + 1) * D]
        k = qkv_ref[0, :, E + h * D : E + (h + 1) * D]
        v = qkv_ref[0, :, 2 * E + h * D : 2 * E + (h + 1) * D]
        lg = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * SCALE
        )
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
        o_ref[0, :, h * D : (h + 1) * D] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def build(variant):
    if variant == "onepass":
        kern, scratch = _kernel_onepass, []
    else:
        chunk = {"base": 3, "ch2": 2, "ch6": 6}.get(variant, 3)
        sdt = jnp.bfloat16 if variant == "bf16exp" else jnp.float32
        kern = functools.partial(_kernel_chunked, chunk, variant)
        scratch = [pltpu.VMEM((chunk, S, S), sdt)]

    def one(t):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, S, 3 * E), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, E), t.dtype),
            scratch_shapes=scratch,
        )(t)

    def make(n):
        def f(t):
            for _ in range(n):
                o = one(t)
                t = jnp.concatenate([o, o, o], axis=-1)
            return t
        return f

    return make


def _time(f, args, iters=20, reps=3):
    out = f(*args)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * E), jnp.bfloat16)
    chains = (1, 3, 6)
    for variant in ["base", "ch2", "ch6", "bf16exp", "divpv", "onepass"]:
        try:
            make = build(variant)
            ts = [_time(jax.jit(make(n)), (qkv,)) for n in chains]
            A = np.stack([np.asarray(chains, float), np.ones(len(chains))], 1)
            slope, _ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
            print(
                f"{variant:8s}: {slope*1e3:7.3f} ms/op "
                f"({FLOPS_PER_OP/slope/1e12:5.1f} TFLOP/s)  "
                f"times {['%.1f' % (t*1e3) for t in ts]}"
            )
        except Exception as e:
            print(f"{variant:8s}: FAILED — {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
