"""Attention-kernel scheduling experiments at the APF shape (B256,S196,H12,D64).

The packed-qkv kernel (ops/pallas_attention.py) runs at ~16 TFLOP/s — each
head's QK^T -> softmax -> PV chain serializes MXU and VPU. Variants here try
to overlap them:
  A  current per-head loop (baseline)
  B  two-pass: all heads' logits into a VMEM scratch, one big softmax, all PV
  C  software-pipelined: head h's QK^T issued before head h-1's softmax/PV
  D  two batch items per grid step, heads interleaved across the items

Timing: slope of time(n chained applications) — the axon tunnel adds ~24 ms
per synchronized dispatch, so per-dispatch timing is meaningless (CLAUDE.md).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, H, D = 256, 196, 12, 64
E = H * D
SCALE = D**-0.5


def _softmax_pv(qkv_ref, o_ref, item, h, logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    v = qkv_ref[item, :, 2 * E + h * D : 2 * E + (h + 1) * D]
    o_ref[item, :, h * D : (h + 1) * D] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _qk(qkv_ref, item, h):
    q = qkv_ref[item, :, h * D : (h + 1) * D]
    k = qkv_ref[item, :, E + h * D : E + (h + 1) * D]
    return (
        lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        * SCALE
    )


# --- B: two-pass with f32 VMEM scratch --------------------------------------
def _kernel_two_pass(qkv_ref, o_ref, lg_ref):
    for h in range(H):
        lg_ref[h] = _qk(qkv_ref, 0, h)
    lg = lg_ref[...]
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
    lgb_ref = lg_ref  # reuse
    for h in range(H):
        v = qkv_ref[0, :, 2 * E + h * D : 2 * E + (h + 1) * D]
        o_ref[0, :, h * D : (h + 1) * D] = jnp.dot(
            p[h], v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def two_pass(qkv):
    return pl.pallas_call(
        _kernel_two_pass,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((H, S, S), jnp.float32)],
    )(qkv)


# --- B-n: two-pass with n batch items per grid step ---------------------------
def _kernel_two_pass_multi(n_items, qkv_ref, o_ref, lg_ref):
    for i in range(n_items):
        for h in range(H):
            lg_ref[i * H + h] = _qk(qkv_ref, i, h)
    lg = lg_ref[...]
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
    for i in range(n_items):
        for h in range(H):
            v = qkv_ref[i, :, 2 * E + h * D : 2 * E + (h + 1) * D]
            o_ref[i, :, h * D : (h + 1) * D] = jnp.dot(
                p[i * H + h], v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def two_pass_multi(n_items):
    def run(qkv):
        return pl.pallas_call(
            functools.partial(_kernel_two_pass_multi, n_items),
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
            scratch_shapes=[pltpu.VMEM((n_items * H, S, S), jnp.float32)],
        )(qkv)

    return run


# --- C: software-pipelined head loop -----------------------------------------
def _kernel_pipelined(qkv_ref, o_ref):
    prev = _qk(qkv_ref, 0, 0)
    for h in range(1, H):
        cur = _qk(qkv_ref, 0, h)
        _softmax_pv(qkv_ref, o_ref, 0, h - 1, prev)
        prev = cur
    _softmax_pv(qkv_ref, o_ref, 0, H - 1, prev)


def pipelined(qkv):
    return pl.pallas_call(
        _kernel_pipelined,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), qkv.dtype),
    )(qkv)


# --- D: two batch items per grid step, interleaved ---------------------------
def _kernel_pair(qkv_ref, o_ref):
    for h in range(H):
        l0 = _qk(qkv_ref, 0, h)
        l1 = _qk(qkv_ref, 1, h)
        _softmax_pv(qkv_ref, o_ref, 0, h, l0)
        _softmax_pv(qkv_ref, o_ref, 1, h, l1)


def paired(qkv):
    return pl.pallas_call(
        _kernel_pair,
        grid=(B // 2,),
        in_specs=[pl.BlockSpec((2, S, 3 * E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), qkv.dtype),
    )(qkv)


N_CHAIN = 64


def measure_ms(f, rtt_s, reps=4):
    """ms per application: one N_CHAIN-long chained dispatch minus measured RTT."""

    @jax.jit
    def g(qkv):
        def body(c, _):
            o = f(c)
            return jnp.concatenate([o, o, o], axis=-1), None

        c, _ = lax.scan(body, qkv, None, length=N_CHAIN)
        return jnp.sum(c.astype(jnp.float32))

    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * E), jnp.bfloat16)
    float(g(qkv))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(qkv))
        best = min(best, time.perf_counter() - t0)
    return (best - rtt_s) / N_CHAIN * 1e3


def main():
    from pointvit_tpu.ops.pallas_attention import fused_mha_qkv

    variants = {
        "A current": lambda qkv: fused_mha_qkv(qkv, H),
        "B two-pass": two_pass,
        "B2 two-pass x2": two_pass_multi(2),
        "B4 two-pass x4": two_pass_multi(4),
    }
    # dispatch RTT: time a trivial jitted op
    triv = jax.jit(lambda x: jnp.sum(x) * 2.0)
    z = jnp.ones((8, 128), jnp.float32)
    float(triv(z))
    rtt_s = min(
        (lambda t0: (float(triv(z)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(6)
    )
    print(f"dispatch RTT {rtt_s * 1e3:.1f} ms", flush=True)

    qkv = jax.random.normal(jax.random.PRNGKey(1), (B, S, 3 * E), jnp.bfloat16)
    ref = None
    for name, f in list(variants.items()):
        try:
            ms = measure_ms(f, rtt_s)
            out = jax.jit(f)(qkv)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(
                    jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
                )
            gflop = 2 * 2 * B * H * S * S * D / 1e9
            print(
                f"{name}: {ms:.3f} ms/block ({gflop / ms:.1f} TFLOP/s), "
                f"max|diff| vs A = {err:.3e}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
