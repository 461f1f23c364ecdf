"""Can a whole-block int8 Pallas kernel beat bf16 on this chip? (r3 #2a)

Round-2 measured: XLA int8 dots sustain 287-370 TOP/s in isolation (1.5-1.8x
bf16's 183-206 TFLOP/s), but every *composed* int8 variant lost end-to-end,
and Pallas int8 matmuls capped at ~160-234 TOP/s — below bf16. The verdict
asked for one real attempt at block granularity, where the quant/dequant
epilogues that killed the XLA variants can fuse into the kernel.

This probe isolates the deciding quantity: the sustained in-Pallas matmul
rate at the APF block's exact shapes, bf16 vs raw int8 vs int8 with the
in-kernel act-quant + dequant epilogues a real block kernel would need. If
int8-with-epilogues cannot clearly beat the bf16 in-kernel rate at
(S=197, E=768) geometry, a whole-block int8 kernel cannot win and the 5k
memo closes the path.

Methodology (hard-won, v2 of this probe):
- Chain links must consume EVERY output column: v1 fed ``y[:, :K]`` to the
  next link and Mosaic narrowed each dot to ``x @ w[:, :K]`` — reported
  bf16 rates came out 2.7-9x above hardware peak. Each link now folds the
  full (M, N) product back to (M, K) by summing the N/K column groups.
- Timing is SYNCHRONOUS single-dispatch, slope across chain lengths
  (8 → 96 links): t(n) = RTT + n·L, so the ~25 ms tunnel RTT cancels in
  the fit and no streamed-dispatch overlap can shave real work.
- Control: a plain XLA bf16 matmul timed the same way sustains
  143-199 TFLOP/s marginal at 8-16k square shapes (true v5e peak ≈ 197).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/int8_block_probe.py
Smoke (CPU): INT8_PROBE_INTERPRET=1 python benchmarks/int8_block_probe.py
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

INTERPRET = os.environ.get("INT8_PROBE_INTERPRET", "") == "1"  # CPU smoke
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync_time(f, args, reps=6):
    out = f(*args)
    float(jnp.sum(out))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))  # ONE synchronized dispatch per timing
        best = min(best, time.perf_counter() - t0)
    return best


def _sync_slope(f_builder, args, chains=(6, 24)):
    # two points: t(n) = RTT + n·L; 24-link kernels already compile slowly
    # through the remote helper, 96-link ones blow the time budget
    if INTERPRET:
        chains = (1, 2)
    ts = [_sync_time(f_builder(n), args) for n in chains]
    A = np.stack([np.asarray(chains, float), np.ones(len(chains))], 1)
    slope, _ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    return slope, ts


# --- kernels ---------------------------------------------------------------
# Each link: full (M,K)x(K,N) product, then fold the N/K column groups back
# to (M,K) so every output column is consumed (no dead-code narrowing).


def _fold(y, K):
    # (M, N) -> (M, N//K, K) sum -> (M, K); consumes all N columns
    M, N = y.shape
    return jnp.sum(y.reshape(M, N // K, K), axis=1)


def _mm_bf16_kernel(n_chain, K, x_ref, w_ref, o_ref):
    x = x_ref[0]
    for _ in range(n_chain):
        y = lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x = (_fold(y, K) * 0.01).astype(x.dtype)
    o_ref[0] = x


def _mm_int8_kernel(n_chain, K, x_ref, w_ref, o_ref):
    x = x_ref[0]  # int8 (M, K)
    for _ in range(n_chain):
        y = lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        x = (_fold(y, K) >> 9).astype(jnp.int8)  # cheap renorm
    o_ref[0] = x


def _mm_int8_epilogue_kernel(n_chain, K, x_ref, w_ref, wscale_ref, o_ref):
    """The real composition: bf16 activation → rowwise absmax quant →
    int8 dot → int32 → dequant (row scale × col scale) → bf16. This is the
    per-layer work an int8 block kernel would do."""
    x = x_ref[0]  # bf16 (M, K)
    for _ in range(n_chain):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True) + 1e-6
        q = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
        acc = lax.dot_general(
            q, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (amax / 127.0) * wscale_ref[...]
        x = (_fold(y, K) * 0.01).astype(jnp.bfloat16)
    o_ref[0] = x


def probe(B, S, K, N, n_items=2):
    """Per-link seconds for bf16 / raw int8 / int8+epilogue at (S,K)x(K,N),
    n_items per grid step (M = n_items*S). N must be a multiple of K."""
    assert N % K == 0
    M = n_items * S
    grid = (B // n_items,)

    def build(kernel_fn, out_dtype, extra=()):
        def make(n_chain):
            kern = functools.partial(kernel_fn, n_chain, K)

            @jax.jit
            def f(x, w, *ex):
                return pl.pallas_call(
                    kern,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((1, M, K), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((K, N), lambda b: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [
                        pl.BlockSpec(e.shape, lambda b: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for e in ex
                    ],
                    out_specs=pl.BlockSpec((1, M, K), lambda b: (b, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(
                        (B // n_items, M, K), out_dtype),
                    interpret=INTERPRET,
                )(x.reshape(B // n_items, M, K), w, *ex)

            return f

        return make

    key = jax.random.PRNGKey(0)
    flops_per_link = 2 * B * S * K * N

    results = {}
    x = jax.random.normal(key, (B, S, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.03
    s, ts = _sync_slope(build(_mm_bf16_kernel, jnp.bfloat16), (x, w))
    results["bf16"] = (flops_per_link / s / 1e12, ts)

    xi = jax.random.randint(key, (B, S, K), -127, 127, jnp.int8)
    wi = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    s, ts = _sync_slope(build(_mm_int8_kernel, jnp.int8), (xi, wi))
    results["int8_raw"] = (flops_per_link / s / 1e12, ts)

    wscale = jnp.full((1, N), 0.01, jnp.float32)
    s, ts = _sync_slope(
        build(_mm_int8_epilogue_kernel, jnp.bfloat16), (x, wi, wscale)
    )
    results["int8_epilogue"] = (flops_per_link / s / 1e12, ts)
    return results


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    shapes = [
        ("qkv-like  S197 K768 N2304", 64, 197, 768, 2304, 2),
        ("fc-like   S197 K768 N3072", 64, 197, 768, 3072, 2),
        ("pad-S256  K768 N2304", 64, 256, 768, 2304, 2),
    ]
    for name, B, S, K, N, items in shapes:
        try:
            r = probe(B, S, K, N, items)
            print(name + ":")
            for k, (rate, ts) in r.items():
                print(f"    {k:14s} {rate:6.1f} T/s   sync times "
                      f"{['%.1f' % (t*1e3) for t in ts]} ms")
        except Exception as e:  # Mosaic rejections are data too
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
