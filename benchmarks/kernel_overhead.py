"""Is the ~1-2 ms/kernel training-backward overhead tunnel-specific?

Round-2 measured that small-batch training backwards are per-kernel-bound:
an isolated ViT block's bwd-to-params lowers to ~29 HLO kernels at ~1-2 ms
each *regardless of size* (DESIGN.md "Renderer/small-batch TRAINING
anatomy"). Before building a fused Pallas block-backward (roadmap r3 #1),
establish where that per-kernel cost comes from:

- A real TPU's in-program kernel launch overhead is O(µs). If trivially
  small kernels inside ONE jit'd program cost ~1-2 ms each on the axon
  backend, the overhead is the remote-execution path (per-kernel host
  round-trips through the tunnel), not the hardware — real-pod numbers
  would not show it, and the fused-backward work is moot (VERDICT r2 #3).

Method: one jit'd program with k sequentially *dependent* tiny matmuls
(chained, so XLA cannot fuse them into one kernel nor run them in
parallel), slope-fit time(k). The matmuls are (8,128)x(128,128) — ~0.26
MFLOP, <2 µs of MXU time each — so the slope IS the per-kernel overhead.
Every timing block ends with a host read (tunnel lies about
block_until_ready).

Run on the real chip:     python benchmarks/kernel_overhead.py
Run on CPU for contrast:  JAX_PLATFORMS=cpu python benchmarks/kernel_overhead.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain(k: int):
    """Program of k dependent tiny matmul kernels."""

    @jax.jit
    def f(x, w):
        for i in range(k):
            # rotate + matmul: dependence chain defeats fusion into one dot
            x = jax.lax.optimization_barrier(x @ w)
        return jnp.sum(x)

    return f


def time_program(f, args, iters: int = 20) -> float:
    float(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(out)  # host read forces completion through the tunnel
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 128), jnp.bfloat16)

    ks = [8, 32, 128, 512]
    ts = []
    for k in ks:
        t = time_program(chain(k), (x, w))
        ts.append(t)
        print(f"k={k:4d} kernels: {t*1e3:8.3f} ms/dispatch")

    # least-squares slope of time vs kernel count
    A = np.stack([np.asarray(ks, float), np.ones(len(ks))], axis=1)
    slope, intercept = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    print(
        f"per-kernel overhead: {slope*1e6:.1f} us/kernel "
        f"(dispatch fixed cost {intercept*1e3:.2f} ms)"
    )
    print(
        "verdict: "
        + (
            "TUNNEL/BACKEND-BOUND (>100 us/kernel for ~2 us of MXU work; "
            "real pods launch kernels in O(us) — fused-backward moot)"
            if slope > 100e-6
            else "kernel launches are cheap here; the r2 backward cost is "
            "NOT per-kernel launch overhead at this size"
        )
    )


if __name__ == "__main__":
    main()
