"""Where does the isolated ViT-block backward's time go? (r3 #3, step 2)

benchmarks/kernel_overhead.py measured ~0 us/kernel launch overhead inside
a jit'd program on the axon backend (512 chained tiny kernels = the same
~1.5 ms dispatch as 8), overturning the r2 reading that small-batch
backwards are per-kernel-LAUNCH-bound. The ~60 ms block backward at
(48,197) tokens is therefore real device work. This probe decomposes it:

  full      d/dparams of the whole APF block       (the r2 headline number)
  attn      d/dparams of x + proj(MHA(qkv(LN1 x))) (attention half)
  mlp       d/dparams of fc2(gelu(fc1(LN2 x)))+... (mlp+adapter half)
  mha_only  d/d(qkv) of the attention contraction alone (einsum reference —
            XLA materializes (B,H,S,S) tensors in HBM several times)
  matmul    d/dW of a (BT,768)x(768,3072) dense — the well-tiled case

at (48,197) and (256,197), fwd for contrast. Each grad is reduced to ONE
f32 scalar inside the jit before timing: a first version read every leaf
of the 19-leaf grad tree per timing block, and each device_get pays the
~25 ms tunnel RTT — that alone accounted for ~23 of the "30.7 ms" block
backward it reported. The r2 per-kernel-overhead reading likely suffered
the same artifact.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/block_backward_anatomy.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _scalarize(grad_fn):
    """One f32 scalar out → ONE host read per sync (each device_get pays
    ~25 ms tunnel RTT; reading a 19-leaf grad tree per timing block would
    swamp the measurement)."""

    def f(*args):
        g = grad_fn(*args)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), g),
        )

    return jax.jit(f)


def _time(f, args, iters=20, reps=3):
    out = f(*args)
    assert jnp.ndim(out) == 0, "timing target must return a scalar"
    float(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    from pointvit_tpu.nn.layers import Attention, Mlp
    from pointvit_tpu.nn.vit import APFBlock
    from pointvit_tpu.ops.pallas_attention import reference_mha

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    for B, S in [(48, 197), (256, 197)]:
        E, H = 768, 12
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, E), jnp.bfloat16)
        rows = []

        blk = APFBlock(num_heads=H, dtype=jnp.bfloat16, implementation="xla")
        p = blk.init({"params": jax.random.PRNGKey(1)}, x)

        def loss_full(p, x):
            return jnp.sum(blk.apply(p, x).astype(jnp.float32))

        rows.append(("block fwd", _time(jax.jit(loss_full), (p, x))))
        rows.append(("block bwd(params)", _time(_scalarize(jax.grad(loss_full)), (p, x))))

        attn = Attention(H, dtype=jnp.bfloat16, implementation="einsum")
        pa = attn.init({"params": jax.random.PRNGKey(2)}, x)

        def loss_attn(p, x):
            return jnp.sum(attn.apply(p, x).astype(jnp.float32))

        rows.append(("attn-layer bwd", _time(_scalarize(jax.grad(loss_attn)), (pa, x))))

        mlp = Mlp(4 * E, dtype=jnp.bfloat16)
        pm = mlp.init({"params": jax.random.PRNGKey(3)}, x)

        def loss_mlp(p, x):
            return jnp.sum(mlp.apply(p, x).astype(jnp.float32))

        rows.append(("mlp-layer bwd", _time(_scalarize(jax.grad(loss_mlp)), (pm, x))))

        q = jax.random.normal(jax.random.PRNGKey(4), (B, S, H, 64), jnp.bfloat16)

        def loss_mha(q):
            return jnp.sum(reference_mha(q, q, q).astype(jnp.float32))

        rows.append(("mha-contraction bwd", _time(_scalarize(jax.grad(loss_mha)), (q,))))

        w = jax.random.normal(jax.random.PRNGKey(5), (E, 4 * E), jnp.bfloat16)
        x2 = x.reshape(B * S, E)

        def loss_mm(w):
            return jnp.sum((x2 @ w).astype(jnp.float32))

        rows.append(("plain dW matmul bwd", _time(_scalarize(jax.grad(loss_mm)), (w,))))

        print(f"\n(B={B}, S={S}):")
        for name, t in rows:
            print(f"  {name:22s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
