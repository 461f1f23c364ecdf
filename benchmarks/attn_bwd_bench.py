"""Flash-style attention backward: Pallas kernel vs the einsum recompute VJP.

r3 corrected anatomy (DESIGN.md): at batch 256 the attention-layer backward
is the dominant block-backward term (14.0 of 24.0 ms) because XLA's
recompute VJP materializes the (B, H, S, S) probability/cotangent tensors in
HBM several times. `_mha_qkv_bwd_pallas` keeps them in two VMEM scratches.

Measures, at the APF/renderer shapes:
  - isolated d_qkv backward: Pallas kernel vs jax.vjp(einsum reference)
  - the full Attention-layer backward through the custom-VJP path the
    trainer actually takes (fused fwd + Pallas bwd) vs implementation='einsum'
  - APFBlock bwd(params) — the end-to-end effect on a block

Timing rule (CLAUDE.md): each timing block syncs via ONE scalar host read.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/attn_bwd_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _scalarize(grad_fn):
    def f(*args):
        g = grad_fn(*args)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), g),
        )

    return jax.jit(f)


def _time(f, args, iters=20, reps=3):
    out = f(*args)
    assert jnp.ndim(out) == 0
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
    from pointvit_tpu.nn.layers import Attention
    from pointvit_tpu.nn.vit import APFBlock
    from pointvit_tpu.ops.pallas_attention import (
        _mha_qkv_bwd_pallas,
        _reference_mha_qkv,
    )

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    E, H = 768, 12
    for B, S in [(48, 197), (256, 197)]:
        qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * E), jnp.bfloat16)
        g = jax.random.normal(jax.random.PRNGKey(1), (B, S, E), jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(2), (B, S, E), jnp.bfloat16)
        rows = []

        # isolated d_qkv
        pallas_bwd = jax.jit(
            lambda qkv, g: jnp.sum(
                _mha_qkv_bwd_pallas(qkv, g, H).astype(jnp.float32)
            )
        )
        rows.append(("d_qkv pallas kernel", _time(pallas_bwd, (qkv, g))))

        def einsum_bwd_f(qkv, g):
            _, vjp = jax.vjp(lambda t: _reference_mha_qkv(t, H), qkv)
            (d,) = vjp(g)
            return jnp.sum(d.astype(jnp.float32))

        rows.append(("d_qkv einsum VJP", _time(jax.jit(einsum_bwd_f), (qkv, g))))

        # attention layer end-to-end (the trainer path vs forced einsum)
        for impl in (None, "einsum"):
            attn = Attention(H, dtype=jnp.bfloat16, implementation=impl)
            p = attn.init({"params": jax.random.PRNGKey(3)}, x)

            def loss(p, x):
                return jnp.sum(attn.apply(p, x).astype(jnp.float32))

            rows.append(
                (f"attn-layer bwd impl={impl}", _time(_scalarize(jax.grad(loss)), (p, x)))
            )

        # whole block (auto path picks the fused fwd + pallas bwd on TPU)
        for impl in (None, "xla"):
            blk = APFBlock(num_heads=H, dtype=jnp.bfloat16, implementation=impl)
            p = blk.init({"params": jax.random.PRNGKey(4)}, x)

            def loss_b(p, x):
                return jnp.sum(blk.apply(p, x, deterministic=False).astype(jnp.float32))

            rows.append(
                (f"block bwd impl={impl}", _time(_scalarize(jax.grad(loss_b)), (p, x)))
            )

        print(f"\n(B={B}, S={S}, E={E}, H={H}):")
        for name, t in rows:
            print(f"  {name:28s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
