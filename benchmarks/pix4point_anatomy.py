"""Pix4Point step anatomy: slope-fit the 33.4 ms inference step (r3 #6).

Gives Pix4Point the same ledger treatment as APF (DESIGN.md "Where the step
goes"): per-stage times at the bench shape (B=64, 2048 pts, vit_small
geometry S=513/E=384/H=6/D=64, bf16), each fitted as the slope of
time(n ops per dispatch) so the ~24 ms tunnel RTT cancels, plus the
matmul-roofline ceiling for the block stack.

Roofline arithmetic (per cloud): block param-matmuls
2·513·(384·1152 + 384·384 + 2·384·1536) ≈ 1.82 GFLOP/block, attention
4·513²·64·6 ≈ 0.40 GFLOP/block → 12 blocks ≈ 26.7 GFLOP. At the measured
183-206 TFLOP/s bf16 rate, block matmuls alone are ≥8.5 ms/batch64 — the
anatomy shows how much of the remaining time is attention kernel vs
elementwise vs tokenizer.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/pix4point_anatomy.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


ITERS, REPS, CHAINS = 20, 3, (1, 4, 8)


def _time(f, args, iters=None, reps=None):
    iters, reps = iters or ITERS, reps or REPS
    out = f(*args)
    jax.tree.map(lambda t: float(jnp.sum(t)), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.tree.map(lambda t: float(jnp.sum(t)), out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _slope(build, args, chains=None):
    ts = [_time(jax.jit(build(n)), args) for n in (chains or CHAINS)]
    chains = chains or CHAINS
    A = np.stack([np.asarray(chains, float), np.ones(len(chains))], 1)
    slope, _ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    return slope


def main() -> None:
    from pointvit_tpu.models import Pix4Point
    from pointvit_tpu.nn.vit import ViTBlock
    from pointvit_tpu.ops import p3_group
    from pointvit_tpu.ops.pallas_attention import fused_mha_qkv
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    tiny = "--tiny" in sys.argv  # CPU smoke: shape-path check, not a measurement
    B, N, S, E, H = (4, 256, 65, 64, 4) if tiny else (64, 2048, 513, 384, 6)
    if tiny:
        global ITERS, REPS, CHAINS
        ITERS, REPS, CHAINS = 2, 1, (1, 2)
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3), jnp.float32)
    out = {}

    # 1. full model — auto (fused whole-block kernels on TPU) vs the
    # attention-only-fused path (the pre-r4 default, 'attn')
    model = Pix4Point(num_classes=15, embed_dim=E, depth=12, num_heads=H,
                      k_neighbors=16, dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(1)}, pts[:1])
    fwd = jax.jit(lambda v, p: jnp.sum(model.apply(v, p, train=False)))
    float(fwd(variables, pts))
    out["full_model_ms"] = _time(fwd, (variables, pts)) * 1e3

    model_attn = Pix4Point(num_classes=15, embed_dim=E, depth=12, num_heads=H,
                           k_neighbors=16, dtype=jnp.bfloat16,
                           implementation="attn")
    fwd_attn = jax.jit(lambda v, p: jnp.sum(model_attn.apply(v, p, train=False)))
    float(fwd_attn(variables, pts))
    out["full_model_attn_only_ms"] = _time(fwd_attn, (variables, pts)) * 1e3

    # 2. tokenizer grouping (FPS+kNN): p3_group at the model's shape.
    # Both a plain queued-dispatch timing and a slope fit (chained via an
    # un-foldable 1e-30-scaled scalar so XLA can't CSE or parallelize the
    # iterations) — the small arms otherwise carry ~1 ms/dispatch of queue
    # overhead that over-attributes them (seen as negative unattributed).
    tok = jax.jit(lambda p: jnp.sum(p3_group(p, p, S - 1, 16)[1]))
    float(tok(pts))
    out["p3_group_ms"] = _time(tok, (pts,)) * 1e3

    def group_chain(n):
        def f(p):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n):
                s = jnp.sum(p3_group(p, p, S - 1, 16)[1].astype(jnp.float32))
                acc = acc + s
                p = p + (s * 1e-30).astype(p.dtype)
            return acc
        return f

    out["p3_group_slope_ms"] = _slope(group_chain, (pts,)) * 1e3

    # 2b. full P3Embed stage (grouping + fused conv stages → tokens): its
    # time minus p3_group is the conv/encode part of the tokenizer
    from pointvit_tpu.nn.heads import ClsHead
    from pointvit_tpu.nn.pointnet import P3Embed

    embed = P3Embed(k=16, dtype=jnp.bfloat16)
    evars = embed.init({"params": jax.random.PRNGKey(3)}, pts[:1], pts[:1])
    def _ef(v, p):
        centers, tokens = embed.apply(v, p, p, train=False)
        return jnp.sum(tokens) + jnp.sum(centers.astype(jnp.float32))

    efwd = jax.jit(_ef)
    float(efwd(evars, pts))
    out["p3_embed_total_ms"] = _time(efwd, (evars, pts)) * 1e3

    def embed_chain(n):
        def f(v, p):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n):
                centers, tokens = embed.apply(v, p, p, train=False)
                s = jnp.sum(tokens.astype(jnp.float32)) + jnp.sum(
                    centers.astype(jnp.float32)
                )
                acc = acc + s
                p = p + (s * 1e-30).astype(p.dtype)
            return acc
        return f

    out["p3_embed_slope_ms"] = _slope(embed_chain, (evars, pts)) * 1e3

    # 2c. classifier head on the (B, 2E) global feature
    head = ClsHead(15, dtype=jnp.bfloat16)
    feat = jax.random.normal(key, (B, 2 * E), jnp.bfloat16)
    hvars = head.init({"params": jax.random.PRNGKey(4)}, feat[:1])
    hfwd = jax.jit(lambda v, f: jnp.sum(head.apply(v, f, train=False)))
    float(hfwd(hvars, feat))
    out["head_ms"] = _time(hfwd, (hvars, feat)) * 1e3

    def head_chain(n):
        def f(v, x):
            for _ in range(n):
                logits = head.apply(v, x, train=False)
                x = jnp.tile(logits, (1, (2 * E) // 15 + 1))[:, : 2 * E].astype(
                    x.dtype
                )
            return x
        return f

    out["head_slope_ms"] = _slope(head_chain, (hvars, feat)) * 1e3

    # 3. isolated ViT block fwd, slope-fit (n chained blocks per dispatch):
    # auto (fused whole-block, r4) vs 'attn' (XLA glue + fused attention, r3)
    xb = jax.random.normal(key, (B, S, E), jnp.bfloat16)
    bparams = ViTBlock(H, dtype=jnp.bfloat16).init({"params": jax.random.PRNGKey(2)}, xb)

    def block_chain(impl):
        blk = ViTBlock(H, dtype=jnp.bfloat16, implementation=impl)

        def build(n):
            def f(p, x):
                for _ in range(n):
                    x = blk.apply(p, x)
                return x
            return f
        return build

    out["vit_block_ms"] = _slope(block_chain(None), (bparams, xb)) * 1e3
    out["vit_block_attn_only_ms"] = _slope(block_chain("attn"), (bparams, xb)) * 1e3

    # 4. attention kernel alone, slope-fit (head-chunked two-pass at S=513).
    # Tiny/CPU smoke runs the kernel in interpret mode (same trace path).
    from pointvit_tpu.ops.pallas_attention import _mha_qkv_pallas

    qkv = jax.random.normal(key, (B, S, 3 * E), jnp.bfloat16)

    def attn_chain(n):
        def f(t):
            for _ in range(n):
                o = (
                    _mha_qkv_pallas(t, H, interpret=True)
                    if tiny
                    else fused_mha_qkv(t, H)
                )
                t = jnp.concatenate([o, o, o], axis=-1)
            return t
        return f

    out["attention_ms"] = _slope(attn_chain, (qkv,)) * 1e3

    # 5. block param-matmuls alone (qkv/proj/fc1/fc2 as plain XLA bf16)
    wq = jax.random.normal(key, (E, 3 * E), jnp.bfloat16)
    wp = jax.random.normal(key, (E, E), jnp.bfloat16)
    w1 = jax.random.normal(key, (E, 4 * E), jnp.bfloat16)
    w2 = jax.random.normal(key, (4 * E, E), jnp.bfloat16)

    def mm_chain(n):
        def f(x):
            for _ in range(n):
                a = x @ wq
                b = a[..., :E] @ wp
                c = b @ w1
                x = c @ w2
            return x
        return f

    out["block_matmuls_ms"] = _slope(mm_chain, (xb,)) * 1e3

    flops = 2 * B * S * (E * 3 * E + E * E + 2 * E * 4 * E)
    out["block_matmuls_tflops"] = flops / (out["block_matmuls_ms"] / 1e3) / 1e12
    aflops = 4 * B * S * S * 64 * H
    out["attention_tflops"] = aflops / (out["attention_ms"] / 1e3) / 1e12

    out["blocks_x12_ms"] = out["vit_block_ms"] * 12
    out["embed_conv_ms"] = out["p3_embed_slope_ms"] - out["p3_group_slope_ms"]
    out["unattributed_ms"] = (
        out["full_model_ms"]
        - out["p3_embed_slope_ms"]
        - out["blocks_x12_ms"]
        - out["head_slope_ms"]
    )
    print(json.dumps({k: round(v, 3) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
