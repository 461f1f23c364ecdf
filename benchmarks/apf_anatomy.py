"""APF step anatomy: decompose the serving-preset inference step stage by stage.

Gives the flagship the same ledger treatment Pix4Point got (pix4point_anatomy):
per-stage times at the bench shape (batch 256, 1024 pts, ViT-B geometry
S=196/E=768/H=12, bf16), blocks slope-fitted (n chained blocks per dispatch,
~24 ms tunnel RTT cancels), plus matmul rooflines so "unattributed" is a
measured number rather than a guess.

Roofline arithmetic per batch-256 step at the v2 preset (G=196, K=16,
second stack width E):
  blocks      12 · [2·B·S·(E·3E + E·E + 2·E·4E + 2·E·64) + 4·B·S²·64·H]
              ≈ 12 · 4.77 GFLOP ≈ 57.3 ms floor at ~200 TFLOP/s*
  encoder     2·B·G·K·(6·256 + 256·512 + 512·E + E·H + H·E) + 2·B·G·E·H
              ≈ 3.47 TFLOP ≈ 17.4 ms at 200 TFLOP/s (K=16, H=E=768)
  head        2·B·(E·512 + 512·256 + 256·15) ≈ 0.27 GFLOP — noise
(*the measured XLA bf16 rate at these shapes is 183-206 TFLOP/s, DESIGN.md.)

The question this answers: after the blocks (attention kernel at its
arithmetic floor) and the fused encoder, how many milliseconds of glue
(grouping, Morton sort, LN/max/head, layout changes) remain in the 82.7 ms
measured v2 step — i.e. is there anything left to harvest.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/apf_anatomy.py [preset] [--tiny]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


ITERS, REPS, CHAINS = 20, 3, (1, 4, 8)

PRESETS = {
    "exact": {},
    "slim": {"encoder_second_width": 768},
    "v2": {"encoder_second_width": 768, "nsample": 16},
    "slim_k24": {"encoder_second_width": 768, "nsample": 24},
    "stack": {"encoder_second_width": 768, "nsample": 24, "npoint": 160},
    "v3": {"encoder_second_width": 768, "nsample": 16, "npoint": 160},
    # r5 adjudicated default (phase-4): second width halving on top of v2
    "slim2": {"encoder_second_width": 384, "nsample": 16},
}


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
    chains = chains or CHAINS
    ts = [_time(jax.jit(build(n)), args) for n in chains]
    A = np.stack([np.asarray(chains, float), np.ones(len(chains))], 1)
    slope, _ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    return slope


def main() -> None:
    from pointvit_tpu.models import AdaptPointFormer
    from pointvit_tpu.nn.heads import ClassificationHead
    from pointvit_tpu.nn.pointnet import GroupFeatureEncoder
    from pointvit_tpu.nn.vit import APFBlock
    from pointvit_tpu.ops import apf_group
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    tiny = "--tiny" in sys.argv  # CPU smoke: shape-path check, not a measurement
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    preset = names[0] if names else "v2"
    over = PRESETS[preset]
    G, K = over.get("npoint", 196), over.get("nsample", 32)
    H2 = over.get("encoder_second_width")
    B, N, E, HEADS = (4, 256, 64, 4) if tiny else (256, 1024, 768, 12)
    if tiny:
        global ITERS, REPS, CHAINS
        ITERS, REPS, CHAINS = 2, 1, (1, 2)
        G, K, H2 = 16, 8, (E if H2 else None)
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3), jnp.float32)
    out = {"preset": preset}

    # 1. full model, auto (fused kernels on TPU) and forced-XLA
    kwargs = dict(num_classes=15, embedding_dim=E, npoint=G, nsample=K,
                  depth=12, num_heads=HEADS, encoder_second_width=H2,
                  dtype=jnp.bfloat16)
    model = AdaptPointFormer(**kwargs)
    variables = model.init({"params": jax.random.PRNGKey(1)}, pts[:1])
    fwd = jax.jit(lambda v, p: jnp.sum(model.apply(v, p, train=False)))
    float(fwd(variables, pts))
    out["full_model_ms"] = _time(fwd, (variables, pts)) * 1e3

    model_xla = AdaptPointFormer(**kwargs, implementation="xla")
    fwd_xla = jax.jit(lambda v, p: jnp.sum(model_xla.apply(v, p, train=False)))
    float(fwd_xla(variables, pts))
    out["full_model_xla_ms"] = _time(fwd_xla, (variables, pts)) * 1e3

    # 2. tokenizer grouping (FPS + kNN gather + Morton sort)
    tok = jax.jit(lambda p: jnp.sum(apf_group(p, p, G, K)[0]))
    float(tok(pts))
    out["apf_group_ms"] = _time(tok, (pts,), iters=2 * ITERS) * 1e3

    # 3. group encoder (fused Pallas vs forced-XLA) on (B, G, K, 6)
    nbhd = jax.random.normal(key, (B, G, K, 6), jnp.bfloat16)
    for tag, impl in (("", None), ("_xla", "xla")):
        enc = GroupFeatureEncoder(E, dtype=jnp.bfloat16, second_width=H2,
                                  implementation=impl)
        evars = enc.init({"params": jax.random.PRNGKey(2)}, nbhd)
        ef = jax.jit(lambda v, x, e=enc: jnp.sum(e.apply(v, x, train=False)))
        float(ef(evars, nbhd))
        out[f"encoder{tag}_ms"] = _time(ef, (evars, nbhd), iters=2 * ITERS) * 1e3

    # 4. APF block, slope-fit: auto (two fused kernels) vs forced-XLA
    xb = jax.random.normal(key, (B, G, E), jnp.bfloat16)
    bparams = APFBlock(HEADS, dtype=jnp.bfloat16).init(
        {"params": jax.random.PRNGKey(3)}, xb)

    def block_chain(impl):
        blk = APFBlock(HEADS, dtype=jnp.bfloat16, implementation=impl)

        def build(n):
            def f(p, x):
                for _ in range(n):
                    x = blk.apply(p, x, deterministic=True)
                return x
            return f
        return build

    out["apf_block_ms"] = _slope(block_chain(None), (bparams, xb)) * 1e3
    out["apf_block_xla_ms"] = _slope(block_chain("xla"), (bparams, xb)) * 1e3

    # 5. block param-matmuls alone (qkv/proj/fc1/fc2/adapter, plain XLA bf16)
    wq = jax.random.normal(key, (E, 3 * E), jnp.bfloat16)
    wp = jax.random.normal(key, (E, E), jnp.bfloat16)
    w1 = jax.random.normal(key, (E, 4 * E), jnp.bfloat16)
    w2 = jax.random.normal(key, (4 * E, E), jnp.bfloat16)
    wd = jax.random.normal(key, (E, 64), jnp.bfloat16)
    wu = jax.random.normal(key, (64, E), jnp.bfloat16)

    def mm_chain(n):
        def f(x):
            for _ in range(n):
                a = x @ wq
                b = a[..., :E] @ wp
                c = b @ w1
                x = c @ w2 + (b @ wd) @ wu
            return x
        return f

    out["block_matmuls_ms"] = _slope(mm_chain, (xb,)) * 1e3
    flops = 2 * B * G * (E * 3 * E + E * E + 2 * E * 4 * E + 2 * E * 64)
    out["block_matmuls_tflops"] = flops / (out["block_matmuls_ms"] / 1e3) / 1e12

    # 6. head glue: encoder_norm LN + token max-pool + classification head
    hd = ClassificationHead(15, dtype=jnp.bfloat16)
    hvars = hd.init({"params": jax.random.PRNGKey(4)}, xb[:, 0])

    def head_fn(v, x):
        import flax.linen as nn
        y = nn.LayerNorm(dtype=jnp.bfloat16).apply(
            {"params": v["ln"]}, x)
        y = jnp.max(y, axis=-2)
        return jnp.sum(hd.apply({"params": v["hd"], "batch_stats":
                                 v["bs"]}, y, train=False))

    import flax.linen as nn
    lnv = nn.LayerNorm(dtype=jnp.bfloat16).init(jax.random.PRNGKey(5), xb)
    hv = {"ln": lnv["params"], "hd": hvars["params"], "bs": hvars["batch_stats"]}
    hf = jax.jit(head_fn)
    float(hf(hv, xb))
    out["head_ms"] = _time(hf, (hv, xb), iters=2 * ITERS) * 1e3

    # attribution
    out["blocks_x12_ms"] = out["apf_block_ms"] * 12
    out["unattributed_ms"] = (
        out["full_model_ms"] - out["apf_group_ms"] - out["encoder_ms"]
        - out["blocks_x12_ms"] - out["head_ms"]
    )
    # encoder roofline (split-matmul arithmetic, K× cut on the global half)
    H = H2 or 2 * E
    eflops = 2 * B * G * (K * (6 * 256 + 256 * 512 + 512 * E + E * H + H * E)
                          + E * H)
    out["encoder_tflops"] = eflops / (out["encoder_ms"] / 1e3) / 1e12
    out["encoder_floor_ms_at_200T"] = eflops / 200e12 * 1e3
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
