"""Renderer classifier: fused serial-adapter blocks vs XLA glue (r4).

Measures the full PointCloudRendererClassifier forward (fixed renderer,
6 views, 224², ViT-B) under implementation=None (auto → whole-block fused
Pallas kernels, r4) and 'attn' (XLA glue + fused attention — the r3
default), at the renderer sweep's bench batch. Reference throughput context:
benchmarks/renderer_sweep.py / results/renderer_sweep/.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/renderer_fused_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--img-size", type=int, default=224)
    # CPU smoke: shape-path check, not a measurement
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        args.batch, args.points, args.views, args.iters = 2, 256, 2, 1
        args.img_size = 64

    import jax
    import jax.numpy as jnp

    from pointvit_tpu.models import PointCloudRendererClassifier
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    pts = jax.random.normal(
        jax.random.PRNGKey(0), (args.batch, args.points, 3), jnp.float32
    )
    out = {}
    variables = None
    for impl, label in ((None, "fused_blocks"), ("attn", "attn_only")):
        model = PointCloudRendererClassifier(
            num_classes=15, num_views=args.views, img_size=args.img_size,
            dtype=jnp.bfloat16, implementation=impl,
        )
        if variables is None:
            variables = model.init({"params": jax.random.PRNGKey(1)}, pts[:1])
        fwd = jax.jit(lambda v, p, m=model: jnp.sum(m.apply(v, p, train=False)))
        float(fwd(variables, pts))  # compile + one host read
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fwd(variables, pts)
            float(o)  # host read ends the timing block (tunnel async queue)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        out[f"{label}_ms"] = round(best * 1e3, 2)
        out[f"{label}_clouds_per_s"] = round(args.batch / best, 1)
    out["speedup"] = round(out["attn_only_ms"] / out["fused_blocks_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
