"""Pix4Point bf16 inference throughput on the available accelerator.

Companion to bench.py (APF flagship) and benchmarks/renderer_sweep.py:
serving numbers for the third model family. Reference never published
throughput (BASELINE.md).

Usage: PYTHONPATH=. python benchmarks/pix4point_bench.py [--batch 64]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointvit_tpu.models import Pix4Point
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    model = Pix4Point(
        num_classes=15, embed_dim=384, depth=12, num_heads=6,
        k_neighbors=16, dtype=jnp.bfloat16,
    )
    pts = jax.random.normal(jax.random.PRNGKey(0), (args.batch, args.points, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, pts[:1])
    fwd = jax.jit(lambda v, p: jnp.sum(model.apply(v, p, train=False)))
    float(fwd(variables, pts))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(variables, pts)
        float(out)
        best = min(best, (time.perf_counter() - t0) / args.iters)
    print(json.dumps({
        "metric": "Pix4Point clouds/sec/chip (2048 pts, vit_small geometry, bf16 inference)",
        "value": round(args.batch / best, 1),
        "ms_per_batch": round(best * 1e3, 2),
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
