"""Multi-view renderer bf16 batched-inference sweep (BASELINE.md config #5).

Sweeps num_views × renderer-type (fixed/differentiable) × adapter width over
the ViT-B renderer classifier and reports clouds/sec for each cell. Mirrors
the reference's renderer hyperparameter sweep axes (results/renderer/* —
num_views ∈ 1..5, diff ∈ {T,F}, adapter ∈ {64,128}); this measures the
serving-side throughput the reference never published.

Usage:
    PYTHONPATH=. python benchmarks/renderer_sweep.py [--batch 16] [--points 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--points", type=int, default=2048)
    parser.add_argument("--views", type=int, nargs="+", default=[1, 3, 6])
    parser.add_argument("--adapters", type=int, nargs="+", default=[64, 128])
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pointvit_tpu.models import PointCloudRendererClassifier
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    points = jax.random.normal(key, (args.batch, args.points, 3), jnp.float32) * 0.4

    def timeit(f, *a):
        out = f(*a)
        float(out)  # host read = real completion barrier (remote tunnels)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        float(out)
        return (time.perf_counter() - t0) / args.iters

    rows = []
    for diff in (False, True):
        for num_views in args.views:
            for adapter in args.adapters:
                model = PointCloudRendererClassifier(
                    num_classes=15,
                    vit_name="vit_b_16",
                    adapter_dim=adapter,
                    num_views=num_views,
                    img_size=224,
                    diff_renderer=diff,
                    view_transform_hidden=64,
                    dtype=jnp.bfloat16,
                )
                variables = model.init({"params": jax.random.PRNGKey(1)}, points[:1])
                fwd = jax.jit(lambda v, p: jnp.sum(model.apply(v, p, train=False)))
                dt = timeit(fwd, variables, points)
                row = {
                    "diff": diff,
                    "num_views": num_views,
                    "adapter": adapter,
                    "ms_per_batch": round(dt * 1e3, 2),
                    "clouds_per_sec": round(args.batch / dt, 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["clouds_per_sec"])
    print(f"\nbest cell: {best}")


if __name__ == "__main__":
    main()
