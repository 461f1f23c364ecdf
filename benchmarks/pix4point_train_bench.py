"""Pix4Point train-step benchmark (fwd + bwd + AdamW) at the bench shape.

Companion to benchmarks/train_step_bench.py (APF): measures the full donated
train step for Pix4Point at B=64, 2048 pts, vit_small geometry (S=513) —
where the flash-style fused attention backward runs its head-chunked
schedule (ops/pallas_attention.py::_mha_qkv_bwd_kernel_chunked, chunks of 3
at S=513/H=6). Arms: full fine-tune and the reference's frozen-trunk mode
(pix4point.py:229-232 — tokenizer/proj/pos/cls/head train, blocks frozen).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/pix4point_train_bench.py
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def main() -> None:
    from pointvit_tpu.models import Pix4Point, pix4point_trainable_mask
    from pointvit_tpu.train.trainer import build_optimizer
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    enable_compilation_cache()
    batch, num_points, classes = args.batch, args.points, 15
    points = jax.random.normal(
        jax.random.PRNGKey(0), (batch, num_points, 3), jnp.float32
    )
    labels = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, classes)
    out = {}
    for arm, frozen in (("full_finetune", False), ("frozen_trunk", True)):
        model = Pix4Point(
            num_classes=classes, embed_dim=384, depth=args.depth, num_heads=6,
            k_neighbors=16, dtype=jnp.bfloat16,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            points[:1], train=True,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        mask = pix4point_trainable_mask(params, frozen=frozen)
        optimizer = build_optimizer(
            optax.constant_schedule(5e-4), weight_decay=0.05, trainable_mask=mask
        )
        opt_state = optimizer.init(params)

        def loss_fn(p, bs, pts, y, key):
            logits, updates = model.apply(
                {"params": p, "batch_stats": bs}, pts, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()
            return loss, updates["batch_stats"]

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(p, bs, s, pts, y, key):
            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bs, pts, y, key
            )
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return p, bs, s, loss

        key = jax.random.PRNGKey(4)
        t0 = time.time()
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, points, labels, key
        )
        float(loss)  # host read: block_until_ready lies under the tunnel
        compile_s = time.time() - t0
        reps, iters = 3, args.iters
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, points, labels, key
                )
            float(loss)
            best = min(best, (time.perf_counter() - t0) / iters)
        out[arm] = {
            "step_ms": round(best * 1e3, 1),
            "clouds_per_sec": round(batch / best, 1),
            "compile_s": round(compile_s, 1),
        }
        print(f"{arm:13s}: {out[arm]['step_ms']:7.1f} ms/step "
              f"({out[arm]['clouds_per_sec']:.1f} clouds/s train)", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
