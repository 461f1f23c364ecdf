"""Full APF training-step time (fwd+bwd+masked AdamW) per config.

Re-measures the ledger's training numbers (DESIGN.md: exact 573 ms/step,
serving 442 ms at batch 256) after the flash-style attention backward —
the einsum recompute VJP was 14.0 of the 24.0 ms per-block backward.

Timing per CLAUDE.md: the step is jit'd with donated state; sync is one
scalar host read (the returned loss) per timing block.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/train_step_bench.py [arms...]
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
import optax

ARMS: dict[str, dict] = {
    "exact": {"remat_encoder": True},  # batch-256 exact OOMs HBM without it
    # grad-accum arms: the OTHER memory strategy for the exact config —
    # microbatch the step (Trainer(grad_accum=N) semantics) instead of
    # rematerializing the encoder; recompute-free backward vs scan overhead
    "exact_ga2": {"grad_accum": 2},
    "exact_ga4": {"grad_accum": 4},
    "slim": {"encoder_second_width": 768},
    "v2": {"encoder_second_width": 768, "nsample": 16},
    "slim_k24": {"encoder_second_width": 768, "nsample": 24},
    "stack": {"encoder_second_width": 768, "nsample": 24, "npoint": 160},
    "v3": {"encoder_second_width": 768, "nsample": 16, "npoint": 160},
    # phase-4 (r5): second halving of the second stack on top of v2
    "slim2": {"encoder_second_width": 384, "nsample": 16},
}


def main() -> None:
    from pointvit_tpu.models import AdaptPointFormer, apf_trainable_mask
    from pointvit_tpu.train.trainer import build_optimizer
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    tiny = "--tiny" in sys.argv  # CPU smoke: shape-path check, not a measurement
    arms = [a for a in sys.argv[1:] if not a.startswith("--")] or list(ARMS)
    batch, num_points, classes = (8, 256, 15) if tiny else (256, 1024, 15)
    points = jax.random.normal(
        jax.random.PRNGKey(0), (batch, num_points, 3), jnp.float32
    )
    labels = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, classes)
    out = {}
    for arm in arms:
        kwargs = dict(
            num_classes=classes, in_channels=3, embedding_dim=768, npoint=196,
            nsample=32, depth=12, num_heads=12, dtype=jnp.bfloat16,
        )
        kwargs.update(ARMS[arm])
        grad_accum = kwargs.pop("grad_accum", 1)
        if tiny:
            kwargs.update(embedding_dim=64, npoint=32, depth=2, num_heads=4,
                          dtype=jnp.float32)
            if ARMS[arm].get("encoder_second_width") is not None:
                kwargs["encoder_second_width"] = 64
            if ARMS[arm].get("npoint") == 160:
                kwargs["npoint"] = 24
        model = AdaptPointFormer(**kwargs)
        variables = model.init(
            {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            points[:1], train=True,
        )
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        mask = apf_trainable_mask(params)
        optimizer = build_optimizer(
            optax.constant_schedule(5e-4), weight_decay=0.05, trainable_mask=mask
        )
        opt_state = optimizer.init(params)

        def loss_fn(p, bs, pts, y, key):
            logits, updated = model.apply(
                {"params": p, "batch_stats": bs},
                pts,
                train=True,
                rngs={"dropout": key},
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()
            return loss, updated["batch_stats"]

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(p, bs, s, pts, y, key):
            if grad_accum == 1:
                (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, bs, pts, y, key
                )
            else:
                # the Trainer's accumulation core (same reshape/scan/average)
                from pointvit_tpu.train.trainer import scan_microbatches

                def run_micro(stats, pp, yy, i):
                    (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                        p, stats, pp, yy, jax.random.fold_in(key, i)
                    )
                    return l, jnp.zeros((), jnp.int32), stats, g

                loss, _, bs, grads = scan_microbatches(
                    run_micro, bs, pts, y, grad_accum,
                    zero_grads=jax.tree.map(jnp.zeros_like, p),
                    zero_aux=jnp.zeros((), jnp.int32),
                )
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return p, bs, s, loss

        key = jax.random.PRNGKey(4)
        t0 = time.time()
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, points, labels, key
        )
        float(loss)
        compile_s = time.time() - t0
        reps, iters = (1, 2) if tiny else (3, 10)
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
        print(f"{arm:9s}: {out[arm]['step_ms']:7.1f} ms/step "
              f"({out[arm]['clouds_per_sec']:.1f} clouds/s train)", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
