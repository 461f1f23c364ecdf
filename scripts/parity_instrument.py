"""High-power accuracy-parity instrument for APF FLOP-cut presets.

Round-2 verdict: the 2-seed, ~29 %-ceiling synthetic protocol behind the
serving preset could not detect the few-point regressions that matter. This
instrument fixes both failure modes:

- **Signal**: the corpus is :func:`pointvit_tpu.data.synthetic.make_shape_clouds`
  — rotation-invariant geometric primitives — so the *full-size* exact APF
  (E=768, ViT-B geometry, frozen random trunk + adapters/encoder/head
  trainable, bf16; exactly the config the serving preset ships for) trains
  into the sensitive ≥70 % band instead of plateauing at chance-adjacent 29 %.
- **Power**: ≥5 seeds per arm, and the exact arm is trained for *every* seed
  so each candidate preset is scored on **paired per-seed differences**
  (same data order, same init key) with a t-based 95 % CI.

Accept/reject rule (written down, applied mechanically):
    ACCEPT a preset iff  mean(preset − exact) ≥ −1 pp  AND the 95 % CI lower
    bound of the paired difference ≥ −3 pp.
    Otherwise REJECT — and if the rejected preset is the bench default,
    bench.py must revert to the exact config.

Arms (model-kwarg overrides on the fixed full-size config):
    exact      — reference-exact encoder (second stack 2E)
    slim       — serving preset: second stack E       (models.apf_serving_preset)
    v2         — slim + nsample 16                    (rejected r2; re-adjudicated)
    k24        — exact widths, nsample 24             (structural cut candidate)
    g160       — exact widths, npoint 160             (structural cut candidate)
    slim_k24   — slim + nsample 24                    (stacked cut candidate)
    stack      — slim + nsample 24 + npoint 160       (maximal candidate)
    neg_k8     — nsample 8: expected regression        (negative control)

Usage:
    python scripts/parity_instrument.py --calibrate          # 1 seed, exact only
    python scripts/parity_instrument.py --seeds 5 --arms exact,slim,v2

Calibration ledger (v5e-1, bf16, full-size exact arm, seed 0):
    noise 0.25, train 2048, 30 ep → best 54.3 %  (too hard)
    noise 0.10, train 2048, 60 ep → best 66.5 %  (still short)
    noise 0.05, train 4096, 60 ep → best 81.6 %
    noise 0.05, train 2048, 60 ep → best 84.2 %  ← protocol (faster runs)
~5.5 s/epoch at batch 256 with save_best=False (best-ckpt writes OOM HBM
over the tunnel — each deferred fetch pins a full state copy).
Run arms with:  --noise 0.05 --epochs 60  (the --train/--test defaults).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointvit_tpu.utils.instruments import (  # noqa: E402
    best_acc_from_csv,
    collect_by_seed,
    paired_stats,
    t95_stats as _stats,
)

ARMS: dict[str, dict] = {
    "exact": {},
    "slim": {"encoder_second_width": 768},
    "v2": {"encoder_second_width": 768, "nsample": 16},
    "k24": {"nsample": 24},
    "g160": {"npoint": 160},
    "slim_k24": {"encoder_second_width": 768, "nsample": 24},
    # stacked maximal candidate: every individually-plausible cut at once
    "stack": {"encoder_second_width": 768, "nsample": 24, "npoint": 160},
    # v2 + npoint 160 (phase-3, r4): composes the two ACCEPTED cuts (slim,
    # K=16) with the remaining structural one (G=160). Declared before any
    # seed ran — see results/parity_r3/PHASE3.md.
    "v3": {"encoder_second_width": 768, "nsample": 16, "npoint": 160},
    # negative control: K=8 starves the group encoder of local geometry —
    # expected to REGRESS. If the instrument accepts this arm too, it has
    # no discriminative power and cannot certify the serving preset.
    "neg_k8": {"nsample": 8},
    # trainer-level arm (r4-s5): EMA weight averaging ON TOP of the
    # accepted v2 config. Same architecture and inference cost — the
    # question is purely whether evaluating the averaged weights beats the
    # raw ones on this corpus. `trainer.`-prefixed keys go to Trainer, not
    # the model. decay 0.99 ≈ a 100-step (12-epoch) horizon over the
    # 480-step run.
    "v2_ema": {
        "encoder_second_width": 768,
        "nsample": 16,
        "trainer.ema_decay": 0.99,
    },
    # follow-up (declared after v2_ema seeds 0-1 showed ~-15 pp, BEFORE any
    # v2_ema9 seed ran): decay 0.9 ≈ 10-step (1.2-epoch) horizon — tests
    # whether the v2_ema regression is "EMA hurts here" or "0.99's
    # 12-epoch lag never catches the raw peak within 60 epochs".
    "v2_ema9": {
        "encoder_second_width": 768,
        "nsample": 16,
        "trainer.ema_decay": 0.9,
    },
    # phase-4 (r5): the untried rung of the one axis the instrument ever
    # ACCEPTED. slim (2E→E, +9.9 pp, CI floor +1.2) halved the second
    # stack; slim2 halves it again (E/2 = 384) on top of v2's K=16. The
    # encoder is the largest non-trunk term of the v2 step (16.5 ms of
    # 82.9 at 85 % roofline, results/ondevice_r4/apf_anatomy.log), so this
    # is worth ~+10 % end-to-end if it holds accuracy. Declared in
    # results/parity_r5/PHASE4.md before any seed ran.
    "slim2": {"encoder_second_width": 384, "nsample": 16},
}

MEAN_FLOOR_PP = -1.0   # accept needs mean paired diff ≥ −1 pp
CI_FLOOR_PP = -3.0     # … and 95 % CI lower bound ≥ −3 pp


def _train_once(data, *, seed: int, epochs: int, overrides: dict,
                out_dir: str, batch_size: int) -> float:
    import jax
    import jax.numpy as jnp

    from pointvit_tpu.models import AdaptPointFormer, apf_trainable_mask
    from pointvit_tpu.train.schedules import timm_cosine_schedule
    from pointvit_tpu.train.trainer import Trainer, build_optimizer

    train_pts, train_y, test_pts, test_y = data
    kwargs = dict(
        num_classes=15, in_channels=3, embedding_dim=768, npoint=196,
        nsample=32, depth=12, num_heads=12, adapter_bottleneck=64,
        dtype=jnp.bfloat16,
        # bs ≥ 256 exact-config training overflows HBM without encoder
        # remat (DESIGN.md ledger); remat is bit-identical gradients, so it
        # cannot bias an accuracy comparison.
        remat_encoder=batch_size >= 256,
    )
    trainer_kwargs = {
        k[len("trainer."):]: v for k, v in overrides.items()
        if k.startswith("trainer.")
    }
    kwargs.update(
        {k: v for k, v in overrides.items() if not k.startswith("trainer.")}
    )
    model = AdaptPointFormer(**kwargs)

    steps_per_epoch = len(train_y) // batch_size
    schedule = timm_cosine_schedule(
        5e-4, epochs=epochs, steps_per_epoch=steps_per_epoch,
        warmup_epochs=3, warmup_lr_init=1e-3,
    )
    example = jnp.zeros((1, train_pts.shape[1], 3))
    params_shape = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, example)
    )["params"]
    mask = apf_trainable_mask(params_shape)
    optimizer = build_optimizer(schedule, weight_decay=0.05, trainable_mask=mask)
    trainer = Trainer(
        model,
        train_dataset=[(train_pts[i], int(train_y[i])) for i in range(len(train_y))],
        test_dataset=[(test_pts[i], int(test_y[i])) for i in range(len(test_y))],
        optimizer=optimizer,
        schedule=schedule,
        batch_size=batch_size,
        epochs=epochs,
        label_smoothing=0.3,
        output_dir=out_dir,
        save_config_snapshot=False,
        save_interval=0,
        save_best=False,  # curve only; deferred ckpt fetches OOM HBM here
        seed=seed,
        **trainer_kwargs,
    )
    return float(trainer.train())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed (lets long runs be split into several "
                         "invocations; aggregate with --aggregate-only)")
    ap.add_argument("--aggregate-only", action="store_true",
                    help="skip training; rebuild summary.json from the "
                         "{arm}_seed*/training_metrics.csv files in --out")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--arms", default="exact,slim,v2")
    ap.add_argument("--train", type=int, default=2048)
    ap.add_argument("--test", type=int, default=1024)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=256,
                    help="256 + encoder remat is ~4x the clouds/s of bs64 "
                         "on this chip (small-batch backward is per-kernel "
                         "overhead-bound, DESIGN.md)")
    ap.add_argument("--noise", type=float, default=0.25,
                    help="outlier fraction (difficulty knob)")
    ap.add_argument("--out", default="results/parity_instrument")
    ap.add_argument("--calibrate", action="store_true",
                    help="1 seed, exact arm only — corpus difficulty check")
    args = ap.parse_args()

    from pointvit_tpu.data.synthetic import make_shape_clouds

    train_pts, train_y = make_shape_clouds(
        args.train, args.points, 15, seed=0, noise_frac=args.noise)
    test_pts, test_y = make_shape_clouds(
        args.test, args.points, 15, seed=1, noise_frac=args.noise)
    data = (train_pts, train_y, test_pts, test_y)
    os.makedirs(args.out, exist_ok=True)

    arm_names = ["exact"] if args.calibrate else args.arms.split(",")
    if "exact" not in arm_names:
        arm_names = ["exact"] + arm_names
    seeds = [0] if args.calibrate else list(
        range(args.seed_start, args.seed_start + args.seeds))

    # Results are keyed by seed throughout (advisor r3: positional lists
    # that drop failed seeds independently can silently misalign pairs).
    if args.aggregate_only:
        # Rebuild from whatever complete seed runs exist on disk; pairing
        # below is over each arm's seed intersection with exact.
        results = {a: collect_by_seed(args.out, a, args.epochs)
                   for a in arm_names}
        seeds = sorted({s for r in results.values() for s in r})
    else:
        results = {a: {} for a in arm_names}
        for seed in seeds:
            for arm in arm_names:
                t0 = time.time()
                out_dir = os.path.join(args.out, f"{arm}_seed{seed}")
                done = best_acc_from_csv(out_dir, args.epochs)
                if done is not None:  # resumed invocation: skip finished runs
                    results[arm][seed] = done
                    print(f"[  cached] seed {seed} {arm:9s}: "
                          f"best test acc {done:.4f}", flush=True)
                    continue
                try:
                    best = _train_once(
                        data, seed=seed, epochs=args.epochs, overrides=ARMS[arm],
                        out_dir=out_dir, batch_size=args.batch,
                    )
                except Exception as e:  # one bad arm must not kill the batch
                    print(f"[{time.time()-t0:7.1f}s] seed {seed} {arm:9s}: "
                          f"FAILED {type(e).__name__}: {e}", flush=True)
                    continue
                results[arm][seed] = best
                print(f"[{time.time()-t0:7.1f}s] seed {seed} {arm:9s}: "
                      f"best test acc {best:.4f}", flush=True)

    summary: dict = {
        "protocol": {
            "corpus": "make_shape_clouds (rotation-invariant primitives)",
            "train": args.train, "test": args.test, "points": args.points,
            "classes": 15, "noise_frac": args.noise, "batch": args.batch,
            "epochs": args.epochs, "seeds": seeds,
            "model": "full-size APF (E=768, ViT-B, frozen random trunk, "
                     "adapters/encoder/head trainable, bf16)",
            "rule": f"ACCEPT iff mean paired diff >= {MEAN_FLOOR_PP} pp AND "
                    f"95% CI lower bound >= {CI_FLOOR_PP} pp",
        },
        "arms": {},
    }
    exact = results["exact"]
    exact_mean = _stats(list(exact.values()))["mean"]
    summary["exact_reaches_70pct"] = bool(exact_mean is not None
                                          and exact_mean >= 0.70)
    for arm in arm_names:
        by_seed = results[arm]
        entry = {"seeds": sorted(by_seed),
                 "accs": [round(by_seed[s], 4) for s in sorted(by_seed)],
                 **_stats([by_seed[s] for s in sorted(by_seed)])}
        if arm != "exact":
            d = paired_stats(by_seed, exact)
            if d["n"] >= 1:
                entry["paired_diff_vs_exact"] = d
            # the written rule needs a CI, so a verdict needs ≥2 pairs
            if d["n"] >= 2:
                entry["accepted"] = bool(
                    d["mean"] * 100 >= MEAN_FLOOR_PP
                    and d["ci95"][0] * 100 >= CI_FLOOR_PP
                )
        summary["arms"][arm] = entry

    # Merge, don't clobber: an invocation over a subset of arms must not
    # drop the other arms' adjudicated entries from summary.json (the bench
    # adjudicator reads them). Entries from this run win; absent arms keep
    # their previous entry verbatim.
    summary_path = os.path.join(args.out, "summary.json")
    if os.path.exists(summary_path):
        try:
            with open(summary_path) as f:
                prev = json.load(f)
            for arm, entry in prev.get("arms", {}).items():
                summary["arms"].setdefault(arm, entry)
        except (ValueError, OSError):
            pass
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
