"""Paired-seed instrument for the reference's renderer headline finding.

The reference's one scientific claim (its results corpus,
/root/reference/results/renderer/: fixed 82.44 % at
num_views_5_diff_False_adapter_64_view_transform_64 vs learned 80.38 % at
the diff_True twin) is that **fixed camera-ring views match or beat learned
views**. Real ScanObjectNN runs remain environment-blocked (no data drops),
so this instrument tests the same claim on the synthetic rotation-invariant
shape corpus with the r3 parity-instrument methodology
(scripts/parity_instrument.py): both arms trained at every seed with the
same data order and init key, scored on paired per-seed differences with a
t-based 95 % CI.

Hypothesis encoding (one-sided, mirroring the reference claim):
    REPRODUCED iff mean(learned − fixed) ≤ +1 pp  (fixed is not worse)
    — i.e. the learned-view machinery does not buy accuracy the fixed ring
    lacks. A CI crossing far positive would *refute* the reference finding
    on this corpus.

Usage:
    python scripts/renderer_views_instrument.py --calibrate     # 1 seed, fixed
    python scripts/renderer_views_instrument.py --seeds 5
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
    "fixed": {"diff_renderer": False},
    "learned": {"diff_renderer": True},
    # negative control (r5): one fixed view instead of five starves the
    # multi-view aggregation of geometry — expected to REGRESS clearly.
    # Same role as the parity instrument's neg_k8: if the instrument cannot
    # detect THIS, its fixed-vs-learned verdict carries no power. num_views
    # is a constructor knob, not a module flag, so arm dicts may carry it;
    # _train_once pops it out of the override set.
    "neg_views1": {"diff_renderer": False, "num_views": 1},
}

# --auto-desaturate difficulty ladder (r5, judge r4 weak #2): the r3 corpus
# saturated both arms at ~98.7 %, so "learned doesn't beat fixed" held
# trivially. The reference gap this instrument reproduces is 2.06 pp at
# 80-82 % accuracy — the fixed arm must land in the sensitive band for the
# comparison to carry information. Rule (declared in advance, applied
# mechanically, uses the FIXED arm only so rung choice cannot bias the
# paired comparison): walk the ladder in order, run fixed seed 0 once per
# rung, pick the FIRST rung whose best acc falls in [0.70, 0.90]; if none
# does, pick the rung closest to the band. Then run the full paired
# protocol at that difficulty.
DESAT_LADDER: tuple[dict, ...] = (
    {"train": 1024, "noise": 0.25},
    {"train": 512, "noise": 0.35},
    {"train": 512, "noise": 0.45},
    {"train": 256, "noise": 0.45},
)
DESAT_BAND = (0.70, 0.90)


def desat_choice(calib: list[dict]) -> dict:
    """Apply the declared rung-choice rule to calibration results.

    ``calib`` entries carry ``train``/``noise``/``fixed_acc``. First rung
    whose fixed acc is in-band wins; otherwise the rung closest to the band.
    """
    def band_dist(c):
        a = c["fixed_acc"]
        return max(DESAT_BAND[0] - a, a - DESAT_BAND[1], 0.0)

    for c in calib:
        if band_dist(c) == 0.0:
            return {"train": c["train"], "noise": c["noise"]}
    c = min(calib, key=band_dist)
    return {"train": c["train"], "noise": c["noise"]}


def _train_once(data, *, seed: int, epochs: int, overrides: dict,
                out_dir: str, batch_size: int, num_views: int,
                img_size: int, vit_name: str) -> float:
    import jax
    import jax.numpy as jnp

    from pointvit_tpu.models import (
        PointCloudRendererClassifier,
        renderer_trainable_mask,
    )
    from pointvit_tpu.train.schedules import cosine_annealing_schedule
    from pointvit_tpu.train.trainer import Trainer, build_optimizer

    train_pts, train_y, test_pts, test_y = data
    overrides = dict(overrides)  # arms may carry constructor knobs; pop them
    num_views = overrides.pop("num_views", num_views)
    # Reference headline geometry: num_views 5, adapter 64, view_transform 64
    # (results/renderer/num_views_5_diff_*_adapter_64_view_transform_64).
    model = PointCloudRendererClassifier(
        num_classes=15,
        vit_name=vit_name,
        adapter_dim=64,
        num_views=num_views,
        img_size=img_size,
        view_transform_hidden=64,
        dtype=jnp.bfloat16,
        **overrides,
    )
    steps_per_epoch = len(train_y) // batch_size
    schedule = cosine_annealing_schedule(
        1e-3, epochs=epochs, steps_per_epoch=steps_per_epoch, min_lr=1e-6
    )
    example = jnp.zeros((1, train_pts.shape[1], 3))
    params_shape = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, example)
    )["params"]
    mask = renderer_trainable_mask(params_shape)
    optimizer = build_optimizer(schedule, weight_decay=0.05, trainable_mask=mask)
    trainer = Trainer(
        model,
        train_dataset=[(train_pts[i], int(train_y[i])) for i in range(len(train_y))],
        test_dataset=[(test_pts[i], int(test_y[i])) for i in range(len(test_y))],
        optimizer=optimizer,
        schedule=schedule,
        batch_size=batch_size,
        epochs=epochs,
        label_smoothing=0.0,
        output_dir=out_dir,
        save_config_snapshot=False,
        save_interval=0,
        save_best=False,  # curve only (deferred ckpt fetches OOM over the tunnel)
        seed=seed,
        trainable_mask=mask,
    )
    return float(trainer.train())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--aggregate-only", action="store_true")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--arms", default="fixed,learned,neg_views1")
    ap.add_argument("--train", type=int, default=2048)
    # 2048 test clouds (r5): eval noise halves vs the r3 protocol's 1024 —
    # the de-saturated corpus has real per-seed variance, so the paired CI
    # needs the power (same reasoning as the parity instrument's p2 test
    # split upgrade, results/parity_r5/PHASE4.md).
    ap.add_argument("--test", type=int, default=2048)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64,
                    help="bs >= 64 is the TPU-efficient renderer regime "
                         "(DESIGN.md: 3.35x examples/s vs the reference's 16)")
    ap.add_argument("--num-views", type=int, default=5)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--vit", default="vit_b_16",
                    help="'vit_test' for CPU smoke runs")
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--out", default="results/renderer_views_r3")
    ap.add_argument("--calibrate", action="store_true",
                    help="1 seed, fixed arm only — corpus difficulty check")
    ap.add_argument("--auto-desaturate", action="store_true",
                    help="walk DESAT_LADDER with 1-seed fixed runs, pick the "
                         "first rung landing fixed in [0.70, 0.90], then run "
                         "the full paired protocol there (unattended mode)")
    args = ap.parse_args()

    from pointvit_tpu.data.synthetic import make_shape_clouds

    os.makedirs(args.out, exist_ok=True)

    def _build(train_n: int, noise: float):
        tr_p, tr_y = make_shape_clouds(
            train_n, args.points, 15, seed=0, noise_frac=noise)
        te_p, te_y = make_shape_clouds(
            args.test, args.points, 15, seed=1, noise_frac=noise)
        return (tr_p, tr_y, te_p, te_y)

    if args.auto_desaturate and not args.aggregate_only:
        calib: list[dict] = []
        for rung in DESAT_LADDER:
            out_dir = os.path.join(
                args.out, f"calib_t{rung['train']}_n{rung['noise']}")
            acc = best_acc_from_csv(out_dir, args.epochs)
            if acc is None:
                t0 = time.time()
                acc = _train_once(
                    _build(rung["train"], rung["noise"]), seed=0,
                    epochs=args.epochs, overrides=ARMS["fixed"],
                    out_dir=out_dir, batch_size=args.batch,
                    num_views=args.num_views, img_size=args.img_size,
                    vit_name=args.vit,
                )
                print(f"[{time.time()-t0:7.1f}s] calib train={rung['train']} "
                      f"noise={rung['noise']}: fixed acc {acc:.4f}", flush=True)
            else:
                print(f"[  cached] calib train={rung['train']} "
                      f"noise={rung['noise']}: fixed acc {acc:.4f}", flush=True)
            calib.append({**rung, "fixed_acc": round(acc, 4)})
            if DESAT_BAND[0] <= acc <= DESAT_BAND[1]:
                break
        chosen = desat_choice(calib)
        with open(os.path.join(args.out, "calibration.json"), "w") as f:
            json.dump({"ladder": calib, "chosen": chosen,
                       "band": list(DESAT_BAND)}, f, indent=1)
        print(f"calibration chose train={chosen['train']} "
              f"noise={chosen['noise']}", flush=True)
        # The chosen rung's calibration run IS a complete fixed seed-0 run
        # at the chosen difficulty: promote its curve so the paired
        # protocol's cache skips re-training it.
        calib_csv = os.path.join(
            args.out, f"calib_t{chosen['train']}_n{chosen['noise']}",
            "training_metrics.csv")
        seed0_dir = os.path.join(args.out, "fixed_seed0")
        if os.path.exists(calib_csv) and not os.path.exists(
                os.path.join(seed0_dir, "training_metrics.csv")):
            import shutil
            os.makedirs(seed0_dir, exist_ok=True)
            shutil.copy(calib_csv, seed0_dir)
        args.train, args.noise = chosen["train"], chosen["noise"]
    elif args.auto_desaturate:
        # aggregate-only re-run: reuse the recorded calibration choice so
        # the summary's protocol block reflects the difficulty that ran.
        with open(os.path.join(args.out, "calibration.json")) as f:
            chosen = json.load(f)["chosen"]
        args.train, args.noise = chosen["train"], chosen["noise"]

    data = _build(args.train, args.noise)

    arm_names = ["fixed"] if args.calibrate else args.arms.split(",")
    if "fixed" not in arm_names:
        arm_names = ["fixed"] + arm_names
    seeds = [0] if args.calibrate else list(
        range(args.seed_start, args.seed_start + args.seeds))

    # Seed-keyed results (shared helper with scripts/parity_instrument.py;
    # advisor r3: positional pairing can silently misalign seeds).
    if args.aggregate_only:
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
                if done is not None:
                    results[arm][seed] = done
                    print(f"[  cached] seed {seed} {arm:8s}: "
                          f"best test acc {done:.4f}", flush=True)
                    continue
                try:
                    best = _train_once(
                        data, seed=seed, epochs=args.epochs,
                        overrides=ARMS[arm], out_dir=out_dir,
                        batch_size=args.batch, num_views=args.num_views,
                        img_size=args.img_size, vit_name=args.vit,
                    )
                except Exception as e:
                    print(f"[{time.time()-t0:7.1f}s] seed {seed} {arm:8s}: "
                          f"FAILED {type(e).__name__}: {e}", flush=True)
                    continue
                results[arm][seed] = best
                print(f"[{time.time()-t0:7.1f}s] seed {seed} {arm:8s}: "
                      f"best test acc {best:.4f}", flush=True)

    summary: dict = {
        "protocol": {
            "corpus": "make_shape_clouds (rotation-invariant primitives)",
            "train": args.train, "test": args.test, "points": args.points,
            "classes": 15, "noise_frac": args.noise, "batch": args.batch,
            "epochs": args.epochs, "seeds": seeds,
            "model": f"PointCloudRendererClassifier ({args.vit} frozen random "
                     f"trunk, adapters 64, views {args.num_views}, "
                     f"view_transform 64, img {args.img_size}, bf16)",
            "reference_claim": "fixed views >= learned views "
                               "(82.44 vs 80.38 on ScanObjectNN)",
            "rule": "REPRODUCED iff mean(learned - fixed) <= +1 pp",
        },
        "arms": {},
    }
    fixed = results["fixed"]
    for arm in arm_names:
        by_seed = results[arm]
        entry = {"seeds": sorted(by_seed),
                 "accs": [round(by_seed[s], 4) for s in sorted(by_seed)],
                 **_stats([by_seed[s] for s in sorted(by_seed)])}
        if arm != "fixed":
            d = paired_stats(by_seed, fixed)
            if d["n"] >= 1:
                entry["paired_diff_vs_fixed"] = d
            if d["n"] >= 2:
                if arm.startswith("neg_"):
                    # power rail, not a hypothesis arm: the instrument must
                    # DETECT this known regression (mean clearly negative)
                    # for the fixed-vs-learned verdict to carry information
                    entry["negative_control_regresses"] = bool(
                        d["mean"] * 100 <= -1.0
                    )
                else:
                    entry["reference_finding_reproduced"] = bool(
                        d["mean"] * 100 <= 1.0
                    )
        summary["arms"][arm] = entry

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
