"""Export a trainer checkpoint's forward pass to a StableHLO artifact.

Usage:
    python scripts/export_model.py --checkpoint runs/apf/model_best.ckpt \
        --out apf.stablehlo [--points 1024] [--static-batch 256] \
        [--platforms tpu,cpu]

Restores the msgpack checkpoint + sidecar ``model_config`` exactly like the
serving engine (pointvit_tpu/serve.py), then serializes the forward with
weights baked in (pointvit_tpu/export.py). The artifact runs with no Python
model code: ``pointvit_tpu.export.load_exported(path)(points)``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--family", default=None)
    ap.add_argument("--raw-weights", action="store_true",
                    help="export the raw params of an EMA checkpoint "
                         "instead of the averaged weights")
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--static-batch", type=int, default=0,
                    help="fix the batch dim (default 0 = batch-polymorphic)")
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. tpu,cpu (default: current backend)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from pointvit_tpu.export import export_forward, save_exported
    from pointvit_tpu.models.factory import build_model

    with open(args.checkpoint, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    with open(args.checkpoint + ".json") as f:
        model_config = json.load(f)["model_config"]
    model = build_model(model_config, family=args.family)

    # EMA checkpoints export their averaged weights/stats by default —
    # same deployment policy as inference.Classifier and serve
    ema = not args.raw_weights and isinstance(raw, dict) and "ema_params" in raw
    variables = {"params": raw["ema_params"] if ema else raw["params"]}
    stats = (raw.get("ema_batch_stats") if ema else None) or raw.get("batch_stats")
    if stats:
        variables["batch_stats"] = stats
    in_ch = model_config.get("in_channels", 3)
    example = jax.ShapeDtypeStruct(
        (max(args.static_batch, 1), args.points, in_ch), jnp.float32
    )
    blob = export_forward(
        model,
        variables,
        example,
        batch_polymorphic=args.static_batch == 0,
        platforms=tuple(p for p in args.platforms.split(",") if p) or None,
    )
    save_exported(args.out, blob)
    print(json.dumps({
        "out": args.out,
        "bytes": len(blob),
        "batch": "polymorphic" if args.static_batch == 0 else args.static_batch,
        "points": args.points,
        "in_channels": in_ch,
    }))


if __name__ == "__main__":
    main()
