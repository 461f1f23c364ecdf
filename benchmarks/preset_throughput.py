"""Inference throughput (clouds/s/chip) for each parity-instrument arm.

Companion to scripts/parity_instrument.py: accuracy decides which FLOP-cut
presets are admissible (written accept rule, results/parity_r3/summary.json);
this measures what each admissible arm actually buys at the bench config
(batch 256, 1024 pts, APF ViT-B bf16). Timing per CLAUDE.md: one scalar
host read per timing block (block_until_ready lies under the tunnel).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/preset_throughput.py [arms...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ARMS: dict[str, dict] = {
    "exact": {},
    "slim": {"encoder_second_width": 768},
    "v2": {"encoder_second_width": 768, "nsample": 16},
    "k24": {"nsample": 24},
    "g160": {"npoint": 160},
    "slim_k24": {"encoder_second_width": 768, "nsample": 24},
    "stack": {"encoder_second_width": 768, "nsample": 24, "npoint": 160},
    "v3": {"encoder_second_width": 768, "nsample": 16, "npoint": 160},
    # phase-4 (r5): second halving of the encoder's second stack on top of
    # v2 (results/parity_r5/PHASE4.md).
    "slim2": {"encoder_second_width": 384, "nsample": 16},
}


def main() -> None:
    from pointvit_tpu.models import AdaptPointFormer
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    tiny = "--tiny" in sys.argv  # CPU smoke: shape-path check, not a measurement
    arms = [a for a in sys.argv[1:] if not a.startswith("--")] or list(ARMS)
    batch, num_points = (8, 256) if tiny else (256, 1024)
    points = jax.random.normal(jax.random.PRNGKey(0), (batch, num_points, 3), jnp.float32)
    out = {}
    for arm in arms:
        kwargs = dict(
            num_classes=40, in_channels=3, embedding_dim=768, npoint=196,
            nsample=32, depth=12, num_heads=12, dtype=jnp.bfloat16,
        )
        kwargs.update(ARMS[arm])
        if tiny:
            # Applied AFTER the arm preset so smoke shapes win; arm-relative
            # cuts (slim width, g160 group count) are remapped to the tiny
            # scale so every arm still exercises its distinct code path.
            kwargs.update(embedding_dim=64, npoint=32, depth=2, num_heads=4,
                          dtype=jnp.float32)
            if ARMS[arm].get("encoder_second_width") is not None:
                kwargs["encoder_second_width"] = 64
            if ARMS[arm].get("npoint") == 160:
                kwargs["npoint"] = 24
        model = AdaptPointFormer(**kwargs)
        variables = model.init({"params": jax.random.PRNGKey(1)}, points[:1])
        fwd = jax.jit(lambda v, p: jnp.sum(model.apply(v, p, train=False)))
        t0 = time.time()
        float(fwd(variables, points))
        compile_s = time.time() - t0
        reps, iters = (1, 2) if tiny else (3, 20)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fwd(variables, points)
            float(o)
            best = min(best, (time.perf_counter() - t0) / iters)
        out[arm] = {
            "clouds_per_sec": round(batch / best, 1),
            "step_ms": round(best * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }
        print(f"{arm:9s}: {out[arm]['clouds_per_sec']:7.1f} clouds/s "
              f"({out[arm]['step_ms']:.2f} ms/step)", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
