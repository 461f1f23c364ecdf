"""Benchmark: APF flagship inference throughput, clouds/sec/chip.

North-star metric (BASELINE.md): ModelNet40-style classification of 1024-pt
clouds through the full APF pipeline — on-device FPS+kNN+Morton tokenizer,
mini-PointNet embedding, 12 adapter-ViT-B blocks, head — in bf16, target
≥5,000 clouds/sec/chip. Clouds are synthetic (the environment ships no
datasets); throughput is shape-dependent only.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "clouds/sec/chip", "vs_baseline": N}
plus auxiliary metrics (tokenizer µs/cloud) on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _require_backend() -> None:
    """Fail with ONE machine-readable JSON line if no device backend is up.

    The axon TPU arrives through a loopback tunnel that can be down for
    hours (host-side relay); a raw RuntimeError traceback here left
    BENCH_r03.json unparseable. Keep rc != 0 so the driver still records
    the failure.
    """
    try:
        dev = jax.devices()[0]
    except Exception as e:  # backend init failure (tunnel down, etc.)
        print(json.dumps({
            "error": "tpu-unavailable",
            "detail": f"{type(e).__name__}: {e}"[:500],
            "metric": "ModelNet40 clouds/sec/chip",
            "value": None,
        }))
        raise SystemExit(2)
    print(f"aux: backend up: {dev}", file=sys.stderr)


def resolve_bench_clouds(batch: int, num_points: int):
    """(points, data_kind): real ModelNet40 test clouds when a data drop
    exists (``POINTVIT_MODELNET40``, default ``.data/modelnet40_ply_hdf5_2048``),
    synthetic otherwise. Throughput is shape-dependent only, but the JSON
    line self-describes which it measured (judge r4: the metric name must
    not imply a dataset the bench never touched). Short batches tile."""
    import os

    root = os.environ.get(
        "POINTVIT_MODELNET40", ".data/modelnet40_ply_hdf5_2048")
    if os.path.isdir(root):
        try:
            from pointvit_tpu.data.modelnet40 import ModelNet40

            ds = ModelNet40(root, split="test", num_points=num_points)
            clouds = jnp.asarray(ds.data[:, :num_points, :], jnp.float32)
            reps = -(-batch // clouds.shape[0])
            return jnp.tile(clouds, (reps, 1, 1))[:batch], "modelnet40"
        except Exception as e:
            print(f"aux: modelnet40 load failed ({e}); synthetic fallback",
                  file=sys.stderr)
    return (
        jax.random.normal(
            jax.random.PRNGKey(0), (batch, num_points, 3), jnp.float32
        ),
        "synthetic",
    )


def main() -> None:
    import os

    from pointvit_tpu.models import AdaptPointFormer
    from pointvit_tpu.ops import apf_group
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    _require_backend()
    enable_compilation_cache()

    batch = int(os.environ.get("POINTVIT_BENCH_BATCH", "256"))
    num_points = 1024

    # Preset selection. The default is the fastest arm ACCEPTED by the r3
    # accuracy-parity instrument (≥5 paired seeds, written accept rule —
    # scripts/parity_instrument.py, results/parity_r3/summary.json); the
    # reference-exact architecture is always available via
    # POINTVIT_BENCH_EXACT=1, and any instrument arm via
    # POINTVIT_BENCH_PRESET=<exact|slim|v2|k24|g160|slim_k24|stack|v3|slim2>.
    PRESETS = {
        "exact": {},
        "slim": {"encoder_second_width": 768},
        "v2": {"encoder_second_width": 768, "nsample": 16},
        "k24": {"nsample": 24},
        "g160": {"npoint": 160},
        "slim_k24": {"encoder_second_width": 768, "nsample": 24},
        "stack": {"encoder_second_width": 768, "nsample": 24, "npoint": 160},
        "v3": {"encoder_second_width": 768, "nsample": 16, "npoint": 160},
        "slim2": {"encoder_second_width": 384, "nsample": 16},
    }
    # The default is set mechanically by scripts/adjudicate_bench_default.py
    # (results/parity_r5/bench_default_decision.json): fastest arm that is
    # BOTH instrument-ACCEPTED and has a *measured* on-device clouds/s, with
    # the neg_k8 negative control verified REJECTED. As of r5 that is slim2
    # (phase-4, protocol p2: accepted +1.65 pp at n=10 paired seeds, CI
    # [-2.59, +5.89]; measured 3320.6 clouds/s by
    # benchmarks/preset_throughput.py).
    DEFAULT_PRESET = "slim2"
    name = os.environ.get("POINTVIT_BENCH_PRESET", DEFAULT_PRESET)
    if os.environ.get("POINTVIT_BENCH_EXACT", "") == "1":
        name = "exact"
    kwargs = dict(
        num_classes=40,
        in_channels=3,
        embedding_dim=768,
        npoint=196,
        nsample=32,
        depth=12,
        num_heads=12,
        dtype=jnp.bfloat16,
    )
    kwargs.update(PRESETS[name])
    exact = name == "exact"
    model = AdaptPointFormer(**kwargs)
    points, data_kind = resolve_bench_clouds(batch, num_points)
    variables = model.init({"params": jax.random.PRNGKey(1)}, points[:1])

    # NOTE: under the remote-TPU tunnel, block_until_ready() returns before
    # device execution completes; only a host read of the result forces real
    # completion. Every timing block therefore ends with float(sum(out)).
    fwd = jax.jit(lambda v, p: jnp.sum(model.apply(v, p, train=False)))
    float(fwd(variables, points))  # compile + first execution

    # Steady state: several timed repetitions, best-of policy for stability.
    reps, iters = 3, 20
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, points)
        float(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    clouds_per_sec = batch / best

    # Secondary: tokenizer-only µs/cloud (FPS+kNN+Morton grouping).
    G, K = kwargs["npoint"], kwargs["nsample"]
    tok = jax.jit(lambda p: jnp.sum(apf_group(p, p, G, K)[0]))
    float(tok(points))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = tok(points)
    float(o)
    tok_us = (time.perf_counter() - t0) / iters / batch * 1e6
    print(
        f"aux: tokenizer {tok_us:.1f} us/cloud; step {best*1e3:.2f} ms "
        f"@ batch {batch}; device {jax.devices()[0]}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": (
                    "ModelNet40 clouds/sec/chip (1024 pts, APF ViT-B bf16 inference"
                    + ("" if exact else f", serving preset '{name}'")
                    + ")"
                ),
                "value": round(clouds_per_sec, 1),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(clouds_per_sec / 5000.0, 3),
                "data": data_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
