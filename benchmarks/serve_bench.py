"""Serving-engine throughput/latency (pointvit_tpu/serve.py) on the chip.

Measures what production serving actually delivers at the bench config (APF
ViT-B bf16, 1024 pts — the same model bench.py times as a bare jit'd
forward):

1. **Offline throughput** per batch bucket — InferenceSession.predict_logits
   at each bucket size, streamed dispatches, one scalar host read per timing
   block (block_until_ready lies under the tunnel, CLAUDE.md). The bucket
   ladder's largest size should match bench.py's clouds/s within padding
   overhead; smaller buckets quantify the batch-size latency/throughput
   trade for online serving.
2. **Online micro-batching** — concurrent single-cloud submitters through
   MicroBatcher; reports aggregate clouds/s and p50/p95 per-request latency.
   The tunnel adds ~25 ms RTT per synchronized dispatch, so online numbers
   under the tunnel are upper bounds on latency, not hardware truth — the
   offline section is the throughput claim.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/serve_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PRESETS = {
    "exact": {},
    "slim": {"encoder_second_width": 768},
    "v2": {"encoder_second_width": 768, "nsample": 16},
    "slim_k24": {"encoder_second_width": 768, "nsample": 24},
    "slim2": {"encoder_second_width": 384, "nsample": 16},
}


def main() -> None:
    from pointvit_tpu.models.factory import build_model
    from pointvit_tpu.serve import InferenceSession, MicroBatcher
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    tiny = "--tiny" in sys.argv  # CPU smoke: shape-path check, not a measurement
    num_points = 128 if tiny else 1024
    model_config = {
        "num_classes": 40, "in_channels": 3, "embedding_dim": 768,
        "npoint": 196, "nsample": 32, "depth": 12, "num_heads": 12,
        "bf16": True,
    }
    # --preset <name>: serve an instrument arm instead of the exact
    # architecture (e.g. the adjudicated bench default, v2). Same tables as
    # bench.py / scripts/parity_instrument.py (consistency-tested).
    preset = "exact"
    if "--preset" in sys.argv:
        preset = sys.argv[sys.argv.index("--preset") + 1]
        model_config.update(PRESETS[preset])
    if tiny:
        model_config.update(embedding_dim=32, npoint=16, nsample=8, depth=2,
                            num_heads=4, bf16=False)
    model = build_model(model_config, family="apf")
    example = jnp.zeros((1, num_points, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, example)

    buckets = (2, 4) if tiny else (8, 32, 128, 256)
    session = InferenceSession(
        model,
        variables["params"],
        variables.get("batch_stats"),
        buckets=buckets,
    )
    rng = np.random.default_rng(1)
    out: dict = {"preset": preset, "buckets": {}}

    for b in buckets:
        clouds = rng.standard_normal((b, num_points, 3)).astype(np.float32)
        t0 = time.time()
        session.predict_logits(clouds)  # compile
        compile_s = time.time() - t0
        reps, iters = 3, max(20, 512 // b)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = session._apply(clouds)
            float(jnp.sum(acc))  # host read closes the timing block
            best = min(best, (time.perf_counter() - t0) / iters)
        out["buckets"][b] = {
            "clouds_per_sec": round(b / best, 1),
            "batch_ms": round(best * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }
        print(
            f"bucket {b:4d}: {out['buckets'][b]['clouds_per_sec']:8.1f} clouds/s "
            f"({out['buckets'][b]['batch_ms']:.2f} ms/batch)",
            flush=True,
        )

    # Online: concurrent single-cloud submitters through the micro-batcher.
    n_req, conc = (16, 4) if tiny else (512, 64)
    clouds = rng.standard_normal((n_req, num_points, 3)).astype(np.float32)
    lat: list[float] = [0.0] * n_req
    idx_lock = threading.Lock()
    next_idx = [0]

    with MicroBatcher(session, max_batch=buckets[-1], max_delay_ms=5.0) as mb:
        mb.submit(clouds[0])  # warm path

        def worker():
            while True:
                with idx_lock:
                    i = next_idx[0]
                    if i >= n_req:
                        return
                    next_idx[0] += 1
                t0 = time.perf_counter()
                mb.submit(clouds[i])
                lat[i] = time.perf_counter() - t0

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker) for _ in range(conc)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    out["online"] = {
        "concurrency": conc,
        "requests": n_req,
        "clouds_per_sec": round(n_req / wall, 1),
        "p50_ms": round(float(lat_ms[n_req // 2]), 2),
        "p95_ms": round(float(lat_ms[int(n_req * 0.95)]), 2),
    }
    print(
        f"online (conc {conc}): {out['online']['clouds_per_sec']:.1f} clouds/s, "
        f"p50 {out['online']['p50_ms']:.1f} ms, p95 {out['online']['p95_ms']:.1f} ms",
        flush=True,
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
