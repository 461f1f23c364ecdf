"""HTTP front door measured end-to-end on the chip (pointvit_tpu/serve_http.py).

benchmarks/serve_bench.py drives InferenceSession/MicroBatcher directly, so
its numbers (DESIGN.md ledger: 559.2 clouds/s online conc-64 on the v2
preset) exclude the HTTP layer entirely. This bench quantifies what the
front door adds: a real ServingServer on localhost, concurrent HTTP clients
posting single clouds (both body encodings — .npy binary and JSON text, the
latter paying ~30 KB of text codec per 1024-pt cloud), plus the batch
endpoint at the biggest bucket. Deltas vs the direct-driver numbers are the
HTTP overhead claim.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/serve_http_bench.py
     [--preset v2] [--tiny]
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request

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


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _post(base: str, path: str, body: bytes, ctype: str,
          accept: str | None = None) -> object:
    headers = {"Content-Type": ctype}
    if accept:
        headers["Accept"] = accept
    req = urllib.request.Request(
        base + path, data=body, headers=headers, method="POST"
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        raw = resp.read()
    if accept:  # binary .npy response — just consume it
        return raw
    return json.loads(raw)


def _online(base: str, bodies: list[bytes], ctype: str, conc: int,
            accept: str | None = None) -> dict:
    """conc threads drain the request list; aggregate clouds/s + latency."""
    n = len(bodies)
    lat = [0.0] * n
    lock = threading.Lock()
    nxt = [0]

    def worker():
        while True:
            with lock:
                i = nxt[0]
                if i >= n:
                    return
                nxt[0] += 1
            t0 = time.perf_counter()
            _post(base, "/v1/classify", bodies[i], ctype, accept)
            lat[i] = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    return {
        "concurrency": conc,
        "requests": n,
        "clouds_per_sec": round(n / wall, 1),
        "p50_ms": round(float(lat_ms[n // 2]), 2),
        "p95_ms": round(float(lat_ms[int(n * 0.95)]), 2),
    }


def main() -> None:
    from pointvit_tpu.models.factory import build_model
    from pointvit_tpu.serve import InferenceSession
    from pointvit_tpu.serve_http import make_server
    from pointvit_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    tiny = "--tiny" in sys.argv  # CPU smoke: shape-path check, not a measurement
    num_points = 128 if tiny else 1024
    model_config = {
        "num_classes": 40, "in_channels": 3, "embedding_dim": 768,
        "npoint": 196, "nsample": 32, "depth": 12, "num_heads": 12,
        "bf16": True,
    }
    # Default to the adjudicated serving default (bench.py DEFAULT_PRESET is
    # slim2 as of r5) so the overhead delta lands on the number that ships.
    preset = "slim2"
    if "--preset" in sys.argv:
        preset = sys.argv[sys.argv.index("--preset") + 1]
    model_config.update(PRESETS[preset])
    if tiny:
        model_config.update(embedding_dim=32, npoint=16, nsample=8, depth=2,
                            num_heads=4, bf16=False)
        model_config.pop("encoder_second_width", None)
    model = build_model(model_config, family="apf")
    example = jnp.zeros((1, num_points, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, example)

    buckets = (2, 4) if tiny else (8, 32, 128, 256)
    session = InferenceSession(
        model, variables["params"], variables.get("batch_stats"),
        buckets=buckets,
    )
    session.warmup(np.zeros((num_points, 3), np.float32))

    server = make_server(session, host="127.0.0.1", port=0, max_delay_ms=5.0,
                         max_batch=buckets[-1])
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    out: dict = {"preset": preset, "buckets": list(buckets)}
    try:
        rng = np.random.default_rng(1)
        n_req, conc = (16, 4) if tiny else (512, 64)
        clouds = rng.standard_normal((n_req, num_points, 3)).astype(np.float32)

        # warm the full path (server threads, batcher, codecs)
        _post(base, "/v1/classify", _npy_bytes(clouds[0]),
              "application/x-npy")

        npy_bodies = [_npy_bytes(c) for c in clouds]
        out["online_npy"] = _online(base, npy_bodies, "application/x-npy", conc)
        print(f"online npy  (conc {conc}): "
              f"{out['online_npy']['clouds_per_sec']:.1f} clouds/s, "
              f"p50 {out['online_npy']['p50_ms']:.1f} ms, "
              f"p95 {out['online_npy']['p95_ms']:.1f} ms", flush=True)

        # binary both ways: .npy request AND .npy response (r5 negotiation)
        out["online_npy2"] = _online(
            base, npy_bodies, "application/x-npy", conc,
            accept="application/x-npy")
        print(f"online npy2 (conc {conc}): "
              f"{out['online_npy2']['clouds_per_sec']:.1f} clouds/s, "
              f"p50 {out['online_npy2']['p50_ms']:.1f} ms, "
              f"p95 {out['online_npy2']['p95_ms']:.1f} ms", flush=True)

        json_bodies = [
            json.dumps({"points": c.tolist()}).encode() for c in clouds
        ]
        out["online_json"] = _online(base, json_bodies, "application/json", conc)
        print(f"online json (conc {conc}): "
              f"{out['online_json']['clouds_per_sec']:.1f} clouds/s, "
              f"p50 {out['online_json']['p50_ms']:.1f} ms, "
              f"p95 {out['online_json']['p95_ms']:.1f} ms", flush=True)

        # Batch endpoint at the biggest bucket (the offline-path
        # equivalent), with JSON and binary response encodings.
        b = buckets[-1]
        batch = rng.standard_normal((b, num_points, 3)).astype(np.float32)
        body = _npy_bytes(batch)
        iters = 2 if tiny else 20
        for tag, accept in (("batch_npy", None),
                            ("batch_npy2", "application/x-npy")):
            _post(base, "/v1/classify_batch", body, "application/x-npy",
                  accept)  # warm
            t0 = time.perf_counter()
            for _ in range(iters):
                _post(base, "/v1/classify_batch", body, "application/x-npy",
                      accept)
            per = (time.perf_counter() - t0) / iters
            out[tag] = {
                "batch": b,
                "clouds_per_sec": round(b / per, 1),
                "roundtrip_ms": round(per * 1e3, 2),
            }
            print(f"{tag} {b}: {out[tag]['clouds_per_sec']:.1f} "
                  f"clouds/s ({out[tag]['roundtrip_ms']:.1f} ms/req)",
                  flush=True)
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
