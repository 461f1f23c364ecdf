"""Serve a trained checkpoint (or exported StableHLO artifact) over HTTP.

One command is the complete serving deployment — the reference has no
inference entry point at all (its `predict` lives inside a fully
constructed trainer, src/train/renderer_trainer.py:431-445):

    python scripts/serve_http.py --checkpoint out/model_best.msgpack
    python scripts/serve_http.py --exported out/apf_export --port 8080

Then from any client:

    curl -s localhost:8000/v1/health
    curl -s -X POST localhost:8000/v1/classify \
         -H 'Content-Type: application/json' \
         -d '{"points": [[0.1, 0.2, 0.3], ...]}'

Endpoints, body encodings, and the coalescing model are documented in
pointvit_tpu/serve_http.py. `--dp` shards request batches over all local
devices (mesh data parallelism, parallel/mesh.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="trainer .msgpack (+ sidecar .json)")
    src.add_argument("--exported", help="StableHLO artifact dir (scripts/export_model.py)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--buckets", default="8,32,128,256",
                    help="comma-separated ascending batch buckets")
    ap.add_argument("--max-batch", type=int, default=256,
                    help="micro-batcher flush size")
    ap.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="micro-batcher latency bound")
    ap.add_argument("--max-body-mb", type=float, default=64.0,
                    help="reject request bodies above this size with 413")
    ap.add_argument("--raw-weights", action="store_true",
                    help="serve raw (non-EMA) weights from an EMA checkpoint")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all local devices")
    ap.add_argument("--warmup-points", type=int, default=0,
                    help="if > 0, pre-compile every bucket with (this, C)-point clouds")
    ap.add_argument("--warmup-channels", type=int, default=3)
    ap.add_argument("--verbose", action="store_true", help="log requests")
    args = ap.parse_args()

    from pointvit_tpu.serve import InferenceSession
    from pointvit_tpu.serve_http import make_server

    mesh = None
    if args.dp:
        from pointvit_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()

    buckets = tuple(int(b) for b in args.buckets.split(","))
    if args.exported:
        session = InferenceSession.from_exported(
            args.exported, mesh=mesh, buckets=buckets)
    else:
        session = InferenceSession.from_checkpoint(
            args.checkpoint, mesh=mesh, buckets=buckets,
            use_ema=not args.raw_weights)

    if args.warmup_points > 0:
        import numpy as np
        example = np.zeros(
            (args.warmup_points, args.warmup_channels), np.float32)
        print(f"warming {len(session.buckets)} buckets ...", flush=True)
        session.warmup(example)

    server = make_server(
        session, host=args.host, port=args.port,
        max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
        max_body_bytes=int(args.max_body_mb * 1024 * 1024),
        verbose=args.verbose,
    )
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port} buckets={list(session.buckets)}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.server_close()


if __name__ == "__main__":
    main()
