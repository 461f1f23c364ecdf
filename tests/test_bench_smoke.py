"""Queued-bench smoke: every TPU-queued benchmark script runs end-to-end.

The on-device benchmarks are drained unattended by resilient waiters during
tunnel outages (CLAUDE.md); a Python-level bug in one of them burns its
retry budget and silently loses the measurement slot. Each script therefore
carries a ``--tiny`` (or small-args) CPU mode exercising the identical code
path at smoke shapes, and this module pins those modes in subprocesses —
train_step_bench's missing batch_stats plumbing (caught by exactly this
smoke, r4) is the class of bug being guarded against.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=540):
    env = dict(os.environ)
    # CPU-only subprocess: drop the axon pool var, or sitecustomize dials the
    # TPU relay at interpreter startup and, during a tunnel outage, can spin
    # in its connect-retry loop before the bench even starts (CLAUDE.md).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


def _last_json(stdout: str):
    # Benches print progress lines then one JSON blob (possibly multi-line).
    text = stdout[stdout.index("{"):]
    return json.loads(text)


@pytest.mark.parametrize(
    "script,args,keys",
    [
        ("preset_throughput.py", ["exact", "v2", "--tiny"], ["exact", "v2"]),
        ("train_step_bench.py", ["exact", "exact_ga2", "--tiny"],
         ["exact", "exact_ga2"]),
        ("pix4point_anatomy.py", ["--tiny"], ["full_model_ms", "attention_ms"]),
        ("apf_anatomy.py", ["v2", "--tiny"], ["full_model_ms", "encoder_ms"]),
        (
            "renderer_fused_bench.py",
            ["--tiny"],
            ["fused_blocks_ms", "attn_only_ms", "speedup"],
        ),
        ("serve_bench.py", ["--tiny", "--preset", "v2"], ["buckets"]),
        ("serve_http_bench.py", ["--tiny", "--preset", "v2"],
         ["online_npy", "online_json", "batch_npy"]),
        (
            "pix4point_bench.py",
            ["--batch", "4", "--points", "256", "--iters", "1"],
            ["value"],
        ),
    ],
)
def test_bench_script_smokes(script, args, keys):
    r = _run(script, *args)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    out = _last_json(r.stdout)
    for k in keys:
        assert k in out, f"{script} output missing {k!r}: {out}"
