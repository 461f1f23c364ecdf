"""Mechanically pick bench.py's default preset from evidence on disk.

The written rule (DESIGN.md "r3 accuracy-parity instrument"): the bench
default must be the **fastest arm ACCEPTED** by the paired-seed instrument.
This script applies it with two safety rails:

1. **Negative-control sanity**: if the instrument's negative control
   (``neg_k8``, expected to regress) is itself ACCEPTED, the instrument has
   no discriminative power — every acceptance it issued is void and the
   default reverts to ``exact``.
2. **Measured, not projected**: an arm only wins on a *measured* on-device
   clouds/s (benchmarks/preset_throughput.py output); accepted-but-unmeasured
   arms are ignored.

Writes the decision + rationale to ``<out>/bench_default_decision.json`` and
(with ``--apply``) rewrites the ``DEFAULT_PRESET = "..."`` line in bench.py.

Usage:
    python scripts/adjudicate_bench_default.py \
        --summary results/parity_r3/summary.json \
        --throughput /tmp/ondevice_preset_throughput.out --apply
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def load_throughput(path: str) -> dict:
    """Parse the trailing JSON object from preset_throughput.py output."""
    text = open(path).read()
    start = text.rfind("\n{")
    if start < 0:
        start = 0 if text.lstrip().startswith("{") else -1
    if start < 0:
        return {}
    try:
        return json.loads(text[start:])
    except json.JSONDecodeError:
        return {}


def decide(summary: dict, throughput: dict) -> dict:
    arms = summary.get("arms", {})
    decision = {"rule": "fastest ACCEPTED arm with measured clouds/s; "
                        "exact if the negative control is accepted or "
                        "nothing admissible is measured"}

    # The rail requires the negative control to have been run AND rejected:
    # an absent/unverdicted neg_k8 entry means the instrument's
    # discriminative power is unverified, so no acceptance may be trusted
    # (advisor r3: arms.get(...) returning {} silently passed this rail).
    neg = arms.get("neg_k8", {})
    if neg.get("accepted") is not False:
        decision.update(
            choice="exact",
            reason=(
                "negative control (neg_k8) ACCEPTED — instrument "
                "discredited, every acceptance void"
                if neg.get("accepted") is True
                else "negative control (neg_k8) missing or unverdicted — "
                     "instrument power unverified, acceptances not usable"
            ),
        )
        return decision

    admissible = {"exact"} | {
        a for a, e in arms.items() if e.get("accepted") is True
    }
    measured = {
        a: throughput[a]["clouds_per_sec"]
        for a in admissible
        if a in throughput and "clouds_per_sec" in throughput[a]
    }
    if not measured:
        decision.update(
            choice=None,
            reason="no admissible arm has a measured throughput — keep "
                   "the current default",
            admissible=sorted(admissible),
        )
        return decision

    choice = max(measured, key=measured.get)
    decision.update(
        choice=choice,
        reason=f"fastest measured among accepted arms: "
               f"{ {a: round(v, 1) for a, v in sorted(measured.items())} }",
        admissible=sorted(admissible),
        measured={a: round(v, 1) for a, v in measured.items()},
    )
    return decision


def apply_to_bench(bench_path: str, preset: str) -> None:
    src = open(bench_path).read()
    new, n = re.subn(
        r'^(\s*)DEFAULT_PRESET = "[a-z0-9_]+"',
        rf'\1DEFAULT_PRESET = "{preset}"',
        src,
        count=1,
        flags=re.M,
    )
    if n != 1:
        raise SystemExit(f"DEFAULT_PRESET line not found in {bench_path}")
    open(bench_path, "w").write(new)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--summary", default="results/parity_r3/summary.json")
    ap.add_argument("--throughput", required=True,
                    help="file containing preset_throughput.py output")
    ap.add_argument("--bench", default="bench.py")
    ap.add_argument("--apply", action="store_true",
                    help="rewrite DEFAULT_PRESET in --bench (else dry-run)")
    args = ap.parse_args()

    summary = json.load(open(args.summary))
    throughput = load_throughput(args.throughput) if os.path.exists(
        args.throughput) else {}
    decision = decide(summary, throughput)

    out_dir = os.path.dirname(os.path.abspath(args.summary))
    with open(os.path.join(out_dir, "bench_default_decision.json"), "w") as f:
        json.dump(decision, f, indent=1)
    print(json.dumps(decision, indent=1))

    if args.apply and decision.get("choice"):
        apply_to_bench(args.bench, decision["choice"])
        print(f"applied: DEFAULT_PRESET = \"{decision['choice']}\" in {args.bench}")
    elif args.apply:
        print("no change applied (no admissible measured arm)")


if __name__ == "__main__":
    main()
