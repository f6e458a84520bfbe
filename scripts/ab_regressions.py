#!/usr/bin/env python3
"""Interleaved A/B adjudication for bench-artifact regressions.

Runs the named queries ROUND-ROBIN (q1, q2, ..., qN, q1, q2, ...) for
R rounds in one session, so ambient load hits every query equally
instead of whichever ran last — the adjudication shape SCALE.md's
"Bench-artifact discipline" prescribes. Prints per-query min/median
plus the committed r6-close / r7-close / current BENCH_FULL values so
the verdict (ambient vs real) reads off one table.

Usage:
    python scripts/ab_regressions.py [-r ROUNDS] q1 q2 ...

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from sports_betting_data_pipeline_spark.plans import QUERIES  # noqa: E402
from sports_betting_data_pipeline_spark.session import get_spark  # noqa: E402


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _committed(ref: str) -> dict[str, float]:
    try:
        raw = subprocess.run(
            ["git", "show", f"{ref}:BENCH_FULL.json"],
            capture_output=True, text=True, cwd=_REPO_DIR, check=True,
        ).stdout
        return json.loads(raw).get("queries", {})
    except Exception:
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-r", "--rounds", type=int, default=3)
    ap.add_argument("--baseline-ref", default=None,
                    help="git ref whose BENCH_FULL.json is the A side "
                         "(default: the two most recent commits touching it)")
    args = ap.parse_args()

    names = []
    for n in args.queries:
        if n not in QUERIES:
            sys.exit(f"unknown query {n!r}; see plans.QUERIES")
        names.append(n)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-regressions",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )

    # same warmup set as bench.py: don't charge first-use costs to
    # whichever target happens to run first
    warm_sf = "/root/testdata/sf0.001"
    warmup_dir = warm_sf if os.path.isdir(warm_sf) else sf_dir
    spark.range(1).count()
    for warm_name in ("q01_pricing_summary", "st05_pusher_decode",
                      "m01_multimodal_features", "st01_tumbling_window"):
        if warm_name in QUERIES:
            try:
                _consume(QUERIES[warm_name](spark, warmup_dir))
            except Exception:
                pass

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rnd in range(args.rounds):
        for n in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _consume(QUERIES[n](spark, sf_dir))
            samples[n].append(time.perf_counter() - t0)

    refs = []
    if args.baseline_ref:
        refs = [("A", args.baseline_ref)]
    else:
        log = subprocess.run(
            ["git", "log", "--format=%h", "-4", "--", "BENCH_FULL.json"],
            capture_output=True, text=True, cwd=_REPO_DIR,
        ).stdout.split()
        refs = [(f"@{h}", h) for h in log[:3]]
    committed = {label: _committed(ref) for label, ref in refs}

    hdr = f"{'query':<32} {'min':>7} {'med':>7}" + "".join(
        f" {label:>9}" for label, _ in refs
    )
    print(hdr)
    print("-" * len(hdr))
    out = {}
    for n in names:
        xs = samples[n]
        row = {
            "min": round(min(xs), 4),
            "median": round(statistics.median(xs), 4),
            "runs": [round(x, 4) for x in xs],
        }
        line = f"{n:<32} {row['min']:>7.3f} {row['median']:>7.3f}"
        for label, _ in refs:
            v = committed[label].get(n)
            line += f" {v:>9.3f}" if v is not None else f" {'-':>9}"
        print(line)
        out[n] = row
    print(json.dumps({"sf_dir": sf_dir, "rounds": args.rounds,
                      "results": out}))


if __name__ == "__main__":
    main()
