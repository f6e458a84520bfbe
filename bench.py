#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (computes every
row/column, no driver-side collect), which is the honest measure of
operator throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from sports_betting_data_pipeline_spark.plans import QUERIES  # noqa: E402
from sports_betting_data_pipeline_spark.session import get_spark  # noqa: E402


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# The two documented O(N²) certification audit twins (SCALE.md's sf1
# adjudication table): each certifies a bucketed production path (l42 →
# l43's IVF ANN, l21 → l22's banded LSH CC) and carries a small-cohort
# contract in its docstring. production_total excludes them (VERDICT r9
# next-#4); tests/test_plans.py pins this set against the catalog.
AUDIT_TWINS = frozenset({"l42_bitext_mining", "l21_dedup_clusters"})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )

    # Warm up the JVM/codegen before timing. One batch query is not
    # enough: r3's driver bench charged ~5 s of first-use cost to
    # whichever query first touched a cold subsystem (st05 5.61 s
    # driver vs ~1.1 s warm — from_json/base64 codegen; VERDICT r3
    # next-#4). Exercise each expensive subsystem on tiny inputs:
    #   - flagship batch query (scans, hash aggregate, codegen)
    #   - JSON/base64 expression stack (st05's shape)
    #   - Arrow/Python worker fork (Pandas UDF paths)
    #   - streaming engine + state store (availableNow drain)
    warm_sf = "/root/testdata/sf0.001"
    warmup_dir = warm_sf if os.path.isdir(warm_sf) else sf_dir
    spark.range(1).count()
    _consume(QUERIES["q01_pricing_summary"](spark, sf_dir))
    for warm_name in (
        "st05_pusher_decode",   # to_json/base64/from_json codegen
        "m01_multimodal_features",  # Arrow + Python worker startup
        "st01_tumbling_window",  # streaming engine + state store
    ):
        if warm_name in QUERIES:
            try:
                _consume(QUERIES[warm_name](spark, warmup_dir))
            except Exception:
                pass  # warmup must never fail the bench

    # Best-of-N per query (default 2): single-shot numbers on a shared
    # box fold GC pauses and first-use warmup (state stores, Python
    # workers) into whichever query hits them; the min is the honest
    # operator cost.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        best = None
        for _ in range(runs):
            # Clear BEFORE each timed run, not once per query: many
            # plans .cache() intermediates (MinHash base, SemDeDup
            # assignment, CC edges, ...), so a per-query clear would
            # let run 2 replay run 1's InMemoryRelation and min-of-N
            # would report a warm-cache replay instead of the operator
            # cost (ADVICE r5). Clearing here keeps every timed run
            # cold-cache and still stops storage memory accumulating
            # across the catalog sweep (ADVICE r4).
            spark.catalog.clearCache()
            start = time.perf_counter()
            _consume(QUERIES[name](spark, sf_dir))
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    # production_total: the headline minus the documented audit twins
    # (see AUDIT_TWINS above) — at sf1 they are 26% of the total for
    # queries a user would never run at scale; both stay in `queries`.
    production_total = round(
        sum(v for k, v in timings.items() if k not in AUDIT_TWINS), 4
    )
    # Self-normalizing artifact (VERDICT r6 #5): cross-run comparisons
    # on a shared box are confounded by ambient load (measured
    # ×1.0-1.3 within a day). Emit the per-query MEDIAN ratio vs the
    # previous BENCH_FULL.json so every artifact carries its own
    # correction factor — the median over the (mostly untouched)
    # catalog is robust to the handful of queries a round actually
    # changes. ambient_factor > 1 means THIS run saw a slower box;
    # divide by it before reading per-query deltas as real.
    # $SPARK_GRAFT_BENCH_OUT redirects the artifact (and its ambient
    # reference) so off-default-SF runs — the sf1 catalog bench — never
    # clobber the quiet-window sf0.1 artifact.
    out_path = os.path.join(
        _REPO_DIR, os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    )
    ambient = {}
    try:
        with open(out_path) as fh:
            prev = json.loads(fh.read())
        # an artifact from a different SF is not an ambient reference
        prev_q = (prev.get("queries") or {}) if prev.get("sf") == sf else {}
        ratios = sorted(
            timings[q] / prev_q[q]
            for q in timings
            if q in prev_q and prev_q[q] > 0
        )
        if ratios:
            mid = len(ratios) // 2
            med = (
                ratios[mid]
                if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2
            )
            ambient = {
                "ambient_factor": round(med, 4),
                "ambient_ref_total": prev.get("value"),
                "ambient_n": len(ratios),
            }
    except (OSError, ValueError, KeyError, ZeroDivisionError):
        pass
    payload = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "production_total": production_total,
            "audit_twin_seconds": round(total - production_total, 4),
            **ambient,
        }
    )
    # Persist the full per-query table too: stdout capture can truncate
    # the (long) JSON line, losing the timing breakdown.
    try:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")
    except OSError:
        pass
    # Full payload first, compact line LAST: the driver keeps the
    # stdout TAIL, so the final short line is the one guaranteed to
    # survive truncation and parse (r3 printed compact-first and the
    # driver's tail cut it — BENCH_r03.json "parsed": null;
    # VERDICT r3 next-#3).
    print(payload)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
                "production_total": production_total,
            }
        )
    )


if __name__ == "__main__":
    main()
