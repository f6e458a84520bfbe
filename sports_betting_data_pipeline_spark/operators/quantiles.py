"""Distributed EXACT quantiles without a single-node value buffer.

Spark's builtin ``percentile`` is exact but buffers every value into
one final merge (an OpenHashMap funneled through a single reducer) —
the one shape that cannot survive 100 TB. ``approx_percentile`` scales
but is a sketch. This operator provides the third point on the curve:
exact interpolated quantiles computed the distributed way, by
ITERATIVE BUCKET REFINEMENT (the classic distributed exact-selection
algorithm) instead of a global range-partition + sort (the r6 design,
measured ~2/3 of a08's cost at sf0.1 — the sort moves every row
through a shuffle to answer 18 ranks):

1. one aggregate gives (count, min, max); the target RANKS
   (``pos = p·(n−1)``, lo/hi bracket) are derived from ``n``;
2. each refinement level scans the column once, histogramming the
   still-active candidate intervals into ``buckets`` equal-width
   buckets (a map-side-combined hash aggregate — only
   groups×buckets tiny rows shuffle, never the data);
3. the driver reads the per-level histogram (bounded:
   ≤ 2·|probs|·buckets rows) and narrows each rank's candidate
   predicate to its containing bucket — the same steering-scalar
   pattern as connected_components' convergence counts;
4. when every rank's candidate set is ≤ ``refine_threshold`` rows (or
   resolved exactly because its bucket held one distinct value), one
   final scan extracts the ranked values with a per-rank window over
   the (tiny) filtered candidates, and the interpolation
   ``v_lo + frac·(v_hi − v_lo)`` + rounding happen IN-PLAN with the
   same Spark expressions as before — no data value ever reaches the
   driver.

At 100 TB: levels = O(log_buckets(N / threshold)) full-column scans
(3 at 10^12 rows) with nothing but histogram partials on the wire —
strictly cheaper than shuffling the full column for a range sort.
Bucket assignment is a deterministic float expression reused verbatim
between the histogram scan and the candidate filter, so boundary
rounding can never lose a row (membership is BY BUCKET INDEX, clamped
into range — the interval floats only steer the next level's bucket
function). NULLs are excluded up front, matching builtin
``percentile`` / DuckDB ``quantile_cont`` semantics.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket_sql(lo: float, hi: float, buckets: int) -> str:
    """Deterministic bucket index of ``v`` in [lo, hi] — clamped into
    [0, buckets) so float-boundary rounding keeps every candidate in
    SOME bucket (exactness never depends on the interval floats)."""
    w = hi - lo
    return (
        f"least(greatest(CAST(floor((CAST(v AS DOUBLE) - {lo!r}D) "
        f"/ {w!r}D * {buckets}) AS INT), 0), {buckets - 1})"
    )


def exact_quantile_cuts(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    num_partitions: int = 32,
    round_to: int | None = 4,
    buckets: int = 1024,
    refine_threshold: int = 65536,
    max_levels: int = 8,
) -> DataFrame:
    """Return a 1-row DataFrame ``[qs: array<double>]`` of exact
    interpolated quantiles of ``df[col]`` at ``probs`` (ascending).

    Equivalent to ``F.percentile(col, probs)`` / DuckDB
    ``quantile_cont(col, probs)`` but scales: the value set is never
    buffered on one node and never globally sorted. ``round_to``
    rounds each cut (engine-portable boundaries for downstream
    bucketing); pass None to skip. ``num_partitions`` is kept for API
    compatibility with the r6 range-sort implementation and ignored.

    ``refine_threshold`` / ``max_levels`` only bound how far the
    histogram refinement PRUNES before the final window pass — the
    result is exact for any setting (the final pass ranks whatever
    candidates remain).
    """
    spark = df.sparkSession
    if not list(probs):
        # no requested quantiles: empty result, no column scan at all
        return spark.range(1).select(
            F.expr("CAST(array() AS array<double>)").alias("qs")
        )
    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    head = vals.agg(
        F.count("v").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx")
    ).collect()[0]
    n = int(head["n"])
    if n == 0:
        return spark.range(1).select(
            F.expr("CAST(array() AS array<double>)").alias("qs")
        )
    mn, mx = float(head["mn"]), float(head["mx"])
    if mn == mx:
        # Constant column: every quantile IS mn — resolve from the head
        # aggregate alone. Without this the refinement loop never
        # activates (no interval to narrow) and the final pass would
        # window the ENTIRE column per rank on one reducer — the exact
        # single-node funnel this operator exists to avoid.
        # Build the literal with F.lit, not a string-formatted SQL
        # fragment: repr(inf) is 'inf', which Spark's parser rejects,
        # while F.lit round-trips any IEEE double (±Infinity included).
        cut = F.lit(mn).cast("double")
        if round_to is not None:
            # Spark's round (HALF_UP), not Python's round (banker's) —
            # the same expression the in-plan path applies.
            cut = F.round(cut, int(round_to))
        return spark.range(1).select(
            F.array(*[cut for _ in probs]).alias("qs")
        )

    # Target ranks (0-based) per prob: pos = p·(n−1), lo/hi bracket it.
    parts = []  # (pi, lo_rank, hi_rank, frac)
    for pi, p in enumerate(probs):
        pos = float(p) * (n - 1)
        lo_r, hi_r = int(math.floor(pos)), int(math.ceil(pos))
        parts.append((pi, lo_r, hi_r, pos - math.floor(pos)))
    ranks = sorted({r for _, lo_r, hi_r, _ in parts for r in (lo_r, hi_r)})
    state = {
        r: {"pred": "true", "lo": mn, "hi": mx, "offset": 0, "count": n,
            "value": None}
        for r in ranks
    }

    for _ in range(max_levels):
        active = [
            r
            for r in ranks
            if state[r]["value"] is None
            and state[r]["count"] > refine_threshold
            and state[r]["hi"] > state[r]["lo"]
        ]
        if not active:
            break
        # Group ranks sharing an identical candidate interval (level 1:
        # ALL of them — one histogram serves every rank).
        groups: dict[tuple, list[int]] = {}
        for r in active:
            st = state[r]
            groups.setdefault((st["pred"], st["lo"], st["hi"]), []).append(r)
        glist = list(groups.items())
        if len(glist) == 1 and glist[0][0][0] == "true":
            # Level-1 fast path (every rank shares the full-range
            # interval): plain bucket histogram, no explode pass.
            (pred, lo, hi), _ = glist[0]
            hist = (
                vals.select(
                    "v", F.expr(_bucket_sql(lo, hi, buckets)).alias("b")
                )
                .groupBy("b")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.min("v").alias("bmn"),
                    F.max("v").alias("bmx"),
                )
                .withColumn("g", F.lit(0))
            ).collect()
        else:
            structs = ", ".join(
                "named_struct('g', {g}, 'b', IF({pred}, {b}, CAST(NULL AS INT)))".format(
                    g=gi, pred=pred, b=_bucket_sql(lo, hi, buckets)
                )
                for gi, ((pred, lo, hi), _) in enumerate(glist)
            )
            hist = (
                vals.select(
                    "v", F.expr(f"explode(array({structs}))").alias("s")
                )
                .select("v", F.col("s.g").alias("g"), F.col("s.b").alias("b"))
                .filter(F.col("b").isNotNull())
                .groupBy("g", "b")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.min("v").alias("bmn"),
                    F.max("v").alias("bmx"),
                )
            ).collect()
        per_group: dict[int, dict[int, tuple]] = {}
        for row in hist:
            per_group.setdefault(int(row["g"]), {})[int(row["b"])] = (
                int(row["c"]),
                row["bmn"],
                row["bmx"],
            )
        for gi, ((pred, lo, hi), grp_ranks) in enumerate(glist):
            counts = per_group.get(gi, {})
            order = sorted(counts)
            for r in grp_ranks:
                st = state[r]
                local_target = r - st["offset"]  # 0-based within candidates
                cum = 0
                for b in order:
                    c, bmn, bmx = counts[b]
                    if cum + c > local_target:
                        st["offset"] += cum
                        st["count"] = c
                        if bmn == bmx:
                            st["value"] = bmn  # single distinct value
                        else:
                            st["pred"] = (
                                f"({st['pred']}) AND "
                                f"({_bucket_sql(lo, hi, buckets)}) = {b}"
                            )
                            w = hi - lo
                            st["lo"] = lo + w * b / buckets
                            st["hi"] = lo + w * (b + 1) / buckets
                        break
                    cum += c

    # Final extraction: rank the surviving candidates per rank with a
    # window
    # (bounded by refine_threshold×|ranks| rows), union the
    # exactly-resolved ranks as literals, interpolate + round in-plan.
    unresolved = [r for r in ranks if state[r]["value"] is None]
    rank_val_frames = []
    if unresolved:
        structs = ", ".join(
            "named_struct('r', {r}, 'ok', IF({pred}, true, false))".format(
                r=r, pred=state[r]["pred"]
            )
            for r in unresolved
        )
        want_rn = " ".join(
            f"WHEN {r} THEN {r - state[r]['offset'] + 1}" for r in unresolved
        )
        cand = (
            vals.select("v", F.expr(f"explode(array({structs}))").alias("s"))
            .filter(F.col("s.ok"))
            .select(F.col("s.r").alias("_rank"), "v")
        )
        win = Window.partitionBy("_rank").orderBy("v")
        rank_val_frames.append(
            cand.withColumn("_rn", F.row_number().over(win))
            .filter(F.expr(f"_rn = (CASE _rank {want_rn} END)"))
            .select("_rank", F.col("v").cast("double").alias("_rv"))
        )
    resolved = [(r, state[r]["value"]) for r in ranks if state[r]["value"] is not None]
    if resolved:
        lits = ", ".join(
            f"named_struct('_rank', {r}, '_rv', CAST({float(v)!r}D AS DOUBLE))"
            for r, v in resolved
        )
        rank_val_frames.append(
            spark.range(1)
            .select(F.expr(f"explode(array({lits}))").alias("s"))
            .select("s._rank", "s._rv")
        )
    rank_vals = rank_val_frames[0]
    for extra in rank_val_frames[1:]:
        rank_vals = rank_vals.unionByName(extra)

    probe_lits = ", ".join(
        f"named_struct('_pi', {pi}, '_lo', {lo_r}, '_hi', {hi_r}, "
        f"'_frac', {frac!r}D)"
        for pi, lo_r, hi_r, frac in parts
    )
    probes = (
        spark.range(1)
        .select(F.expr(f"explode(array({probe_lits}))").alias("s"))
        .select("s._pi", "s._lo", "s._hi", "s._frac")
    )
    cuts = (
        probes.join(
            F.broadcast(rank_vals).withColumnRenamed("_rv", "_vlo"),
            probes["_lo"] == F.col("_rank"),
        )
        .drop("_rank")
        .join(
            F.broadcast(rank_vals).withColumnRenamed("_rv", "_vhi"),
            F.col("_hi") == F.col("_rank"),
        )
        .select(
            "_pi",
            (
                F.col("_vlo") + F.col("_frac") * (F.col("_vhi") - F.col("_vlo"))
            ).alias("_cut"),
        )
    )
    cut_expr: Column = F.col("_cut")
    if round_to is not None:
        cut_expr = F.round(cut_expr, round_to)
    return cuts.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_pi"), cut_expr.alias("_c")))
        ).alias("_pairs")
    ).select(F.transform("_pairs", lambda s: s["_c"]).alias("qs"))
