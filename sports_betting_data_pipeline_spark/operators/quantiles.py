"""Distributed EXACT quantiles without a single-node value buffer.

Spark's builtin ``percentile`` is exact but buffers every value into
one final merge (an OpenHashMap funneled through a single reducer) —
the one shape that cannot survive 100 TB. ``approx_percentile`` scales
but is a sketch. This operator provides the third point on the curve:
exact interpolated quantiles computed the distributed way —

1. range-partition the column (Spark samples split points, so
   partitions are balanced and value-ordered across partitions);
2. rank locally per partition (a window keyed on the physical
   partition id — each window group IS one partition, so no data
   crosses the wire to sort);
3. turn local ranks into global ranks by adding per-partition offsets
   (a 32-row cumsum, broadcast back);
4. broadcast-join the ~2×|probs| needed ranks against the ranked rows
   and interpolate ``v_lo + frac·(v_hi − v_lo)`` — the same formula
   ``percentile``/DuckDB ``quantile_cont`` use (``pos = p·(n−1)``).

Everything stays in the DataFrame plan: no driver collect, no
single-partition pass over data rows; the only single-partition work
is the |partitions|-row offset cumsum.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantile_cuts(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    num_partitions: int = 32,
    round_to: int | None = 4,
) -> DataFrame:
    """Return a 1-row DataFrame ``[qs: array<double>]`` of exact
    interpolated quantiles of ``df[col]`` at ``probs`` (ascending).

    Equivalent to ``F.percentile(col, probs)`` / DuckDB
    ``quantile_cont(col, probs)`` but scales: the value set is never
    buffered on one node. ``round_to`` rounds each cut (engine-portable
    boundaries for downstream bucketing); pass None to skip.
    """
    # Local ranks WITHOUT a window: a window keyed on
    # spark_partition_id() demands hashpartitioning(_pid), which
    # Catalyst cannot know is already satisfied by physical layout —
    # so the "local" rank used to cost a full extra shuffle of every
    # value. Instead sort WITHIN the range partitions and read the
    # local row number out of monotonically_increasing_id (documented
    # layout: partition_index << 33 | row_number_in_partition). Ties
    # in v may order arbitrarily between equal values, but every rank
    # inside a tie run carries the same v, so the interpolated cuts
    # are unaffected. The frame is cached because three branches
    # (per-partition counts, the global-rank join, the n scalar) read
    # it — the session-local stand-in for the sorted staging table a
    # production exact-quantile pass would persist; at 100 TB the
    # cache spills to disk, which is still one sort instead of three.
    ranked = (
        df.select(F.col(col).alias("v"))
        .repartitionByRange(num_partitions, F.col("v"))
        .sortWithinPartitions("v")
        .select(
            "v",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id()
            .bitwiseAND(F.lit((1 << 33) - 1))
            .alias("_rn"),
        )
        .cache()
    )

    counts = ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_pid",
        (F.sum("_cnt").over(w_off) - F.col("_cnt")).alias("_offset"),
        F.sum("_cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )

    globally = ranked.join(F.broadcast(offsets), "_pid").select(
        "v", (F.col("_rn") + F.col("_offset")).alias("_grank"), "_n"
    )

    # The ranks each quantile needs: pos = p·(n−1); lo/hi bracket it.
    n_row = offsets.select(F.max("_n").alias("_n"))
    probs_arr = F.array(*[F.lit(float(p)) for p in probs])
    needed = (
        n_row.select(
            F.posexplode(probs_arr).alias("_pi", "_p"), "_n"
        )
        .select(
            "_pi",
            (F.col("_p") * (F.col("_n") - 1)).alias("_pos"),
        )
        .select(
            "_pi",
            F.floor("_pos").cast("long").alias("_lo"),
            F.ceil("_pos").cast("long").alias("_hi"),
            (F.col("_pos") - F.floor("_pos")).alias("_frac"),
        )
    )
    # Long-format (rank, role) probe set: ≤ 2 rows per prob.
    probes = needed.select(
        "_pi", "_frac", F.col("_lo").alias("_rank"), F.lit("lo").alias("_role")
    ).unionByName(
        needed.select(
            "_pi", "_frac", F.col("_hi").alias("_rank"), F.lit("hi").alias("_role")
        )
    )
    hits = globally.join(
        F.broadcast(probes), F.col("_grank") == F.col("_rank")
    )
    cuts = (
        hits.groupBy("_pi", "_frac")
        .agg(
            F.max(F.when(F.col("_role") == "lo", F.col("v"))).alias("_vlo"),
            F.max(F.when(F.col("_role") == "hi", F.col("v"))).alias("_vhi"),
        )
        .select(
            "_pi",
            (
                F.col("_vlo")
                + F.col("_frac") * (F.col("_vhi") - F.col("_vlo"))
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
