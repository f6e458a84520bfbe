"""Odds-ladder catalog queries (SURVEY.md §2.6 C8, §2.4 J4): the
ladder kit exercised end-to-end, with the ladder literal shared
between the Spark plan and the DuckDB oracle from one Python source
(functions/odds.py regenerates src/constants.py's table from its step
grid)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sports_betting_data_pipeline_spark.functions.odds import (
    decimal_odds,
    drawn_odds,
    drawn_odds_sql,
    implied_probability,
    ladder_sql_list,
    snap_to_ladder,
)
from sports_betting_data_pipeline_spark.io import load_table
from sports_betting_data_pipeline_spark.plans.catalog import register

_RAW_ODDS = "(event_id * 7919) % 20001 - 10000"


@register(
    "o01_ladder_snap",
    oracle=f"""
    WITH raw AS (
        -- rid: a synthetic per-ROW identity — every source row snaps,
        -- so a duplicated event_id must yield two counted snaps, not
        -- one argmin partition (fuzz_oracle dup variant)
        SELECT row_number() OVER () AS rid, {_RAW_ODDS} AS r FROM events
    ), best AS (
        SELECT raw.rid, l.rung,
               row_number() OVER (
                   PARTITION BY raw.rid ORDER BY abs(l.rung - raw.r), l.rung
               ) AS rn
        FROM raw CROSS JOIN (SELECT unnest({ladder_sql_list()}) AS rung) l
    )
    SELECT CAST(rung AS BIGINT) AS snapped, CAST(count(*) AS BIGINT) AS n
    FROM best WHERE rn = 1 GROUP BY 1
    """,
)
def o01_ladder_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 validation variant: snap synthetic raw odds in [-10000,
    10000] to the nearest ladder rung (ties to the smaller rung) and
    histogram the rungs. Spark side is one aggregate fold over the
    291-rung literal per row — no join, no shuffle until the final
    small groupBy; the oracle does the argmin via cross join +
    row_number."""
    events = load_table(spark, sf_dir, "events")
    raw = events.select(
        (F.pmod(F.col("event_id") * 7919, F.lit(20001)) - 10000).alias("r")
    )
    # Snap AFTER aggregating to distinct raw values: the 291-rung fold
    # is interpreted (higher-order aggregate has no codegen), so run it
    # once per distinct value (<=20001) instead of once per row.
    per_raw = raw.groupBy("r").agg(F.count(F.lit(1)).alias("n_raw"))
    return (
        per_raw.select(snap_to_ladder(F.col("r")).alias("snapped"), "n_raw")
        .groupBy("snapped")
        .agg(F.sum("n_raw").alias("n"))
    )


@register(
    "o02_drawn_odds_histogram",
    oracle=f"""
    SELECT CAST({drawn_odds_sql('event_id')} AS BIGINT) AS odds,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def o02_drawn_odds_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: the reference's random ladder draw + 50% sign flip +
    -100→100 remap (mm_calls.py:410-418), keyed on event_id so both
    engines reproduce it bit-for-bit."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(drawn_odds(F.col("event_id")).cast("long").alias("odds"))
        .groupBy("odds")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "o03_implied_probability",
    oracle=f"""
    WITH d AS (
        SELECT event_type, {drawn_odds_sql('event_id')} AS odds FROM events
    )
    SELECT event_type,
           round(avg(CASE WHEN odds > 0 THEN 100.0 / (odds + 100.0)
                          ELSE -odds / (-odds + 100.0) END), 6) AS avg_prob,
           round(avg(CASE WHEN odds > 0 THEN 1.0 + odds / 100.0
                          ELSE 1.0 + 100.0 / (-odds) END), 6) AS avg_decimal,
           CAST(count(*) AS BIGINT) AS n
    FROM d GROUP BY 1
    """,
)
def o03_implied_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """American odds → implied probability and decimal odds, averaged
    per event_type (the odds math the reference leaves implicit in its
    ladder semantics)."""
    events = load_table(spark, sf_dir, "events")
    odds = events.select(
        "event_type", drawn_odds(F.col("event_id")).alias("odds")
    )
    return odds.groupBy("event_type").agg(
        F.round(F.avg(implied_probability(F.col("odds"))), 6).alias("avg_prob"),
        F.round(F.avg(decimal_odds(F.col("odds"))), 6).alias("avg_decimal"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "o04_kelly_stakes",
    oracle=f"""
    WITH d AS (
        SELECT event_id, {drawn_odds_sql('event_id')} AS odds
        FROM events WHERE event_id % 20 = 0
    ),
    priced AS (
        SELECT event_id, odds,
               CASE WHEN odds > 0 THEN 100.0 / (odds + 100.0)
                    ELSE -odds / (-odds + 100.0) END AS p_imp,
               CASE WHEN odds > 0 THEN odds / 100.0
                    ELSE 100.0 / (-odds) END AS b
        FROM d
    ),
    kelly AS (
        SELECT event_id, odds, b,
               least(p_imp * 1.05, 0.99) AS p_true,
               (b * least(p_imp * 1.05, 0.99)
                - (1 - least(p_imp * 1.05, 0.99))) / b AS f
        FROM priced
    )
    SELECT event_id,
           CAST(odds AS BIGINT) AS odds,
           round(f, 6) AS kelly_fraction,
           round(greatest(f, 0.0) * 1000.0, 2) AS stake
    FROM kelly
    """,
)
def o04_kelly_stakes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kelly-criterion bet sizing over the drawn odds ladder: implied
    probability from the American odds, a deterministic modeled edge
    (5%% over implied, capped), and the Kelly fraction
    f = (b·p − q)/b sized against a 1000-unit bankroll — negative-
    edge lines stake zero. The stake-sizing math the reference's
    flat-stake loop (mm_calls.py:241-247) would grow into; pure
    map-side arithmetic on the same ladder draw the wager family
    uses, so the whole pricing→sizing path is oracle-checked.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.pmod("event_id", F.lit(20)) == 0
    )
    # LAYERED selects so each derived expression references the PREVIOUS
    # alias instead of inlining its whole Column tree: PySpark duplicates
    # the subtree per reference, and every DataFrame op eagerly ANALYZES
    # the full plan JVM-side — with f/p_true/p_imp inlined, the 291-rung
    # ladder array appeared ~6x and one .select() cost 0.7 s of driver
    # time (SCALE.md r6). Catalyst's CollapseProject re-merges the
    # layers at optimization, so the executed plan is identical.
    odds = drawn_odds(F.col("event_id"))
    priced = events.select("event_id", odds.alias("_odds")).select(
        "event_id",
        "_odds",
        F.when(F.col("_odds") > 0, 100.0 / (F.col("_odds") + 100.0))
        .otherwise(-F.col("_odds") / (-F.col("_odds") + 100.0))
        .alias("_p_imp"),
        F.when(F.col("_odds") > 0, F.col("_odds") / 100.0)
        .otherwise(100.0 / (-F.col("_odds")))
        .alias("_b"),
    )
    kelly = priced.select(
        "event_id",
        "_odds",
        "_b",
        F.least(F.col("_p_imp") * 1.05, F.lit(0.99)).alias("_p_true"),
    ).select(
        "event_id",
        "_odds",
        (
            (F.col("_b") * F.col("_p_true") - (1 - F.col("_p_true"))) / F.col("_b")
        ).alias("_f"),
    )
    return kelly.select(
        "event_id",
        F.col("_odds").cast("long").alias("odds"),
        F.round(F.col("_f"), 6).alias("kelly_fraction"),
        F.round(F.greatest(F.col("_f"), F.lit(0.0)) * 1000.0, 2).alias("stake"),
    )


@register(
    "o05_devig_two_way",
    oracle=f"""
    WITH mkt AS (
        SELECT event_id,
               {drawn_odds_sql('event_id')} AS odds_a,
               {drawn_odds_sql('(event_id + 7919)')} AS odds_b
        FROM events WHERE event_id % 20 = 0
    ),
    probs AS (
        SELECT event_id, odds_a, odds_b,
               CASE WHEN odds_a > 0 THEN 100.0 / (odds_a + 100.0)
                    ELSE -odds_a / (-odds_a + 100.0) END AS pa,
               CASE WHEN odds_b > 0 THEN 100.0 / (odds_b + 100.0)
                    ELSE -odds_b / (-odds_b + 100.0) END AS pb
        FROM mkt
    )
    SELECT event_id,
           CAST(odds_a AS BIGINT) AS odds_a,
           CAST(odds_b AS BIGINT) AS odds_b,
           round(pa + pb - 1.0, 6) AS overround,
           round(pa / (pa + pb), 6) AS fair_prob_a
    FROM probs
    """,
)
def o05_devig_two_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way market DE-VIG: a two-outcome market per event (both
    sides drawn from the same keyed ladder, salted draw for the
    opposite side), the bookmaker's overround (implied probabilities
    summing past 1 — the margin), and the fair outcome probability
    after proportional vig removal. The pricing-analysis step between
    o03's implied probabilities and o04's Kelly sizing: Kelly on
    UN-devigged probabilities systematically overbets.

    Scale: pure map-side arithmetic on the ladder draw — the whole
    pricing chain (draw → implied → devig → size) never shuffles.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.pmod("event_id", F.lit(20)) == 0
    )

    # layered like o04: each ladder draw appears ONCE in the plan
    def implied(name: str):
        o = F.col(name)
        return F.when(o > 0, 100.0 / (o + 100.0)).otherwise(-o / (-o + 100.0))

    mkt = events.select(
        "event_id",
        drawn_odds(F.col("event_id")).alias("_oa"),
        drawn_odds(F.col("event_id") + 7919).alias("_ob"),
    )
    probs = mkt.select(
        "event_id",
        "_oa",
        "_ob",
        implied("_oa").alias("_pa"),
        implied("_ob").alias("_pb"),
    )
    return probs.select(
        "event_id",
        F.col("_oa").cast("long").alias("odds_a"),
        F.col("_ob").cast("long").alias("odds_b"),
        F.round(F.col("_pa") + F.col("_pb") - 1.0, 6).alias("overround"),
        F.round(F.col("_pa") / (F.col("_pa") + F.col("_pb")), 6).alias("fair_prob_a"),
    )
