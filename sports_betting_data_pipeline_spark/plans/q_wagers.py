"""Wager-lifecycle catalog queries (SURVEY.md §2.2 K2-K4, §2.3 F6/F7,
§2.4 J3, §2.1 S7): the reference's market-maker bot loop re-expressed
as deterministic, oracle-checkable DataFrame transforms."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sports_betting_data_pipeline_spark.functions.odds import drawn_odds_sql
from sports_betting_data_pipeline_spark.io import load_table
from sports_betting_data_pipeline_spark.operators.wagers import (
    apply_cancellations,
    balances,
    batch_cancel_pick,
    place_wagers,
)
from sports_betting_data_pipeline_spark.plans.catalog import register

# Shared oracle CTE: the wagers produced by place_wagers(events).
_WAGERS_CTE = f"""
    SELECT md5('wager-' || CAST(event_id AS VARCHAR)) AS external_id,
           'line-' || CAST(user_id AS VARCHAR) || '-'
                   || CAST(event_id % 5 AS VARCHAR) AS line_id,
           user_id,
           CAST({drawn_odds_sql('event_id')} AS BIGINT) AS odds,
           round(coalesce(value, 0.0), 2) AS stake,
           event_id
    FROM events WHERE event_id % 10 < 3
"""


@register(
    "wg01_place_wagers",
    oracle=f"WITH w AS ({_WAGERS_CTE}) SELECT * FROM w",
)
def wg01_place_wagers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K3 payload build: ~30% deterministic event sample, md5
    external id (uuid1 analog), keyed ladder draw, rounded stake."""
    events = load_table(spark, sf_dir, "events")
    return place_wagers(events).withColumn("odds", F.col("odds").cast("long"))


@register(
    "wg02_cancel_anti_join",
    oracle=f"""
    WITH w AS ({_WAGERS_CTE})
    SELECT external_id, user_id, odds, stake FROM w
    WHERE external_id NOT IN (
        SELECT external_id FROM w WHERE event_id % 2 = 0
    )
    """,
)
def wg02_cancel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 cancel-all shape: the wagers state anti-joined against a
    cancel set (even event ids); unknown cancel ids are silently
    no-ops, matching the reference's 404 tolerance
    (mm_calls.py:318-320). The oracle expresses the same delete as
    NOT IN."""
    events = load_table(spark, sf_dir, "events")
    wagers = place_wagers(events)
    cancels = wagers.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0)
    return apply_cancellations(wagers, cancels).select(
        "external_id", "user_id", F.col("odds").cast("long").alias("odds"), "stake"
    )


@register(
    "wg03_batch_cancel_topk",
    oracle=f"""
    WITH w AS ({_WAGERS_CTE}),
    r AS (
        SELECT external_id, user_id, line_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY external_id
               ) AS rn
        FROM w
    )
    SELECT external_id, user_id, line_id FROM r WHERE rn <= 4
    """,
)
def wg03_batch_cancel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/K4: the batch-cancel pick of k<=4 wagers per user
    (random.choices(k=min(4,n)), mm_calls.py:333) with the random
    order replaced by the md5-permutation order — top-k-per-group via
    row_number, partial top-k applied before the shuffle."""
    events = load_table(spark, sf_dir, "events")
    return batch_cancel_pick(place_wagers(events), k=4).select(
        "external_id", "user_id", "line_id"
    )


@register(
    "wg04_balances",
    oracle=f"""
    WITH w AS ({_WAGERS_CTE})
    SELECT user_id, round(1000.0 - sum(stake), 2) AS balance,
           CAST(count(*) AS BIGINT) AS n_open
    FROM w GROUP BY 1
    """,
)
def wg04_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/A3: per-user balance as an aggregate over open wagers
    (opening bankroll minus staked), replacing the REST balance
    call."""
    events = load_table(spark, sf_dir, "events")
    return balances(place_wagers(events), opening=1000.0)


@register(
    "pl06_bot_tick",
    oracle=f"""
    WITH w AS (
        SELECT md5('wager-' || CAST(event_id AS VARCHAR)) AS external_id,
               user_id,
               CAST({drawn_odds_sql('event_id')} AS BIGINT) AS odds,
               round(coalesce(value, 0.0), 2) AS stake
        FROM events
        WHERE event_id % 10 < 3
          AND event_type IN ('purchase', 'click')
    ),
    enr AS (
        SELECT w.*, c.c_mktsegment
        FROM w JOIN customer c ON c.c_custkey = w.user_id
    ),
    per_user AS (
        SELECT c_mktsegment, user_id,
               sum(stake) AS st, count(*) AS n, sum(odds) AS so
        FROM enr GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(sum(n) AS BIGINT) AS n_wagers,
           round(sum(st), 2) AS total_stake,
           CAST(sum(so) AS BIGINT) AS sum_odds,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (st > 1000.003) AS BIGINT) AS n_overdrawn
    FROM per_user
    GROUP BY 1
    """,
)
def pl06_bot_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE main-loop tick as ONE dataflow — the
    composition statement for the bot surface: interesting-market
    whitelist (F1) → ~30% candidate sample + ladder-drawn odds + md5
    external ids (K2/K3, the place_wagers operator) → account
    enrichment join (J1) → per-user exposure (S7's balance input) →
    per-segment book summary with an over-exposure count (F8's guard
    as data, not an assertion). Every stage is an operator proven
    individually (f01, wg01, j01, wg04); this pins that they compose.

    The over-exposure threshold is 1000.003 — deliberately NOT a
    multiple of 0.01: per-user stake totals are exact 2dp decimals,
    so no achievable total can sit at the threshold and the strict
    comparison can never straddle engine summation order (the q14
    tie lesson applied to predicates).

    Scale: whitelist + sample are scan-side predicates; the dims
    broadcast; the only shuffles are the two nested aggregates, both
    map-side-combined and keyed on (segment, user) then segment.
    """
    events = load_table(spark, sf_dir, "events")
    from sports_betting_data_pipeline_spark.operators.relational import (
        enrich_join,
        whitelist_filter,
    )

    interesting = whitelist_filter(events, "event_type", ["purchase", "click"])
    wagers = place_wagers(interesting)
    accounts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enr = enrich_join(wagers, accounts, "user_id")
    per_user = enr.groupBy("c_mktsegment", "user_id").agg(
        F.sum("stake").alias("st"),
        F.count(F.lit(1)).alias("n"),
        F.sum("odds").alias("so"),
    )
    return per_user.groupBy("c_mktsegment").agg(
        F.sum("n").alias("n_wagers"),
        F.round(F.sum("st"), 2).alias("total_stake"),
        F.sum("so").alias("sum_odds"),
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("st") > 1000.003, 1)).alias("n_overdrawn"),
    )
