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
