"""Temporal-join catalog queries: as-of join and banded range join
(SURVEY.md §2.4 "Not present in the reference" — the engine-native
additions a betting analytics stack needs).

DuckDB oracles use its native ASOF JOIN / inequality joins; the Spark
side uses the shuffle-friendly compositions in operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sports_betting_data_pipeline_spark.io import load_table
from sports_betting_data_pipeline_spark.operators.asof import (
    asof_join,
    range_join_count,
)
from sports_betting_data_pipeline_spark.plans.catalog import register


@register(
    "aj01_asof_last_view_before_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, max(event_id) AS view_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), p AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
           v.view_id, epoch_us(v.ts) AS view_ts_us
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def aj01_asof_last_view_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """As-of join: each purchase matched to the user's latest view at
    or before it (the "odds at wager time" shape). Views are
    pre-deduped to one per (user, ts) so the match is deterministic;
    one shuffle on user_id, no inequality-join nested loop."""
    events = load_table(spark, sf_dir, "events")
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return asof_join(
        purchases, views, key="user_id", ts="ts", payload_cols=["view_id"]
    ).select(
        "purchase_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("asof.view_id").alias("view_id"),
        F.unix_micros("asof.ts").alias("view_ts_us"),
    )


@register(
    "rj01_views_in_error_window",
    oracle="""
    WITH e AS (
        SELECT event_id AS error_id, user_id, ts AS w_start,
               ts + INTERVAL 1 HOUR AS w_end
        FROM events WHERE event_type = 'error'
    ), v AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT e.error_id, e.user_id, CAST(count(v.ts) AS BIGINT) AS n_views
    FROM e LEFT JOIN v
      ON v.user_id = e.user_id AND v.ts >= e.w_start AND v.ts < e.w_end
    GROUP BY 1, 2
    """,
)
def rj01_views_in_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: views falling in the hour after each error,
    per user. Buckets both sides to 1h epochs so the plan is a hash
    equi-join + exact filter instead of a nested-loop inequality
    join."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")
    return range_join_count(
        errors,
        views,
        key="user_id",
        interval_id="error_id",
        start="w_start",
        end="w_end",
        point_ts="ts",
        bucket_seconds=3600,
        count_alias="n_views",
    )
