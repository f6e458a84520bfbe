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
        FROM events
        -- a NULL-ts view can never satisfy ts <= probe
        WHERE event_type = 'view' AND ts IS NOT NULL
        GROUP BY 1, 2
    ), p AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    -- NULL-ts probes are matched explicitly to NOTHING: an unknown
    -- purchase time has no "latest view before it". (DuckDB's ASOF
    -- operator surprisingly MATCHES a NULL probe — fuzz_oracle nulls
    -- variant — so those rows are unioned in unmatched instead of
    -- relying on the operator's null behavior.)
    SELECT p.purchase_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
           v.view_id, epoch_us(v.ts) AS view_ts_us
    FROM (SELECT * FROM p WHERE ts IS NOT NULL) p
    ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    UNION ALL
    SELECT purchase_id, user_id, NULL, NULL, NULL
    FROM p WHERE ts IS NULL
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


@register(
    "j05_salted_supplier_revenue",
    oracle="""
    SELECT s_suppkey, s_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
    GROUP BY s_suppkey, s_name
    """,
)
def j05_salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact↔dim join via ``salted_join``: lineitem's
    l_suppkey keyspace is only |supplier| wide (100 at sf0.01), the
    canonical hot-key shape — a plain shuffle join would land every
    fact row for one supplier on one reducer. The salt spreads each
    supplier across 8 reducers; the supplier side replicates ×8.

    The salt provably cannot change the join's semantics (every
    (key, salt) pair on the fact side finds exactly one replicated dim
    row), which is what the oracle — a plain unsalted join — pins.

    Scale: at fixture SF Spark would broadcast supplier and no salting
    is needed; this query pins the MECHANICS for the 100 TB case where
    BOTH sides exceed the broadcast threshold and one key is hot (AQE
    skew splitting only rebalances sort-merge joins post-hoc; salting
    fixes the partition histogram before the shuffle). The final
    per-supplier aggregate is map-side-combined on (suppkey, name).
    """
    from sports_betting_data_pipeline_spark.operators.relational import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    fact = li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    ).withColumn("l_suppkey_j", F.col("l_suppkey"))
    joined = salted_join(
        fact,
        supplier.withColumnRenamed("s_suppkey", "l_suppkey_j"),
        on="l_suppkey_j",
        buckets=8,
    )
    return joined.groupBy(
        F.col("l_suppkey").alias("s_suppkey"), "s_name"
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "j06_bloom_prefilter_join",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def j06_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned selective semi-join: lineitem rows for this year's
    urgent orders (~2% of orders). The probe side first passes through
    ``bloom_prefilter`` — a dataframe-built, broadcast-probed Bloom
    filter over the urgent order keys — and only bloom-positive rows
    reach the exact semi-join that removes the false positives. The
    oracle is the plain IN-subquery: the composition is semantically
    invisible (no false negatives by construction), which is the whole
    point — and exactly what the hash check pins.

    Scale: the filter table is ≤num_words rows (KBs) however large the
    build side; at 100 TB the exact join's shuffle carries only the
    ~2% bloom-positive slice of the fact instead of all of it. The
    user-level form of runtime bloom-join pruning, usable where AQE's
    automatic variant doesn't reach (e.g. pre-aggregations before the
    join).
    """
    from sports_betting_data_pipeline_spark.operators.relational import (
        bloom_prefilter,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        )
        .select("o_orderkey")
    )
    candidates = bloom_prefilter(
        li, "l_orderkey", urgent, "o_orderkey", num_words=1024, num_hashes=3
    )
    return (
        candidates.join(
            urgent, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "j07_fuzzy_match_pairs",
    oracle="""
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           a.c_name AS a_name, b.c_name AS b_name
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) a
    JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) b
      ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def j07_fuzzy_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance ≤ 1) self-join — entity-resolution /
    near-identical-record detection. The oracle is the transparent
    all-pairs Levenshtein filter; the ENGINE never goes O(n²): each
    name explodes into its 9 one-digit-wildcard variants
    ('Customer#00000?001', …) and candidates equi-join on the variant
    key — two equal-length names at distance 1 differ in exactly one
    position, so they collide on exactly that wildcard (and identical
    positions elsewhere), making the blocking lossless for this name
    shape. The hash check against the all-pairs oracle IS the proof
    no pair was missed.

    Scale: n×9 narrow (variant, key, name) rows, one equi-join whose
    block sizes are the number of names sharing 8 of 9 digits (tiny,
    data-dependent), then exact-distance verification on candidates
    only — the same block-then-verify posture as MinHash-LSH (l08),
    applied to string keys. The %3 key filter keeps the ORACLE's n²
    tractable at verification SFs; the engine side scales past it
    unchanged.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.pmod("c_custkey", F.lit(3)) == 0)
        .select("c_custkey", "c_name")
    )
    # one-digit wildcard neighborhood over the 9-digit numeric suffix
    # (positions 10..18, 1-based) of the 18-char name
    variants = cust.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.substring("c_name", 1, 9 + i),
                        F.lit("?"),
                        F.substring("c_name", 11 + i, 8 - i),
                    )
                    for i in range(9)
                ]
            )
        ).alias("variant"),
    )
    a = variants.select(
        F.col("variant"),
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
    )
    b = variants.select(
        F.col("variant"),
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
    )
    return (
        a.join(b, "variant")
        .filter(F.col("a_key") < F.col("b_key"))
        .filter(F.levenshtein("a_name", "b_name") <= 1)
        .select("a_key", "b_key", "a_name", "b_name")
        .distinct()
    )
