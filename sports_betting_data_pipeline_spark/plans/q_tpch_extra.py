"""Classic decision-support plan shapes (TPC-H Q6/Q7/Q8/Q9/Q10/Q12/Q13/
Q14/Q15/Q16/Q17/Q18/Q19/Q20/Q21/Q22 analogs) over the driver's tables.

The reference has no analytics surface at all (SURVEY.md §2.7), but the
engine must expose the full one; these queries pin the plan shapes the
earlier catalog entries don't cover: a filter-only aggregate with total
scan pushdown, a conditional-ratio aggregate, a correlated scalar
subquery decorrelated into an aggregate join, HAVING on a grouped fact,
an OR-of-ANDs disjunctive predicate, and a window-max "top entity"
selection.

Scale posture per query is noted inline, as in q_relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sports_betting_data_pipeline_spark.io import load_table
from sports_betting_data_pipeline_spark.plans.catalog import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "q05_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q05_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: filter-only global aggregate, zero joins.

    Scale: the whole WHERE clause and the 4-column projection push into
    the parquet scan (min/max row-group pruning on l_shipdate); the
    shuffle carries one partial-agg row per task. This is the query
    whose cost should be pure scan bandwidth at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1998-01-01"))
        & (F.col("l_shipdate") < _ts("1999-01-01"))
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q06_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 6
           ) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1999-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-10-01 00:00:00'
    """,
)
def q06_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional-ratio aggregate over a dim join.

    Scale: part is a dimension (SF×200k rows) — broadcast it so the
    fact side never shuffles; the month filter prunes lineitem row
    groups before the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1999-09-01"))
            & (F.col("l_shipdate") < _ts("1999-10-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc_price), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q07_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
            SELECT 0.5 * avg(l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """,
)
def q07_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: correlated scalar subquery (per-part average),
    decorrelated into a per-part aggregate joined back to the fact.

    Scale: the per-part aggregate output is one row per part — dimension
    sized, so it broadcasts; lineitem is scanned twice but never
    shuffled. At 100 TB the scan dominates and AQE reuses the exchange
    if the two scans land in one stage graph.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part_avg = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#23")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(per_part_avg.withColumnRenamed("l_partkey", "t_partkey")),
            F.col("l_partkey") == F.col("t_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q08_large_volume_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum_qty, 2) AS sum_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q08_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: grouped fact + HAVING, joined back to its
    parents.

    Scale: the HAVING keeps ~1% of orders, so the post-aggregate side
    is small — AQE converts both parent joins to broadcast at runtime.
    The only full shuffle is the l_orderkey aggregation, which is
    map-side-combined.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@register(
    "q09_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q09_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-ANDs predicate spanning both join sides.

    Scale: Catalyst extracts the common l_quantity bounds (1..30) as a
    pushable conjunct on the scan, broadcasts part, and evaluates the
    residual disjunction post-join inside codegen — no nested-loop.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )

    def arm(brand: str, max_size: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )

    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            arm("Brand#12", 15, 1, 11)
            | arm("Brand#23", 25, 10, 20)
            | arm("Brand#34", 35, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q10_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q10_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: aggregate, then keep the row(s) attaining the
    global max — the view + uncorrelated scalar subquery form,
    expressed as an empty-frame window max so the aggregate is computed
    once.

    Scale: rev is supplier-sized (small); the window over the empty
    partition collapses to a single-partition pass over that small
    aggregate, then a broadcast join to supplier. Revenue is rounded
    BEFORE the max comparison on both sides so double ulps can't make
    the engines disagree on the argmax set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts("2000-01-01"))
            & (F.col("l_shipdate") < _ts("2000-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    best = rev.withColumn(
        "max_revenue", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_revenue"))
    return supplier.join(
        F.broadcast(best), F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", "total_revenue")


@register(
    "q11_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(max(c_acctbal), 2) AS c_acctbal,
           max(n_name) AS n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q11_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: 4-table join, grouped revenue, top-20.

    Scale: nation broadcasts; orders⋈lineitem is the one real shuffle
    (both sides filtered first — date range on orders, returnflag on
    lineitem, both pushed to the scans). The grouped fact side is the
    small side after aggregation, so IT broadcasts into customer —
    customer itself (SF×150k rows) never moves. The LIMIT is a
    TakeOrderedAndProject — no global sort. Tie-broken on c_custkey so
    the top-20 set is engine-independent.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.filter(
            (F.col("o_orderdate") >= _ts("2000-01-01"))
            & (F.col("o_orderdate") < _ts("2000-07-01"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        customer.join(F.broadcast(rev), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_shipping",
    oracle="""
    -- low = NOT high, spelled as the ELSE branch: "NOT IN" under a
    -- NULL priority is NULL -> ELSE 0, silently counting the row in
    -- NEITHER bucket; the engine's binary split counts it low
    -- (fuzz_oracle nulls variant)
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
      AND l_shipdate >= o_orderdate
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: fact-to-fact equi-join with a non-equi residual
    predicate (shipped on/after order date), then conditional pivot
    counts (CASE inside SUM) splitting one grouped pass by a dimension
    attribute of the OTHER table.

    Scale: the date range prunes lineitem at the scan; the only shuffle
    is the orderkey join (both sides partial-aggregated nothing — the
    residual l_shipdate >= o_orderdate must evaluate post-join). The
    conditional counts avoid a second pass or a pivot shuffle: one
    aggregation produces both columns.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("2000-01-01"))
            & (F.col("l_shipdate") < _ts("2001-01-01"))
        )
        .join(
            orders,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: distribution-of-a-distribution. LEFT OUTER join
    with an extra predicate INSIDE the join condition (so customers
    with no recent orders survive with count 0 — moving the date filter
    to a WHERE would silently turn the join inner), per-customer order
    counts, then a histogram of those counts.

    Scale: count(o_orderkey) over the outer join counts only matched
    rows (nulls don't count) — the exact Q13 semantics. Two shuffles by
    necessity: custkey for the per-customer count, c_count for the
    histogram; the second input is customer-sized, the histogram output
    is tiny. The date predicate on the orders side still pushes to its
    scan (it's inner-side-only, so pushdown is safe under the outer
    join).
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per_cust = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderdate") >= _ts("2001-01-01")),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
          )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: an uncorrelated scalar subquery (global average
    positive balance) gating the outer scan, plus a NOT EXISTS
    decorrelated into a LEFT ANTI join — above-average-balance
    customers with no orders in the last fixture year.

    Scale: the scalar average is a 1-row broadcast (the physical form
    of an uncorrelated scalar subquery — whitelisted in the plan sweep
    with the other 1-row scalars); the anti join shuffles customer
    against date-pruned orders keys only (2-col projection). Nothing
    here grows with lineitem.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= _ts("2001-01-01")).select(
        "o_custkey"
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = ps.l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
          )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: supplier diversity per part group with a NOT IN
    blacklist subquery. The fixture set has no partsupp table, so the
    observed (l_partkey, l_suppkey) pairs from lineitem stand in for it
    (same role: which suppliers can supply which parts).

    Scale: the distinct pair set is one map-side-combined shuffle on
    (partkey, suppkey) — far smaller than lineitem itself. The NOT IN
    becomes a broadcast LEFT ANTI join (supplier is a dimension; the
    null-semantics trap of NOT IN doesn't bite because s_suppkey is a
    key, never null). part is broadcast after its selective
    brand/type/size filter. The final count-distinct re-shuffles only
    the surviving pairs on the 3-col group key.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")

    pairs = li.distinct()
    blacklist = supplier.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    part_f = part.filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        pairs.join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part_f), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'red %'
              )
          AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 400.0
    )
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: chained IN subqueries — suppliers who moved a
    material volume (>400 units in fixture-1998) of 'red *' parts.
    Both INs decorrelate into semi-join shapes; the inner one carries a
    HAVING-guarded aggregate.

    Scale: part's name filter prunes to a small partkey set that
    BROADCASTS into lineitem's scan (a semi join that never shuffles
    the fact); the per-supplier aggregate output is supplier-sized, so
    the outer IN is a broadcast LEFT SEMI against the supplier
    dimension. lineitem is scanned once, shuffled only map-side-combined
    on l_suppkey (100 distinct keys).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    red_parts = part.filter(F.col("p_name").like("red %")).select("p_partkey")
    movers = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1998-01-01"))
            & (F.col("l_shipdate") < _ts("1999-01-01"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_total_qty"))
        .filter(F.col("_total_qty") > 400.0)
        .select("l_suppkey")
    )
    return supplier.join(
        F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    )


@register(
    "q21_sole_late_shipper",
    oracle="""
    WITH flagged AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, count(*) AS numwait
    FROM flagged f1
    JOIN supplier ON s_suppkey = f1.l_suppkey
    WHERE f1.late = 1
      AND EXISTS (
            SELECT 1 FROM flagged f2
            WHERE f2.l_orderkey = f1.l_orderkey
              AND f2.l_suppkey <> f1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM flagged f3
            WHERE f3.l_orderkey = f1.l_orderkey
              AND f3.l_suppkey <> f1.l_suppkey
              AND f3.late = 1
          )
    GROUP BY s_name
    """,
)
def q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: suppliers who were the ONLY late shipper
    (>90 days after the order date) on a multi-supplier order. The
    reference semantics are EXISTS + NOT EXISTS self-joins (the oracle
    states them literally); the Spark plan replaces both correlated
    subqueries with ONE per-order aggregate — over the deduped
    (order, supplier, late) grid, ``exists other supplier`` is
    ``count(*) > 1`` and ``not exists other late supplier`` is
    ``sum(late) = 1`` for a row with late=1.

    Scale: Q21 is notorious for tripling the lineitem scan (two
    correlated self-joins; a naive groupBy-then-join-back diamond
    still scans it twice because the branches' pushed filters diverge
    and defeat exchange reuse — pinned by
    ``test_q21_single_lineitem_scan``). The window form scans lineitem
    ONCE: the order-level counts are unbounded-frame window aggregates
    over the flagged grid, whose l_orderkey partitioning the grid's
    own shuffle already established. Supplier names arrive by
    broadcast at the very end.
    """
    from pyspark.sql.window import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        # a NULL supplier is INVISIBLE to the EXISTS/NOT-EXISTS
        # semantics this window rewrite replaces (f2.l_suppkey <>
        # f1.l_suppkey is never true against NULL), but it would
        # inflate the rewrite's per-order counts (fuzz_oracle nulls)
        .filter(F.col("l_suppkey").isNotNull())
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    is_late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    flagged = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(is_late).alias("late"))
    )
    w_order = Window.partitionBy("l_orderkey")
    return (
        flagged.withColumn("_n_sup", F.count(F.lit(1)).over(w_order))
        .withColumn("_n_late", F.sum("late").over(w_order))
        .filter(
            (F.col("late") == 1) & (F.col("_n_sup") > 1) & (F.col("_n_late") == 1)
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q17_nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q17_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bilateral trade volume between two nations by
    year — a 6-table star with a symmetric OR over the two nation
    roles.

    Scale: every dimension (customer, supplier, nation×2) broadcasts;
    lineitem⋈orders is the only fact-fact shuffle and the date filter
    prunes it first. The nation-pair OR cannot push below the joins
    (it spans two dimensions) but evaluates on broadcast-joined rows
    map-side. One final map-side-combined shuffle on the 3-col group.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1998-01-01"))
        & (F.col("l_shipdate") < _ts("2000-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q18_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one supplier nation's market share, by year,
    of STANDARD-part volume sold to AMERICA-region customers — an
    8-table star whose share numerator is a conditional aggregate over
    the same rows as the denominator (no second pass).

    Scale: the region filter prunes the customer side to 1/5 of
    nations BEFORE the fact join (filter pushed through the n1⋈region
    broadcast chain); part's type filter prunes 1/6 of the fact at the
    scan-adjacent join. All dims broadcast; the only big shuffle is
    lineitem⋈orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_in_america = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
                    F.col("r_regionkey") == F.col("n_regionkey"),
                ).select(F.col("n_nationkey").alias("cn_key"))
            ),
            F.col("cn_key") == F.col("c_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust_in_america), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(supp_nation), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q19_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(CAST(round(100 * (l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity), 0) AS BIGINT))
                 / 100.0, 2) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%cold%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q19_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: profit by supplier nation and year over a part
    name LIKE filter. The fixture set has no partsupp.ps_supplycost,
    so cost is proxied as half the part's retail price per unit — the
    plan shape (5-table star, LIKE-filtered part dim, two-level group)
    is what this query pins, per the engine-analog discipline of
    q16/q20.

    Scale: the LIKE '%cold%' filter cannot use row-group stats but
    runs on the part DIMENSION (SF×200k rows) before broadcasting —
    never on the fact. lineitem⋈orders is again the only big shuffle;
    profit arithmetic happens map-side on broadcast-joined rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%cold%")
    ).select("p_partkey", "p_retailprice")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    # Summed in exact integer CENTS: profit has catastrophic
    # cancellation (revenue minus cost), and double sums of ~300-row
    # groups drift across engines by more than the 2dp rounding can
    # absorb (3 of 175 groups mismatched when summing doubles). The
    # per-row double expression is bit-identical on both engines, so
    # rounding each ROW to a cent-integer first makes the SUM exact.
    profit_cents = F.round(
        100
        * (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
        ),
        0,
    ).cast("long")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.round(F.sum(profit_cents) / 100.0, 2).alias("sum_profit")
        )
    )


@register(
    "q14_min_cost_supplier",
    oracle="""
    WITH offers AS (
        SELECT p.p_partkey, s.s_suppkey, s.s_name,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents,
               sum(CAST(l.l_quantity AS BIGINT)) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
        GROUP BY 1, 2, 3
    ),
    ranked AS (
        SELECT p_partkey, s_suppkey, s_name, cents, qty,
               -- NULLS FIRST: engine contract (Spark ASC default); a
               -- NULL ratio (all-null price/qty offers) must rank the
               -- same in both engines (fuzz_oracle nulls variant)
               row_number() OVER (
                   PARTITION BY p_partkey
                   ORDER BY CAST(cents AS DOUBLE) / qty NULLS FIRST,
                            s_suppkey
               ) AS rn
        FROM offers
    )
    SELECT p_partkey,
           s_suppkey AS best_suppkey,
           s_name AS best_supplier,
           CAST(100 * cents // qty AS BIGINT) AS min_unit_price_e4
    FROM ranked WHERE rn = 1
    """,
)
def q14_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: the correlated MIN subquery ("the supplier
    whose price equals the minimum for that part in that region")
    DECORRELATED into a grouped offer table + per-part argmin — the
    rewrite Catalyst applies to correlated scalar subqueries, made
    explicit. Tiebreak on suppkey keeps the argmin deterministic.

    The offer price is the quantity-WEIGHTED unit price kept in
    integer space END TO END: cents and quantity sum as exact
    BIGINTs, the argmin orders by the (bit-identical) double ratio,
    and the REPORTED price is the floor-scaled integer
    ``100·cents div qty`` (unit price ×10⁴) — no decimal rounding
    anywhere, because rounding is where two engines legitimately
    disagree: avg-of-ratios failed at sf0.1 on ±1-ulp averages, and
    the exact-rational form failed on .00005 ties that Spark rounds
    half-up but DuckDB rounds half-even. Floor of an integer
    division has one answer.

    Scale: the part-type and region filters broadcast-prune the
    lineitem scan BEFORE the offer aggregate (dim filters reach the
    fact via broadcast hash joins); the argmin is WindowGroupLimit
    over the small offer table, never over the fact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    euro_supp = (
        supplier.join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name")
    )
    offers = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(euro_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("cents"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("cents").cast("double") / F.col("qty"), "s_suppkey"
    )
    return (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            F.col("s_suppkey").alias("best_suppkey"),
            F.col("s_name").alias("best_supplier"),
            F.expr("100 * cents div qty").alias("min_unit_price_e4"),
        )
    )
