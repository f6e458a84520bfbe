"""Flatten/unnest catalog queries (SURVEY.md §2.5 P1-P5).

The betting-tree flatten itself is a rows-only query (its input is the
deterministic in-code fixture tree; exact cell values are pinned by the
golden test). The explode/union MECHANICS are additionally
oracle-checked through nest→unnest roundtrips over the relational
fixtures, where DuckDB can verify every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sports_betting_data_pipeline_spark.fixtures import betting_tree_df
from sports_betting_data_pipeline_spark.io import load_table
from sports_betting_data_pipeline_spark.operators.flatten import flatten_sheet
from sports_betting_data_pipeline_spark.plans.catalog import register


@register("p01_flatten_sheet")
def p01_flatten_sheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4 centerpiece: nested betting tree → 25-col sheet table.

    Rows-only driver check (the tree is not a DuckDB view); cell-exact
    values incl. both fidelity modes are pinned in
    tests/test_flatten.py.
    """
    return flatten_sheet(betting_tree_df(spark), fidelity=False)


@register(
    "p02_nest_unnest_roundtrip",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           l.l_linenumber,
           round(l.l_quantity, 2) AS qty,
           round(l.l_extendedprice, 2) AS price
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 20 = 0
    """,
)
def p02_nest_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 mechanics, oracle-checked: build the nested shape
    (order → array<struct<lineitem>>) with collect_list(struct(...)),
    then explode it back flat. The oracle is the equivalent flat join —
    the roundtrip must be lossless.

    Scale: the nest groupBy shuffles on o_orderkey once; the explode is
    shuffle-free. This is exactly the markets-array attach J1 performs
    (mm_calls.py:100-105) followed by the main.py flatten.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.pmod(F.col("o_orderkey"), F.lit(20)) == 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    nested = orders.join(
        li.groupBy("l_orderkey").agg(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity", "l_extendedprice")
            ).alias("items")
        ),
        on=[orders.o_orderkey == F.col("l_orderkey")],
        how="inner",
    )
    return (
        nested.select("o_orderkey", "o_orderstatus", F.explode("items").alias("it"))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("it.l_linenumber").alias("l_linenumber"),
            F.round("it.l_quantity", 2).alias("qty"),
            F.round("it.l_extendedprice", 2).alias("price"),
        )
    )


@register(
    "p03_two_branch_union",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R' THEN 'NA'
                ELSE CAST(l_quantity AS VARCHAR) END AS qty_str,
           CASE WHEN l_returnflag = 'R' THEN 'NA'
                ELSE l_linestatus END AS status_str,
           l_returnflag
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def p03_two_branch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 mechanics, oracle-checked: split rows into two branches on
    a predicate, project one branch with literal 'NA' columns (the
    reference's branch-B literals, main.py:161-165), and unionByName —
    the oracle expresses the same as CASE WHEN."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.pmod(F.col("l_orderkey"), F.lit(50)) == 0
    )
    base = li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_linestatus")
    branch_a = base.filter(F.col("l_returnflag") != "R").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_linestatus").alias("status_str"),
        "l_returnflag",
    )
    branch_b = base.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        "l_linenumber",
        F.lit("NA").alias("qty_str"),
        F.lit("NA").alias("status_str"),
        "l_returnflag",
    )
    return branch_a.unionByName(branch_b)


@register(
    "p04_struct_access",
    oracle="""
    SELECT c_custkey,
           c_name            AS contact_name,
           upper(c_mktsegment) AS segment_uc,
           round(c_acctbal, 2) AS balance
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
)
def p04_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: nested struct field access — pack columns into a struct and
    read them back via getField (competitors[i].field shape,
    main.py:97-110)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.pmod(F.col("c_custkey"), F.lit(10)) == 0
    )
    packed = cust.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("balance"),
        ).alias("contact"),
    )
    return packed.select(
        "c_custkey",
        F.col("contact").getField("name").alias("contact_name"),
        F.upper(F.col("contact").getField("segment")).alias("segment_uc"),
        F.round(F.col("contact").getField("balance"), 2).alias("balance"),
    )
