"""Graph-analytics catalog queries.

The reference has no graph surface; the engine needs one because the
LLM-data side already materializes graphs (near-dup similarity edges →
connected components, l21/l22) and a trade-flow/entity-importance query
is a standard analytics ask. PageRank here is the template for ANY
fixed-point iteration on Spark: keep the edge table partitioned once,
loop the rank join-aggregate a fixed number of times in the DRIVER
(building one logical plan), and let AQE reuse the edge exchange.

Oracle strategy: power iteration is not expressible as a recursive SQL
aggregate, but a FIXED iteration count unrolls into a linear CTE chain
— p1..p5 each reference the previous level — which DuckDB evaluates
exactly. That keeps the query hash-checked rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sports_betting_data_pipeline_spark.io import load_table
from sports_betting_data_pipeline_spark.plans.catalog import register

_D = 0.85  # damping; the template interpolates it so tuning it retunes
_ITERS = 5  # both engine and oracle (they execute the same text)

# One power-iteration level, shared VERBATIM between the engine and
# the oracle (only the edge/nation relation names differ): the engine
# executes the same unrolled fixpoint SQL Catalyst-side over its
# cached edge view, so parity is textual, not re-derived. %g renders
# 1 - _D as the exact short literal ("0.15") on both sides.
_PR_STEP = f"""
    SELECT n.n_nationkey,
           {1 - _D:g} / 25 + {_D:g} * coalesce(sum(p.pr * e.w), 0.0) AS pr
    FROM nodes n
    LEFT JOIN {{edges}} e ON e.dst = n.n_nationkey
    LEFT JOIN {{prev}} p ON p.n_nationkey = e.src
    GROUP BY n.n_nationkey
"""


def _pr_unrolled(edges_rel: str, nation_rel: str) -> str:
    """nodes/p0..pN CTE chain + final name join over the given edge /
    nation relations (a subquery or view name)."""
    return (
        f"""
    nodes AS (SELECT n_nationkey FROM {nation_rel}),
    p0 AS (SELECT n_nationkey, 1.0 / 25 AS pr FROM nodes),
    """
        + ",\n".join(
            f"p{i} AS ({_PR_STEP.format(edges=edges_rel, prev=f'p{i - 1}')})"
            for i in range(1, _ITERS + 1)
        )
        + f"""
    SELECT p.n_nationkey, n.n_name,
           round(p.pr, 6) AS pagerank
    FROM p{_ITERS} p JOIN {nation_rel} n ON n.n_nationkey = p.n_nationkey
    """
    )


_ORACLE = (
    """
    WITH flows AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT src, dst,
               rev / sum(rev) OVER (PARTITION BY src) AS w
        FROM flows
    ),
    """
    + _pr_unrolled("edges", "nation")
)


def _trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_nation, dst_nation, rev) trade-flow edge table: one pass
    over lineitem. orders↔lineitem is fact-fact (AQE picks the
    strategy; at 100 TB both sides bucket on the orderkey);
    customer/supplier are true dims and broadcast explicitly."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )
    )


@register("g01_nation_pagerank", oracle=_ORACLE)
def g01_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (d=0.85, 5 iterations) over the international
    trade-flow graph: nations are nodes, customer-nation → supplier-
    nation revenue flows are edges with per-source-normalized weights.
    Which nation's supply base does the global order flow concentrate
    on?

    Fixed-point iterations run in the driver loop but stay fully
    declarative — each step is a broadcast join of the 25-row rank
    vector against the (≤625-row) edge table plus a left join back to
    the node list (so sink-only nations keep the teleport mass).
    Dangling mass (a nation that never buys) is dropped, not
    redistributed — the same convention on both engines.

    Scale: the expensive part is ONE pass over lineitem to build the
    aggregated edge table (map-side-combined shuffle to |src|×|dst| ≤
    625 rows); the 5 iterations then touch only |V|+|E| rows with
    broadcast joins — no lineitem re-scan because the edge table is
    cached. At a 100 TB edge scale you'd swap the broadcast rank join
    for a partitioned join + checkpoint every few iterations (the
    l21/l22 Pregel loop already demonstrates that shape).
    """
    from sports_betting_data_pipeline_spark.session import latency_regime

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation.createOrReplaceTempView("g01_nation")
    flows = _trade_flows(spark, sf_dir)
    from pyspark.sql.window import Window

    edges = flows.select(
        "src",
        "dst",
        (F.col("rev") / F.sum("rev").over(Window.partitionBy("src"))).alias("w"),
    ).cache()
    # Fill the edge cache BEFORE entering the latency regime: the
    # lineitem join-aggregate wants full session parallelism + AQE.
    # The count doubles as the loop's size bound (≤ |V|² = 625 here).
    n_edges = edges.count()
    edges.createOrReplaceTempView("g01_edges")

    # The 5 unrolled iteration levels execute as ONE server-parsed SQL
    # statement — the SAME text the oracle runs (shared _pr_unrolled
    # template) over the cached edge view. vs the Column-API loop this
    # kills ~0.4 s of per-iteration Py4J plan construction AND lets
    # Catalyst plan the whole chain at once (measured action 0.98 →
    # 0.43 s at sf0.1); the ~11 broadcast-size stages then run, and
    # eagerly materialize (25 rows), inside the latency regime.
    with latency_regime(spark, n_edges):
        out = spark.sql("WITH " + _pr_unrolled("g01_edges", "g01_nation"))
        return out.localCheckpoint(eager=True)


_FLOWS_SQL = """
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
"""


@register(
    "g02_khop_reachability",
    oracle=f"""
    WITH flows AS ({_FLOWS_SQL}),
    ranked AS (
        SELECT src, dst,
               row_number() OVER (
                   PARTITION BY src ORDER BY rev DESC, dst
               ) AS rn
        FROM flows
        WHERE src <> dst
    ),
    edges AS (SELECT src, dst FROM ranked WHERE rn <= 3),
    paths AS (
        SELECT 0 AS node, 0 AS hop
        UNION ALL
        SELECT dst, 1 FROM edges WHERE src = 0
        UNION ALL
        SELECT e2.dst, 2
        FROM edges e1 JOIN edges e2 ON e2.src = e1.dst
        WHERE e1.src = 0
        UNION ALL
        SELECT e3.dst, 3
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst
        JOIN edges e3 ON e3.src = e2.dst
        WHERE e1.src = 0
    )
    SELECT p.node, n.n_name, CAST(min(p.hop) AS BIGINT) AS hop
    FROM paths p JOIN nation n ON n.n_nationkey = p.node
    GROUP BY 1, 2
    """,
)
def g02_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first k-hop reachability (≤3 hops) from nation 0 over
    the SPARSIFIED trade graph — each nation keeps only its top-3
    trading partners by revenue (self-loops dropped), the
    sparsification every real supply-chain/fraud graph applies before
    traversal. Emits each reachable nation's minimum hop distance.

    The BFS runs as frontier join-aggregate iterations in the driver
    loop (min-hop reduction each step — the Pregel shape l21/l22 use,
    here over broadcast-size frontiers); the oracle unrolls the same
    3 levels as explicit path joins and takes min(hop), which is
    equivalent because BFS hop IS the shortest path length.

    Scale: the heavy work is the one-pass edge aggregation; each BFS
    step then joins a ≤|V| frontier against the top-3-pruned edge
    table (≤3|V| rows) — broadcast-size at any corpus scale where
    |V| is entities, and checkpoint-per-iteration (l21's loop) when
    it is not.
    """
    from pyspark.sql.window import Window

    from sports_betting_data_pipeline_spark.session import latency_regime

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    flows = _trade_flows(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src").orderBy(F.desc("rev"), F.asc("dst"))
    edges = (
        flows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "dst")
        .cache()
    )
    # Cache fill at full parallelism (the lineitem pass), THEN the BFS
    # chain — ~7 tiny stages over ≤75 cached edges — inside the
    # latency regime, eagerly materialized (≤25 rows).
    n_edges = edges.count()
    with latency_regime(spark, n_edges):
        hops = nation.filter(F.col("n_nationkey") == 0).select(
            F.col("n_nationkey").alias("node"), F.lit(0).alias("hop")
        )
        for k in range(1, 4):
            frontier = hops.filter(F.col("hop") == k - 1)
            nxt = frontier.join(
                edges, F.col("src") == F.col("node")
            ).select(F.col("dst").alias("node"), F.lit(k).alias("hop"))
            hops = (
                hops.unionByName(nxt)
                .groupBy("node")
                .agg(F.min("hop").alias("hop"))
            )
        out = hops.join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("node")
        ).select("node", "n_name", F.col("hop").cast("long").alias("hop"))
        return out.localCheckpoint(eager=True)


_RECURSIVE_REACH_SQL = f"""
    WITH RECURSIVE flows AS ({_FLOWS_SQL}),
    ranked AS (
        SELECT src, dst,
               row_number() OVER (
                   PARTITION BY src ORDER BY rev DESC, dst
               ) AS rn
        FROM flows
        WHERE src <> dst
    ),
    edges AS (SELECT src, dst FROM ranked WHERE rn <= 3),
    reach(node, hop) AS (
        SELECT 0 AS node, 0 AS hop
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hop < 5
    )
    SELECT node, CAST(min(hop) AS BIGINT) AS hop
    FROM reach
    GROUP BY node
"""


@register("sql04_recursive_reachability", oracle=_RECURSIVE_REACH_SQL)
def sql04_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE graph traversal (Spark 4's WITH RECURSIVE): the
    transitive closure of the sparsified trade graph from nation 0 —
    min-hop reachability to depth 5 — written as ONE declarative SQL
    statement that BOTH engines execute verbatim (the oracle IS the
    same string). g02 builds this traversal as a driver-loop of
    frontier joins; this is the engine-native fixpoint form, and the
    pair pins that they agree wherever their depth bounds overlap.

    Scale: the recursion materializes paths, not just nodes — fan-out
    ≤ out-degree^depth — so the depth bound is load-bearing; the
    driver-loop form (g02) with per-step min-hop reduction is what
    you run when the frontier must stay deduplicated. Both forms
    belong in the engine; this query documents the trade.
    """
    # Materialize the edge table BEFORE recursing: Spark re-evaluates
    # the non-recursive CTE subtree on every recursion step, so an
    # edge list that costs a lineitem join-aggregate would be rebuilt
    # ~6 times (measured 5.1s vs 0.9s at sf0.1). Cache once, recurse
    # over the 75-row view; the oracle keeps the single-statement
    # form because DuckDB evaluates CTEs once.
    from pyspark.sql.window import Window

    flows = _trade_flows(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src").orderBy(F.desc("rev"), F.asc("dst"))
    edges = (
        flows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "dst")
        .cache()
    )
    edges.createOrReplaceTempView("trade_edges_sql04")
    # NOT wrapped in latency_regime: the g01/g02 two-phase treatment
    # (cache-fill count, then materialize the fixpoint in the small
    # regime) was built and measured SLOWER here — interleaved A/B
    # gave 2.6-3.1 s vs 2.0 s for this one-action form. The recursive
    # CTE's internal loop does its own planning per step regardless of
    # AQE, so the regime saved nothing and the separate cache-fill
    # count became a pure extra job.
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hop) AS (
            SELECT 0 AS node, 0 AS hop
            UNION ALL
            SELECT e.dst, r.hop + 1
            FROM reach r JOIN trade_edges_sql04 e ON e.src = r.node
            WHERE r.hop < 5
        )
        SELECT node, CAST(min(hop) AS BIGINT) AS hop
        FROM reach
        GROUP BY node
        """
    )
