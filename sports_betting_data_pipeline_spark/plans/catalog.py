"""The engine's query catalog.

Each entry is a named query: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) an equivalent ANSI-SQL string a
DuckDB oracle can run over the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash (SURVEY.md §5).

Conventions that keep the oracle comparison tight:
- Every computed column is aliased identically on both sides.
- Double-typed aggregates are rounded on BOTH sides (sum→2dp, avg→6dp):
  floating-point summation order differs between engines, so raw
  last-ulp bits are not comparable.
- DuckDB's SUM(BIGINT) returns HUGEINT — always CAST to BIGINT in
  oracle SQL so schemas line up with Spark's LongType.
- Timezone-sensitive renderings are kept OUT of oracle queries (the
  oracle session timezone is not ours to control); C1-C4 fidelity is
  pinned by unit tests instead (tests/test_temporal.py).

The registry is populated by importing the query modules at the bottom
of this file.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Every rows-only query (no oracle_sql — the driver records a weaker
# rows-only check) MUST name hash-checked sibling queries that pin the
# same machinery end-to-end. tests/test_rotation.py enforces this map:
# adding a rows-only query without a hash-checked twin fails CI.
ROWS_ONLY_SIBLINGS: dict[str, tuple[str, ...]] = {
    # xxhash64 is Spark-internal (no DuckDB twin); l58 runs the same
    # SimHash pipeline on a portable md5-derived hash, hash-checked,
    # and l08/l12 hash-check the MinHash/LSH machinery around it.
    "l09_simhash_neardup": ("l58_simhash_portable", "l08_minhash_lsh",
                            "l12_embedding_neardup"),
    # iterative k-means|| has no closed-form SQL; l13/l36 hash-check
    # the IVF assign/probe machinery with fixed centroids.
    "l23_ann_ivf_kmeans": ("l13_ann_ivf", "l36_ann_ivfpq"),
    # stateful streaming near-dup state is not DuckDB-expressible;
    # l30 hash-checks the same banded-signature filter as a batch plan.
    "st09_stream_neardup_filter": ("l30_incremental_neardup",),
}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional oracle SQL) to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_query_modules() -> None:
    # Imported for their @register side effects.
    from sports_betting_data_pipeline_spark.plans import (  # noqa: F401
        q_flatten,
        q_graph,
        q_joins,
        q_llm,
        q_odds,
        q_relational,
        q_sources,
        q_streaming,
        q_temporal,
        q_tpch_extra,
        q_wagers,
    )


_load_query_modules()
