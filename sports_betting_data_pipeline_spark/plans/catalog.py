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
