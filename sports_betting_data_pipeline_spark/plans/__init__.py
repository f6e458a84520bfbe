"""Query catalog: named queries paired with DuckDB oracle SQL."""

from sports_betting_data_pipeline_spark.plans.catalog import ORACLES, QUERIES, register

__all__ = ["QUERIES", "ORACLES", "register"]
