"""Differential test: every oracle-backed catalog query must match
DuckDB on the sf0.001 fixtures — the local mirror of the driver's
correctness gate."""

from __future__ import annotations

import pytest

from sports_betting_data_pipeline_spark.plans import ORACLES, QUERIES
from tests.oracle import assert_frames_match, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    assert_frames_match(spark_df, oracle_pdf)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name} returned no columns"
    assert df.count() >= 0
