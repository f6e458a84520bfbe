"""S1-S7 snapshot-source tests: declared-schema ingest + the
constants-fallback branch (SURVEY.md §2.1)."""

from __future__ import annotations

import pytest

from sports_betting_data_pipeline_spark.functions.odds import odds_ladder
from sports_betting_data_pipeline_spark.sources.rest import (
    balance_source,
    odds_ladder_source,
    snapshot_source,
    tournaments_source,
)
from sports_betting_data_pipeline_spark.schemas import TOURNAMENT


def test_ladder_falls_back_on_transport_failure(spark):
    def broken():
        raise ConnectionError("boom")

    df = odds_ladder_source(spark, transport=broken)
    got = sorted(r.odds for r in df.collect())
    assert got == sorted(odds_ladder())


def test_ladder_uses_transport_when_it_works(spark):
    df = odds_ladder_source(spark, transport=lambda: [{"odds": -110}, {"odds": 100}])
    assert {r.odds for r in df.collect()} == {-110, 100}


def test_tournaments_declared_schema(spark):
    recs = [{"id": 7, "name": "NBA", "sport_events": None}]
    df = tournaments_source(spark, transport=lambda: recs)
    assert df.schema == TOURNAMENT
    assert df.count() == 1
    # no transport -> empty, same schema (mm_calls.py:73-75 miss path)
    assert tournaments_source(spark).count() == 0


def test_balance_scalar_and_missing_fallback(spark):
    [row] = balance_source(spark, opening=250.0).collect()
    assert row.balance == 250.0
    with pytest.raises(ValueError):
        snapshot_source(spark, None, TOURNAMENT, fallback_records=None)
