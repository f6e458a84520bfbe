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


def test_json_and_csv_roundtrip_match_parquet(spark, sf_dir, tmp_path):
    """Source-format parity: the same rows through parquet, JSON-lines,
    and CSV scans with the declared schema produce identical frames."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sports_betting_data_pipeline_spark.io import (
        load_table,
        read_csv_table,
        read_json_table,
    )

    base = load_table(spark, sf_dir, "nation")
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    base.write.json(jdir)
    base.write.option("header", "true").csv(cdir)

    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    )
    want = sorted(map(tuple, base.select(*[f.name for f in schema]).collect()))
    got_j = sorted(
        map(tuple, read_json_table(spark, jdir, schema).select(*[f.name for f in schema]).collect())
    )
    got_c = sorted(
        map(tuple, read_csv_table(spark, cdir, schema).select(*[f.name for f in schema]).collect())
    )
    assert got_j == want
    assert got_c == want
