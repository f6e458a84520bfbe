"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from sports_betting_data_pipeline_spark.session import get_spark  # noqa: E402

# Small SF for fast unit/parity tests; the driver re-checks at sf0.01.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    return get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            # static conf: saveAsTable targets (bucketed-join tests)
            # go to a throwaway warehouse, not the repo dir
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
