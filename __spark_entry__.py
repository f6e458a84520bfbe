"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 (smoke: rows>0).
``queries()`` / ``oracle_sql()`` expose the engine's query catalog
(sports_betting_data_pipeline_spark/plans/) for the driver's
DuckDB-oracle differential check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from sports_betting_data_pipeline_spark.plans import ORACLES, QUERIES  # noqa: E402

FLAGSHIP = "q01_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def _rotation_order() -> list[str]:
    """Order the catalog least-driver-sampled-first.

    The driver oracle-checks a prefix sample of ``queries()`` each
    round; iterating the catalog in registration order forever leaves
    the tail families without a green driver row (VERDICT r2 next-#5).
    Counting appearances in the committed ``CORRECTNESS_r*.json``
    artifacts and sorting ascending (registration order as tiebreak)
    rotates the sample automatically every round while staying fully
    deterministic. Falls back to registration order if the artifacts
    are unreadable.
    """
    import glob
    import json

    counts = {name: 0 for name in QUERIES}
    try:
        for path in sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
            with open(path) as fh:
                for name in json.load(fh):
                    if name in counts:
                        counts[name] += 1
    except (OSError, ValueError):
        return list(QUERIES)
    pos = {name: i for i, name in enumerate(QUERIES)}
    return sorted(QUERIES, key=lambda n: (counts[n], pos[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-recently-driver-sampled first (see _rotation_order)."""
    return {name: QUERIES[name] for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
