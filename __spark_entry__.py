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


def _order_catalog(
    names: list[str],
    counts: dict[str, int],
    latest: dict[str, dict],
    ages: dict[str, int],
    oracled: set[str],
) -> list[str]:
    """Pure rotation ordering (unit-testable; see _rotation_order)."""

    def failed(name: str) -> bool:
        row = latest.get(name)
        if row is None:
            return False
        err = row.get("err")
        if err is not None and err != "no_oracle":
            return True
        if err == "no_oracle" and name in oracled:
            return True
        return any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        )

    pos = {name: i for i, name in enumerate(names)}
    newest = max(ages.values(), default=0) + 1
    return sorted(
        names,
        key=lambda n: (
            not failed(n),
            counts.get(n, 0),
            ages.get(n, newest),
            pos[n],
        ),
    )


def _rotation_order() -> list[str]:
    """Order the catalog failed-first, then least-driver-sampled.

    The driver oracle-checks a prefix sample of ``queries()`` each
    round; iterating the catalog in registration order forever leaves
    the tail families without a green driver row (VERDICT r2 next-#5).
    Two tiers (VERDICT r3 next-#2):

    1. Queries whose LATEST committed driver row shows a harness error
       or a false match sort first, so a fix lands a fresh driver row
       the very next round instead of waiting out the rotation
       (``err == "no_oracle"`` is rows-only by design, not a failure).
    2. Within a tier, least-sampled first (appearance count across all
       ``CORRECTNESS_r*.json``), then catalog AGE from the committed
       ``CATALOG_AGES.json`` manifest (oldest-registered first), then
       registration order. The age tiebreak fixes VERDICT r4 wrong-#1:
       module-import position starved the round-1 wager family
       (wg01–wg04) behind every newly added count-0 query for four
       rounds; age guarantees first-registered queries drain first.

    Fully deterministic; any artifact parse problem falls back to
    registration order (broad except per ADVICE r3 — a list-shaped
    artifact must not break the driver entrypoint).
    """
    import glob
    import json

    counts = {name: 0 for name in QUERIES}
    latest: dict[str, dict] = {}
    ages = {}

    def _round_no(path: str) -> int:
        # int-parse the round so r100 sorts after r99 (the glob's
        # lexicographic order breaks past the 2-digit zero padding;
        # ADVICE r5 flagged the same assumption in coverage_status.py)
        try:
            return int(os.path.basename(path).split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            return -1

    try:
        for path in sorted(
            glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")), key=_round_no
        ):
            with open(path) as fh:
                data = json.load(fh)
            if not isinstance(data, dict):
                continue
            for name, row in data.items():
                if name in counts:
                    counts[name] += 1
                    if isinstance(row, dict):
                        latest[name] = row
        try:
            with open(os.path.join(_REPO_DIR, "CATALOG_AGES.json")) as fh:
                loaded = json.load(fh)
            if isinstance(loaded, dict):
                ages = {k: v for k, v in loaded.items() if isinstance(v, int)}
        except Exception:
            ages = {}
    except Exception:
        return list(QUERIES)

    return _order_catalog(list(QUERIES), counts, latest, ages, set(ORACLES))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-recently-driver-sampled first (see _rotation_order)."""
    return {name: QUERIES[name] for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    return dict(ORACLES)
