"""SparkSession factory with scale-aware defaults.

The reference is a single-threaded CPython process (SURVEY.md §4); here
the execution engine is Spark, so the session is where the 100 TB
posture is configured once for every caller:

- AQE on (runtime partition coalescing, skew-join splitting) — replaces
  any hand-rolled batching the reference did (mm_calls.py:93-96 batched
  HTTP calls per tournament; Catalyst's scan coalescing + broadcast
  joins are the engine-native equivalent).
- UTC session timezone — the reference mixes UTC, America/New_York,
  US/Eastern and naive-local renderings (main.py:89-95, 126-131,
  172-174); we pin the engine to UTC and make every timezone rendering
  explicit in the temporal kit so results are reproducible on any
  cluster and comparable against the DuckDB oracle.
- Arrow enabled — all pandas interchange (Pandas UDFs, toPandas) goes
  through Arrow batches, never per-row pickling.
- Shuffle partitions default to cores for local mode; on a real cluster
  this is overridden per-deployment (or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "sports-betting-data-pipeline-spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` when no
    active session exists; on a cluster, leave it unset and submit via
    spark-submit.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_str = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_str) if cpus_str.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
