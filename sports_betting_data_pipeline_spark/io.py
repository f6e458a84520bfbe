"""Table readers / writers for the engine.

The reference's sources are REST scans feeding Python dicts
(mm_calls.py:52-115, SURVEY.md §2.1 S1-S7); in the Spark engine every
source is a DataFrame scan with an explicit schema so Catalyst gets
predicate pushdown + column pruning for free. The driver's fixture
tables (TESTDATA.md) are parquet files; production would be the same
code pointed at a partitioned parquet/ORC lake.

Scale notes (100 TB posture):
- Never infer schemas on the hot path; parquet footers carry them.
- Readers return lazy DataFrames; filters applied by callers reach the
  scan (verify with ``df.explain`` → PushedFilters).
- ``maxPartitionBytes`` is left at Spark's 128 MB default, which yields
  ~800k input splits at 100 TB — reasonable for a 1000-executor
  cluster; tune per-deployment, not in code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver fixture tables (TESTDATA.md): TPC-H-ish star schema + an events
# stream table + LLM-pipeline fixtures.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_engine_confs(spark: SparkSession) -> None:
    """Make the engine self-sufficient on a caller-provided session.

    The driver (and any embedding application) hands us ITS
    SparkSession; results must not depend on that session's ambient
    timezone, so pin UTC here (SURVEY.md §7 step 3 gotcha) along with
    the ns-as-long parquet read the events table needs. All of these
    are runtime-settable SQL confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Drop PySpark's per-API-call debugging wrapper (error-context
    # call-site capture: ~3 py4j round trips per DataFrame/Column call;
    # see session.py for the measured construction win). It is a
    # STATIC conf: sessions built by get_spark() set it at builder
    # time; on a caller-provided (driver) session the set below raises
    # CANNOT_MODIFY_STATIC_CONFIG and the wrapper simply stays on —
    # correctness is unaffected either way (error-context metadata
    # only), so swallow the failure.
    try:
        spark.conf.set(
            "spark.python.sql.dataFrameDebugging.enabled", "false"
        )
    except Exception:
        pass


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a UTC TimestampType instant across
    fixture generations (the driver has shipped both):

    - parquet TIMESTAMP(NANOS), surfaced as raw INT64 under
      ``nanosAsLong`` (Spark timestamps are µs precision — SURVEY.md
      §1.3's ns-epoch note, reference main.py:126-128): truncate to µs
      with exact integer division (`div`, not `/`: ns epochs exceed
      double's 53-bit mantissa), matching DuckDB's ns→µs truncation
      bit-for-bit.
    - parquet timestamp[us] without timezone, surfaced as
      TIMESTAMP_NTZ: reinterpret the wall-clock as UTC (the session
      timezone is pinned to UTC, so a plain cast preserves the instant
      exactly as DuckDB's naive reading does).
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# (appId, semanticHash, columns) -> scan partition count; see
# widen_for_compute. Bounded by the catalog's distinct widen inputs in
# one application; _WIDEN_MEMO_MAX guards the pathological long-lived
# process cycling many applications (VERDICT r11 next-#8): on overflow,
# dead-application entries are dropped first, then the whole memo — a
# miss only re-pays the 77 ms probe, never changes results.
_WIDEN_MEMO: dict[tuple, int] = {}
_WIDEN_MEMO_MAX = 4096


def widen_for_compute(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guarantee a CPU-heavy per-row stage (signature hashing,
    projections, codec work) runs with at least core-count parallelism.

    A parquet scan parallelizes by file/row-group; a small or
    single-row-group input therefore yields ONE task, serializing any
    expensive expression layered on it (observed r4: simhash over a
    one-row-group fixture pinned 1 of 32 cores — 2.2 s vs 0.35 s
    widened). At 100 TB the scan already has ~800k splits, so this is
    a metadata check and NO-OP there: the round-robin exchange only
    materializes when current parallelism is below ``min_parts``
    (default ``sparkContext.defaultParallelism``).

    Streaming DataFrames can't report a partition count pre-start, so
    they always get the repartition — on a real stream the exchange is
    the standard decouple-source-parallelism-from-compute step (Kafka
    topic partitions rarely match executor cores).
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        # The partition-count probe (df.rdd.getNumPartitions) runs full
        # physical planning plus an RDD conversion — measured 77 ms per
        # call vs 11 ms for semanticHash (r11), and the engine calls
        # this helper at 14 sites, twice per query for the self-join
        # bases, on EVERY plan construction (bench runs construct
        # fresh per timed run). Memoize the count per (application,
        # semantic plan, columns): the probe is pure scan metadata, so
        # a memo hit can at worst make a stale widen DECISION (perf,
        # never results) — and only if the same fixture path is
        # rewritten with a different row-group layout inside one
        # application, which only the fuzz harness does (it uses fresh
        # per-variant paths, which change the semantic hash).
        key = (
            spark.sparkContext.applicationId,
            df.semanticHash(),
            tuple(df.columns),
        )
        n = _WIDEN_MEMO.get(key)
        if n is None:
            n = df.rdd.getNumPartitions()
            if len(_WIDEN_MEMO) >= _WIDEN_MEMO_MAX:
                app = key[0]
                stale = [k for k in _WIDEN_MEMO if k[0] != app]
                for k in stale:
                    del _WIDEN_MEMO[k]
                if len(_WIDEN_MEMO) >= _WIDEN_MEMO_MAX:
                    _WIDEN_MEMO.clear()
            _WIDEN_MEMO[key] = n
    except Exception:
        return df.repartition(target)  # streaming: no partition metadata
    return df if n >= target else df.repartition(target)


# key -> (fingerprint, df): staleness lives in the VALUE, not the key,
# so a regenerated fixture OVERWRITES its entry instead of stranding the
# old DataFrame (plan object + session reference) forever — the cache is
# bounded at one entry per (app, dir, table).
_TABLE_CACHE: dict[tuple, tuple[tuple[int, int], DataFrame]] = {}


def _dir_fingerprint(path: str) -> tuple[int, int]:
    """(max mtime_ns, entry count) of a table path — the staleness
    stamp for :func:`load_table`'s memo (ADVICE r6: a fixture dir
    regenerated within one Spark application must not be served from
    the memoized listing; same hazard class st16's mtime stamp
    guards). A flat parquet dir is one ``scandir``; a missing path
    fingerprints as (0, 0) and lets ``spark.read`` raise its own
    error. Single files (a bare .parquet) stamp their own stat."""
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, 1)
        mx = st.st_mtime_ns
        n = 0
        with os.scandir(path) as it:
            for e in it:
                n += 1
                try:
                    m = e.stat().st_mtime_ns
                except OSError:
                    continue
                if m > mx:
                    mx = m
        return (mx, n)
    except OSError:
        return (0, 0)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table (``events.ts`` normalized
    to a UTC instant — see :func:`normalize_events_ts`).

    The resolved scan is memoized per (SparkContext, sf_dir, table):
    ``spark.read.parquet`` re-lists the path and re-reads footers to
    resolve the schema on EVERY call — measured ~0.11 s per call (r6),
    which a 4-table query pays 4× at plan-construction time, on every
    bench run, for fixture files that never change mid-session. The
    cached object is a lazy immutable DataFrame, so reuse is free;
    keys carry the applicationId so a restarted session can never see
    a dead context's plans, plus a directory fingerprint (max
    mtime_ns + entry count — one ``scandir``) so a fixture dir
    regenerated mid-session is re-resolved instead of served from the
    stale listing. (At 100 TB the same cost is catalog-level
    metadata — a real deployment memoizes it in the metastore the
    same way, invalidated by table version.)
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_engine_confs(spark)
    path = table_path(sf_dir, name)
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
    )
    stamp = _dir_fingerprint(path)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_events_ts(df)
    _TABLE_CACHE[key] = (stamp, df)
    return df


_ROW_COUNT_CACHE: dict[str, tuple[tuple[int, int], int]] = {}


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Row count of a fixture table from its parquet FOOTER metadata —
    driver-side, no Spark job, memoized on the directory fingerprint.

    This is the engine's stand-in for catalog table statistics: a
    cost-based planner reads exactly this number from the metastore
    before picking a physical strategy. Callers use it as a SIZE HINT
    for plan-time posture decisions (e.g.
    ``connected_components(size_hint=...)`` sizing its label-loop
    shuffles); at warehouse scale the count is huge and every hint
    saturates to the session's configured parallelism, so nothing
    changes — the hint only matters in the small regime it measures.
    Returns None when the footprint can't be read (caller falls back
    to measuring with a job)."""
    path = table_path(sf_dir, name)
    key = os.path.abspath(path)
    stamp = _dir_fingerprint(path)
    hit = _ROW_COUNT_CACHE.get(key)
    n = hit[1] if hit is not None and hit[0] == stamp else None
    if n is None:
        try:
            import pyarrow.parquet as pq

            if os.path.isdir(path):
                n = 0
                with os.scandir(path) as it:
                    for e in it:
                        if e.name.endswith(".parquet") and not e.name.startswith(
                            (".", "_")
                        ):
                            n += pq.ParquetFile(e.path).metadata.num_rows
            else:
                n = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            return None
        _ROW_COUNT_CACHE[key] = (stamp, n)
    return n


_FILE_ROWS_CACHE: dict[str, tuple[tuple[int, int], int]] = {}


def size_hint(df: DataFrame) -> int | None:
    """Row-count upper bound for ``df`` from the parquet FOOTERS of its
    plan's input files — driver-side metadata only, no Spark job.

    This generalizes :func:`table_row_count` from "a named fixture
    table" to "whatever ``df`` actually scans", so strategy switches
    (:func:`functions.corpus.deterministic_shuffle`'s single-partition
    rank path, :func:`session.latency_regime`'s small-regime confs, the
    connected-components loop sizing) are DEFAULT behavior instead of
    caller discipline: plans pass ``size_hint(docs)`` rather than
    hand-threading ``table_row_count(sf_dir, "documents")``. It is the
    same CBO stand-in — a cost-based planner reads exactly this bound
    from the metastore before picking a physical strategy.

    The bound is the total footer row count of ``df.inputFiles()``:
    filters/joins/aggregates downstream only ever see at most the
    scanned rows per leaf, so for posture decisions (which only need
    "is this the small regime?") it is safe on any linear plan; callers
    composing row-multiplying shapes (explodes, many-to-many joins)
    scale it themselves, e.g. l22's ``32 ×`` edges-per-doc bound.
    Returns None — caller falls back to measuring with a job — when any
    input is non-parquet or non-file (streaming, in-memory fixtures),
    so the hint can never silently undercount a real source.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    import pyarrow.parquet as pq
    from urllib.parse import unquote, urlparse

    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        path = unquote(parsed.path) or uri
        if not path.endswith(".parquet"):
            return None
        try:
            st = os.stat(path)
            stamp = (st.st_mtime_ns, st.st_size)
            hit = _FILE_ROWS_CACHE.get(path)
            if hit is not None and hit[0] == stamp:
                total += hit[1]
                continue
            n = pq.ParquetFile(path).metadata.num_rows
            _FILE_ROWS_CACHE[path] = (stamp, n)
            total += n
        except Exception:
            return None
    return total


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Partition-aware parquet writer.

    The 100 TB layout partitions fact tables by a date key (SURVEY.md
    §4): pass e.g. ``partition_by=["ship_date"]`` so downstream scans
    get partition pruning.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_json_table(
    spark: SparkSession, path: str, schema, multiline: bool = False
) -> DataFrame:
    """JSON-lines scan with a DECLARED schema — the reference's
    json.loads ingest (mm_calls.py:74, SURVEY.md §1.1) as a proper
    source. Never infer on the hot path: inference is a second full
    read, and a schema drift silently becomes a null column instead
    of an error surfaced at the boundary."""
    _ensure_engine_confs(spark)
    return (
        spark.read.schema(schema)
        .option("multiLine", "true" if multiline else "false")
        .json(path)
    )


def read_csv_table(
    spark: SparkSession, path: str, schema, header: bool = True
) -> DataFrame:
    """CSV scan with a declared schema (the sheet-shaped interchange
    format, SURVEY.md §2.2 K1 read back)."""
    _ensure_engine_confs(spark)
    return (
        spark.read.schema(schema)
        .option("header", "true" if header else "false")
        .csv(path)
    )
