"""Sheet-style append sink and batched side-effect sink.

Reference parity (SURVEY.md §2.2):
- K1 Google Sheets append (src/main.py:23-37): `values().append` at
  `{sheet}!A1` with RAW input — a header row then stringified data
  rows. Here: an append-mode writer that renders every cell to its
  RAW string form (the reference's list-of-lists shape) and spools
  one CSV part per partition. The actual Sheets HTTP transport is a
  pluggable callable — the engine owns batching/formatting, not auth.
- K2/K3 single + batched wager POST (src/mm_calls.py:247-280): a
  ``foreachPartition`` sink that buffers rows into fixed-size batches
  (the reference batches 3 wagers per POST) and hands each batch to a
  transport callable. Executor-side, no driver collect.

Scale notes: both sinks are `foreachPartition`-shaped — per-partition
connections, batched calls, no per-row round trips (the reference's
own batch POST is the hint). Spooled parts are written atomically
(tmp + rename) so a retried task can't leave half a file; retries may
duplicate whole parts — at-least-once, same as any side-effecting
sink without an idempotent endpoint.
"""

from __future__ import annotations

import csv
import io
import os
import uuid
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, Row


def _raw(value: object) -> str:
    """RAW value rendering (K1: valueInputOption='RAW'): empty string
    for null — the reference's `.get(k, "")` defaulting."""
    return "" if value is None else str(value)


def sheet_append(
    df: DataFrame,
    spool_dir: str,
    sheet: str,
    include_header: bool = True,
) -> list[str]:
    """K1: append a DataFrame to a local "sheet" spool.

    Writes one CSV part per partition under ``spool_dir/sheet/``
    (atomic tmp+rename), data rows in RAW string form. The header row
    is written once, driver-side (the reference prepends it to every
    append, src/main.py:50-78 — we keep the header-first layout but
    only in part files that carry rows). Returns the part paths.
    """
    target = os.path.join(spool_dir, sheet)
    os.makedirs(target, exist_ok=True)
    columns = list(df.columns)

    def write_partition(rows: Iterator[Row]) -> Iterator[str]:
        # csv.writer with QUOTE_MINIMAL: free-form cells (event/market
        # display names) containing commas, quotes, or newlines are
        # quoted/escaped instead of silently corrupting the part file.
        sink = io.StringIO()
        writer = csv.writer(sink, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
        if include_header:
            writer.writerow(columns)
        n_data = 0
        for row in rows:
            writer.writerow([_raw(v) for v in row])
            n_data += 1
        if n_data == 0:
            return iter(())
        part = f"part-{uuid.uuid4().hex}.csv"
        tmp = os.path.join(target, "." + part + ".tmp")
        final = os.path.join(target, part)
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(sink.getvalue())
        os.replace(tmp, final)
        return iter([final])

    # mapPartitions (not foreachPartition) so the part paths come back.
    return sorted(df.rdd.mapPartitions(write_partition).collect())


def foreach_partition_batched(
    df: DataFrame,
    transport: Callable[[list[dict]], None],
    batch_size: int = 3,
) -> None:
    """K2/K3: deliver rows to a side-effecting transport in batches of
    ``batch_size`` per partition (the reference's 3-wager batch POST,
    src/mm_calls.py:263-273). The final short batch flushes too.

    ``transport`` runs on executors: it must be serializable and
    self-contained (build its session inside, not in the closure).
    """

    def send_partition(rows: Iterator[Row]) -> None:
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict())
            if len(batch) >= batch_size:
                transport(batch)
                batch = []
        if batch:
            transport(batch)

    df.foreachPartition(send_partition)


class SheetsApiTransport:
    """A batch transport shaped like the Sheets ``values().append``
    call the reference makes (src/main.py:23-37): each batch becomes
    one append request body ``{"range": "<sheet>!A1", "majorDimension":
    "ROWS", "values": [[...RAW strings...]]}`` with
    ``valueInputOption=RAW`` semantics (every cell stringified, null →
    "").

    The byte-mover is the injected ``send(body_dict)`` callable —
    tests pass a recorder, production passes a googleapis client call.
    Executor-safe: construct with picklable ``send`` (build sessions
    inside it, not in the closure).
    """

    def __init__(
        self,
        sheet: str,
        send: Callable[[dict], None],
        columns: Sequence[str],
    ) -> None:
        self.sheet = sheet
        self.send = send
        self.columns = list(columns)

    def __call__(self, batch: list[dict]) -> None:
        values = [[_raw(row.get(c)) for c in self.columns] for row in batch]
        self.send(
            {
                "range": f"{self.sheet}!A1",
                "majorDimension": "ROWS",
                "values": values,
            }
        )


class SpoolTransport:
    """A file-backed transport for tests and local runs: each batch
    becomes one JSON-lines file (stand-in for one POST)."""

    def __init__(self, spool_dir: str) -> None:
        self.spool_dir = spool_dir

    def __call__(self, batch: list[dict]) -> None:
        import json

        os.makedirs(self.spool_dir, exist_ok=True)
        part = os.path.join(self.spool_dir, f"batch-{uuid.uuid4().hex}.jsonl")
        tmp = part + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            for item in batch:
                fh.write(json.dumps(item, default=str) + "\n")
        os.replace(tmp, part)


def cancel_merge(wagers: DataFrame, cancels: DataFrame) -> DataFrame:
    """K4 as MERGE ... WHEN MATCHED DELETE semantics (see
    operators/wagers.apply_cancellations; re-exported here so the sink
    module presents the full K-surface)."""
    from sports_betting_data_pipeline_spark.operators.wagers import (
        apply_cancellations,
    )

    return apply_cancellations(wagers, cancels)
