"""Wager lifecycle as pure DataFrame transforms: place, cancel,
batch-cancel, settle-to-balance.

Reference parity (SURVEY.md §2.2 K2-K4, §2.3 F6/F7, §2.4 J3, §2.1 S7):
- place (src/mm_calls.py:222-280): sample candidate events, draw
  ladder odds, mint an external id, emit {external_id, line_id, odds,
  stake}. The reference's uuid1/random.random become key-derived
  md5/modulo so runs are reproducible and oracle-checkable.
- cancel single / cancel all (src/mm_calls.py:282-325): deleting keys
  from the wagers dict — an ANTI JOIN of the state against the cancel
  set; a cancel for an unknown id is a no-op, exactly the reference's
  404-tolerance (mm_calls.py:318-320).
- batch cancel k<=4 per tick (src/mm_calls.py:327-350):
  top-k-per-group with a deterministic order.
- balance (src/mm_calls.py:210-220): scalar aggregate over open
  wagers instead of a REST call.

State at scale: the wagers table is hash-partitioned on external_id;
place = append, cancel = anti join (one shuffle, or shuffle-free if
both sides are bucketed on external_id), balance = partial-aggregated
sum. Nothing here holds driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sports_betting_data_pipeline_spark.functions.odds import drawn_odds


def place_wagers(
    events: DataFrame,
    keep: int = 3,
    out_of: int = 10,
    stake: float = 1.0,
) -> DataFrame:
    """Build wager rows from candidate events (K2/K3 payload shape).

    Deterministic analogs of the reference's randomness: the ~30%
    event sample (mm_calls.py:241-243) is a key-modulo filter; the
    uuid1 external id (mm_calls.py:245) is md5 of the event key; the
    ladder draw (mm_calls.py:410-418) is keyed on event_id.
    """
    from sports_betting_data_pipeline_spark.operators.relational import (
        deterministic_sample,
    )

    return (
        deterministic_sample(events, "event_id", keep, out_of)
        .select(
            F.md5(F.concat(F.lit("wager-"), F.col("event_id").cast("string"))).alias(
                "external_id"
            ),
            # NULL user -> NULL line id (SQL || semantics, matching the
            # oracle): concat_ws would silently SKIP the null part and
            # mint a malformed "line-<mod>" id instead (fuzz_oracle)
            F.when(
                F.col("user_id").isNotNull(),
                F.concat_ws(
                    "-",
                    F.lit("line"),
                    F.col("user_id").cast("string"),
                    F.pmod(F.col("event_id"), F.lit(5)).cast("string"),
                ),
            ).alias("line_id"),
            F.col("user_id"),
            drawn_odds(F.col("event_id")).alias("odds"),
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * stake, 2).alias("stake"),
            F.col("event_id"),
        )
    )


def apply_cancellations(wagers: DataFrame, cancels: DataFrame) -> DataFrame:
    """K4: remove cancelled wagers from the state table.

    Anti join on external_id: cancel ids with no matching wager fall
    out silently (the reference treats 404 as already-cancelled,
    mm_calls.py:318-320).
    """
    return wagers.join(
        cancels.select("external_id"), on="external_id", how="left_anti"
    )


def batch_cancel_pick(wagers: DataFrame, k: int = 4) -> DataFrame:
    """F7/K4: pick up to ``k`` wagers per user for the batch-cancel
    POST (``random.choices(k=min(4, n))``, mm_calls.py:333).

    Deterministically ordered by external_id (md5 hex — effectively a
    uniform permutation, but stable across runs/partitionings).
    """
    w = Window.partitionBy("user_id").orderBy("external_id")
    return (
        wagers.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def balances(wagers: DataFrame, opening: float = 1000.0) -> DataFrame:
    """S7: per-user balance = opening minus total open stake."""
    return wagers.groupBy("user_id").agg(
        F.round(F.lit(opening) - F.sum("stake"), 2).alias("balance"),
        F.count(F.lit(1)).alias("n_open"),
    )
