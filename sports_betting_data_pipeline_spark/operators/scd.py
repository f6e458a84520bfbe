"""Slowly-changing-dimension (type 2) history maintenance.

The lakehouse merge every warehouse needs: apply an update batch to a
dimension snapshot, closing changed rows (``valid_to`` = effective
timestamp) and opening new versions, while unchanged rows pass through
untouched. Expressed as ONE full-outer join on the business key plus a
conditional union — no MERGE statement, no per-row driver logic, so it
runs at any scale the join runs at.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective: str,
    initial: str = "1970-01-01",
) -> DataFrame:
    """Return the post-merge SCD2 history table.

    ``dim``: current snapshot — one OPEN row per ``key`` with columns
    ``[key, *attrs]``. When ``dim`` also carries a ``valid_from``
    column it is PRESERVED on the old versions (this is what makes the
    operator chainable: feed batch N's current rows back in and a row
    opened at batch N−1's effective date keeps that date); without
    one, ``initial`` stamps the pre-history snapshot. ``updates``: the
    new batch, ``[key, *attrs]``. ``effective``: the batch timestamp
    (ISO date string).

    Output columns: ``[key, *attrs, valid_from, valid_to,
    is_current]``; changed keys contribute a closed old row and an
    open new row, new keys an open row, unchanged/untouched keys pass
    through open.
    """
    has_vf = "valid_from" in dim.columns
    d = dim.select(
        key, *attrs, *(["valid_from"] if has_vf else [])
    ).alias("d")
    u = updates.select(key, *attrs).alias("u")

    def col(side: str, name: str) -> Column:
        return F.col(f"{side}.{name}")

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~col("d", a).eqNullSafe(col("u", a))

    eff = F.lit(effective).cast("date")
    init = F.lit(initial).cast("date")
    d_vf = F.col("d.valid_from").cast("date") if has_vf else init

    j = d.join(u, F.col(f"d.{key}") == F.col(f"u.{key}"), "full_outer").select(
        F.coalesce(col("d", key), col("u", key)).alias(key),
        *[col("d", a).alias(f"_d_{a}") for a in attrs],
        *[col("u", a).alias(f"_u_{a}") for a in attrs],
        d_vf.alias("_d_vf"),
        col("d", key).isNotNull().alias("_in_dim"),
        col("u", key).isNotNull().alias("_in_upd"),
        changed.alias("_changed"),
    )

    # Old versions: every dim row; closed iff superseded by a change.
    old_rows = j.filter(F.col("_in_dim")).select(
        key,
        *[F.col(f"_d_{a}").alias(a) for a in attrs],
        F.col("_d_vf").alias("valid_from"),
        F.when(F.col("_in_upd") & F.col("_changed"), eff).alias("valid_to"),
        (~(F.col("_in_upd") & F.col("_changed"))).alias("is_current"),
    )
    # New versions: changed keys and brand-new keys open at effective.
    new_rows = j.filter(
        F.col("_in_upd") & (F.col("_changed") | ~F.col("_in_dim"))
    ).select(
        key,
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return old_rows.unionByName(new_rows)
