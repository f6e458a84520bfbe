"""Data-layout operators: multi-dimensional clustering for scan pruning.

Parquet row-group skipping prunes on per-column min/max statistics —
which only bite along dimensions the file happens to be sorted by. A
linear sort makes ONE dimension's ranges tight and leaves every other
column's min/max spanning the whole file. Z-ORDERING (bit-interleaving
the dimensions into one sort key) bounds EVERY interleaved dimension
within every contiguous run of rows, so a multi-dimensional box
predicate can skip most row groups — the standard lakehouse layout
technique (Delta/Iceberg `OPTIMIZE ZORDER BY`), here as a plain
column expression + sort, no table format required.

The z-value is a closed-form arithmetic sum (no Python, no UDF):
``z = Σ_i  bit_i(x)·4^i + bit_i(y)·2·4^i`` — fully JVM-side via a
``sequence``/``aggregate`` fold, and identically expressible in the
oracle's SQL, so z-order queries stay hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints into a
    Morton (Z-curve) key: x in the even bit positions, y in the odd.
    Inputs must fit in ``bits`` bits (clamp or bucket first)."""
    # shiftright needs a literal count, so bit i is extracted with
    # exact integer arithmetic: (v div 2^i) % 2 (powers of two up to
    # 2^bits are exact in double, and floor division restores the
    # integer before the modulo).
    def bit(v: Column, i: Column) -> Column:
        return F.floor(v.cast("long") / F.pow(F.lit(2.0), i)).cast("long") % 2

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + bit(x, i) * F.pow(F.lit(4.0), i).cast("long")
        + bit(y, i) * F.lit(2) * F.pow(F.lit(4.0), i).cast("long"),
    )


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical z-value in portable SQL (DuckDB oracle side)."""
    return f"""(
        SELECT sum((({x} // power(2, gs.i)::BIGINT) % 2) * power(4, gs.i)::BIGINT
                 + (({y} // power(2, gs.i)::BIGINT) % 2) * 2 * power(4, gs.i)::BIGINT)
        FROM generate_series(0, {bits - 1}) AS gs(i)
    )"""


def zorder_sort(df: DataFrame, x: str, y: str, bits: int = 16) -> DataFrame:
    """Sort a DataFrame along the Z-curve of (x, y) — the layout step
    before a parquet write whose consumers filter on BOTH columns."""
    return df.orderBy(zorder_key(F.col(x), F.col(y), bits))
