"""American-odds ladder kit: ladder generation, snap-to-rung,
odds <-> probability <-> decimal conversions, and the reference's
deterministic "random" ladder draw.

Reference parity (SURVEY.md §2.6 C8, §2.4 J4):
- the odds ladder is the `VALID_ODDS_BACKUP` table
  (src/constants.py:1-291): 291 rungs, magnitudes 100..10000 on a
  piecewise step grid, symmetric except that -100 is excluded
  (American odds skip the (-100, 100) interior; -100 itself is
  remapped to +100, src/mm_calls.py:416-417).
- the bot draws a uniform rung, flips its sign 50% of the time, and
  remaps -100 -> 100 (src/mm_calls.py:410-418). The engine's
  oracle-checkable analog keys the draw on a row id instead of
  ``random.random()``.

The ladder is regenerated from its step grid rather than stored as a
literal (291 ints, KB-scale) and used as either a broadcast literal
array column (per-row snap/draw: 291 JVM-side comparisons, no
shuffle) or a broadcast dim table (membership semi-join).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# (magnitude_start_inclusive, magnitude_end_exclusive, step)
_LADDER_GRID = [
    (100, 120, 1),
    (120, 200, 2),
    (200, 300, 5),
    (300, 500, 10),
    (500, 1000, 20),
    (1000, 2000, 100),
    (2000, 3000, 250),
    (3000, 5000, 500),
    (5000, 10000, 2500),
]


@lru_cache(maxsize=1)
def odds_ladder() -> tuple[int, ...]:
    """The 291-rung American odds ladder, ascending: -10000..-101,
    100..10000 (no -100 rung)."""
    mags = [m for lo, hi, step in _LADDER_GRID for m in range(lo, hi, step)]
    mags.append(10000)
    return tuple(sorted(-m for m in mags if m != 100) + sorted(mags))


def ladder_array() -> Column:
    """The ladder as a literal array column (broadcast to every task
    as part of the serialized plan — no shuffle, no join). One
    server-parsed expression, not 291 F.lit calls: ~0.3 s of driver
    time per ladder consumer otherwise (SCALE.md r6)."""
    return F.expr(f"array({', '.join(str(v) for v in odds_ladder())})")


def _snap_magnitude(m: Column, lo_min: int, tie_up: bool) -> Column:
    """Nearest rung magnitude on the step grid for ``m`` clamped to
    [lo_min, 10000]. The ladder's global tie-break is the SMALLER
    rung, which in magnitude space means half-way ties round DOWN on
    the positive side but UP on the negative side (``tie_up``). Pure
    when-chain arithmetic — codegen'd, no array, no fold."""
    m = F.greatest(F.least(m, F.lit(10000.0)), F.lit(float(lo_min)))
    out = F.lit(10000).cast("long")
    # reverse order so the first matching WHEN is the containing tier
    for lo, hi, step in reversed(_LADDER_GRID):
        x = (m - lo) / step
        idx = F.floor(x + 0.5) if tie_up else F.ceil(x - 0.5)
        cand = (F.lit(lo) + idx * step).cast("long")
        out = F.when((m >= lo) & (m < hi), cand).otherwise(out)
    # the clamp floor may sit inside the first tier (101 for the
    # negative side, whose grid starts above the excluded -100)
    return F.greatest(out, F.lit(lo_min).cast("long"))


def snap_to_ladder(value: Column) -> Column:
    """Nearest ladder rung to ``value``; ties break to the SMALLER
    rung (including the cross-sign tie at -0.5, equidistant from -101
    and 100).

    Closed form over the step grid instead of an argmin fold over the
    291-rung array: the grid is piecewise-uniform, so the nearest rung
    is computable with a 9-arm when-chain per sign — whole-stage
    codegen'd arithmetic, ~6x faster than the interpreted
    higher-order-function fold and exhaustively verified equal to it
    (tests/test_wagers_odds.py, tests/test_properties.py)."""
    v = value.cast("double")
    pos = _snap_magnitude(v, 100, tie_up=False)  # nearest rung >= 100
    neg = -_snap_magnitude(-v, 101, tie_up=True)  # nearest rung <= -101
    d_pos = F.abs(pos - v)
    d_neg = F.abs(neg - v)
    # NULL/NaN propagate as NULL (like implied_probability/
    # decimal_odds): without the guard, least/greatest skip nulls so
    # NULL clamped to the +10000 rung and NaN fell through the tie
    # comparison to the -10000 arm — phantom extreme-rung counts from
    # missing odds.
    snapped = F.when(d_neg <= d_pos, neg).otherwise(pos)
    # untyped NULL literal: coerces to snapped's own (long) type —
    # an explicit cast here would promote the whole expression
    return F.when(v.isNull() | F.isnan(v), F.lit(None)).otherwise(snapped)


def drawn_odds(row_id: Column) -> Column:
    """C8 as a deterministic function of a row id: rung =
    ladder[id mod 291], sign flips when (id div 291) is odd, and
    -100 maps to +100 (src/mm_calls.py:410-418 with the RNG replaced
    by key arithmetic so a SQL oracle can reproduce it)."""
    n = len(odds_ladder())
    rung = F.element_at(ladder_array(), (F.pmod(row_id, F.lit(n)) + 1).cast("int"))
    # Exact long arithmetic for the flip parity: (id div n) is odd
    # iff id mod 2n >= n (ids are non-negative). floor(id / n) would
    # route through double division and can round above 2^53,
    # diverging from the oracle's integer `//`.
    flipped = F.when(
        F.pmod(row_id.cast("long"), F.lit(2 * n)) >= n, -rung
    ).otherwise(rung)
    return F.when(flipped == -100, F.lit(100)).otherwise(flipped)


def implied_probability(odds: Column) -> Column:
    """American odds -> implied win probability (with the bookmaker's
    vig still in): +a pays a per 100 staked, -a stakes a per 100 won."""
    a = odds.cast("double")
    return F.when(a > 0, 100.0 / (a + 100.0)).otherwise(-a / (-a + 100.0))


def decimal_odds(odds: Column) -> Column:
    """American -> European decimal odds (total return per unit stake)."""
    a = odds.cast("double")
    return F.when(a > 0, 1.0 + a / 100.0).otherwise(1.0 + 100.0 / -a)


def ladder_sql_list() -> str:
    """The ladder as a SQL list literal, for DuckDB oracle queries
    (kept in one place so Spark and oracle share a single source)."""
    return "[" + ", ".join(str(v) for v in odds_ladder()) + "]"


def drawn_odds_sql(row_id: str) -> str:
    """ANSI/DuckDB expression mirroring :func:`drawn_odds` exactly,
    built from the same ladder source."""
    n = len(odds_ladder())
    rung = f"list_extract({ladder_sql_list()}, CAST({row_id} % {n} AS INT) + 1)"
    flipped = f"(CASE WHEN ({row_id} // {n}) % 2 = 1 THEN -({rung}) ELSE {rung} END)"
    return f"(CASE WHEN {flipped} = -100 THEN 100 ELSE {flipped} END)"
