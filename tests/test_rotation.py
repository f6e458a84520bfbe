"""Driver sample-rotation fairness (VERDICT r4 next-#1/#5).

The driver oracle-checks only a 50-query prefix of ``queries()`` per
round. Round 4 showed registration-order tiebreaks starve
early-registered, never-sampled queries (wg01–wg04 went 4 rounds with
no driver row). These tests simulate the rotation over the REAL
catalog + committed artifacts and assert full coverage within
ceil(N/50)+1 rounds, which would have caught that starvation.
"""

from __future__ import annotations

import glob
import json
import math
import os

from __spark_entry__ import _order_catalog, _rotation_order

from sports_betting_data_pipeline_spark.plans import ORACLES, QUERIES

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE = 50


def _ages() -> dict[str, int]:
    with open(os.path.join(_REPO_DIR, "CATALOG_AGES.json")) as fh:
        return json.load(fh)


def _historical_counts() -> dict[str, int]:
    counts = {name: 0 for name in QUERIES}
    for path in sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            continue
        for name in data:
            if name in counts:
                counts[name] += 1
    return counts


def _simulate(counts: dict[str, int], rounds: int) -> dict[str, int]:
    """Run `rounds` of 50-sample rotation; return round each query was
    first sampled in (1-based; 0 = sampled before the simulation)."""
    ages = _ages()
    first_sampled = {n: 0 for n, c in counts.items() if c > 0}
    counts = dict(counts)
    for rnd in range(1, rounds + 1):
        order = _order_catalog(list(QUERIES), counts, {}, ages, set(ORACLES))
        for name in order[:SAMPLE]:
            counts[name] += 1
            first_sampled.setdefault(name, rnd)
    return first_sampled


def test_manifest_covers_catalog():
    ages = _ages()
    assert set(ages) >= set(QUERIES), sorted(set(QUERIES) - set(ages))


def test_fresh_catalog_full_coverage_within_bound():
    """From a cold start, every query is sampled within ceil(N/50)+1
    rounds — the VERDICT r4 acceptance bound."""
    bound = math.ceil(len(QUERIES) / SAMPLE) + 1
    first = _simulate({n: 0 for n in QUERIES}, bound)
    unsampled = set(QUERIES) - set(first)
    assert not unsampled, sorted(unsampled)


def test_backlog_drains_from_committed_artifacts():
    """From the REAL committed artifact state, the never-sampled
    backlog drains within ceil(backlog/50) rounds."""
    counts = _historical_counts()
    backlog = [n for n, c in counts.items() if c == 0]
    bound = max(1, math.ceil(len(backlog) / SAMPLE))
    first = _simulate(counts, bound)
    still = [n for n in backlog if n not in first or first[n] == 0]
    assert not still, still


def test_oldest_never_sampled_lead_next_round():
    """The round-1 wager family must head the next driver sample if it
    still has no driver row (the exact r4 starvation)."""
    counts = _historical_counts()
    wagers = [n for n in QUERIES if n.startswith("wg")]
    pending = [n for n in wagers if counts[n] == 0]
    if not pending:
        return  # backlog already drained by a real driver round
    prefix = _rotation_order()[:SAMPLE]
    for name in pending:
        assert name in prefix, (name, prefix[:10])


def test_rows_only_queries_have_hash_checked_siblings():
    """Every catalog query WITHOUT an oracle (driver records only a
    weaker rows-only check) must name hash-checked sibling queries
    pinning the same machinery — a rows-only addition without a twin
    fails here (VERDICT r7 next-#7)."""
    from sports_betting_data_pipeline_spark.plans.catalog import (
        ROWS_ONLY_SIBLINGS,
    )

    rows_only = set(QUERIES) - set(ORACLES)
    # the map covers exactly the rows-only set — no unmapped rows-only
    # query, and no stale entry for a query that gained an oracle
    assert rows_only == set(ROWS_ONLY_SIBLINGS), (
        sorted(rows_only ^ set(ROWS_ONLY_SIBLINGS))
    )
    for name, sibs in ROWS_ONLY_SIBLINGS.items():
        assert sibs, name
        for sib in sibs:
            assert sib in ORACLES, (name, sib)


def test_no_registration_order_starvation():
    """Adding 200 brand-new queries must not push an old never-sampled
    query out of the next sample (the r4 failure mode, synthetically)."""
    names = [f"old{i:02d}" for i in range(10)] + [f"new{i:03d}" for i in range(200)]
    ages = {n: (1 if n.startswith("old") else 5) for n in names}
    counts = {n: 0 for n in names}
    order = _order_catalog(names, counts, {}, ages, set())
    assert order[:10] == [f"old{i:02d}" for i in range(10)]
