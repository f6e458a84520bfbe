#!/usr/bin/env python3
"""Generate docs/OPERATORS.md — the human-facing operator index
(VERDICT r8 next-#7): one row per catalog query with the engine
functions its plan composes, the oracle kind, and the scale note
extracted from its docstring. SCALE.md stays the round-by-round
engineering log; this is the by-operator view a library user wants.

Everything is derived from the registry, so the page can never drift
from the code: rerun after catalog changes (tests/test_plans.py has a
staleness pin).
"""

from __future__ import annotations

import inspect
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FAMILIES = [
    ("q", "TPC-H-style relational"),
    ("a", "Aggregation / statistics"),
    ("w", "Window functions"),
    ("r", "Rollup / cube / pivot / grouping sets"),
    ("s", "Sort / limit / set operations"),
    ("d", "Distinct / exact dedup"),
    ("f", "Filters / sampling"),
    ("j", "Joins"),
    ("p", "Nested flatten / projection"),
    ("c", "Conversions / temporal / codecs"),
    ("o", "Odds ladder"),
    ("wg", "Wager flows"),
    ("g", "Graph (PageRank / BFS)"),
    ("aj", "As-of joins"),
    ("rj", "Range joins"),
    ("t", "Top-k / ordering"),
    ("ev", "Evaluation harnesses"),
    ("mk", "Markov / sequence mining"),
    ("ts", "Time series"),
    ("st", "Structured Streaming"),
    ("l", "LLM data pipeline (dedup / ANN / text / corpus)"),
    ("m", "Multimodal"),
    ("pl", "End-to-end pipelines"),
    ("src", "Sources / formats"),
    ("mv", "Incremental / materialized views"),
    ("scd", "Slowly-changing dimensions"),
    ("dq", "Data quality"),
    ("geo", "Geospatial"),
    ("zorder", "Layout / clustering"),
    ("sql", "SQL surface"),
    ("co", "Catalog ops"),
]


def _kit_functions() -> dict[str, str]:
    """Public engine-kit callables: name -> 'module.name'."""
    import importlib

    mods = [
        "operators.flatten", "operators.relational", "operators.temporal",
        "operators.asof", "operators.wagers", "operators.quantiles",
        "operators.scd", "operators.layout",
        "functions.text", "functions.dedup", "functions.similarity",
        "functions.corpus", "functions.multimodal", "functions.odds",
        "streaming.jobs", "sources.rest", "sources.pusher", "sinks.sheets",
        "io", "session",
    ]
    kit: dict[str, str] = {}
    for m in mods:
        mod = importlib.import_module(f"sports_betting_data_pipeline_spark.{m}")
        for n, obj in vars(mod).items():
            if n.startswith("_") or not callable(obj):
                continue
            owner = getattr(obj, "__module__", "")
            if owner == f"sports_betting_data_pipeline_spark.{m}":
                kit[n] = f"{m.split('.')[-1]}.{n}"
    return kit


def _scale_note(doc: str) -> str:
    """The docstring's scale paragraph if present, else its first
    sentence."""
    if not doc:
        return ""
    doc = inspect.cleandoc(doc)
    m = re.search(r"(?:^|\n)\s*Scale[:d][^\n]*(?:\n(?!\n)[^\n]*)*", doc)
    text = m.group(0).strip() if m else doc.split("\n\n")[0]
    text = re.sub(r"\s+", " ", text).strip()
    # Clip long notes at a SENTENCE boundary only (VERDICT r9 nit #3:
    # mid-sentence '…' on the page a human reads). Whole sentences up
    # to the cap; when the FIRST sentence alone overruns, keep it
    # entire — a long table cell beats an amputated one.
    if len(text) <= 400:
        return text
    dot = text[:400].rfind(". ")
    if dot >= 120:
        return text[: dot + 1]
    end = text.find(". ", 400)
    return text[: end + 1] if end >= 0 else text


_TIMEWARP_GUARD_EXAMPLE = """\
### Guarding the watermark: future-timestamp quarantine

Not a catalog query (the `st*` fixtures are clean by construction) but
a first-class part of the streaming surface, pinned by the `timewarp`
fuzz variant: Spark's watermark is `max(event time) - delay`, so ONE
corrupt far-future timestamp (wrong producer clock, ns/µs unit mixup)
advances it past every genuine event and the state operator silently
drops the live workload. `streaming.jobs.split_future_events` bounds
event time against processing time BEFORE any watermark sees it:

```python
from sports_betting_data_pipeline_spark.streaming.jobs import (
    read_events_stream, split_future_events,
)

# one-liner: drop poison rows from the main stream
stream = read_events_stream(spark, sf_dir, future_bound="1 HOUR")
# or clamp instead of drop (row count preserved, NULL ts stays NULL)
stream = read_events_stream(
    spark, sf_dir, future_bound="1 HOUR", future_policy="clamp")

# recovery: keep the quarantined rows for replay after the producer
# clock is fixed. For TWO sinks pass an explicit threshold (one
# literal, shared by construction) or split inside one foreachBatch —
# per-query current_timestamp() planning can otherwise disagree at
# the boundary (see the function docstring).
clean, quarantined = split_future_events(
    read_events_stream(spark, sf_dir), "ts", threshold=cutoff_ts)
clean.withWatermark("ts", "10 minutes")...   # genuine windows survive
quarantined.writeStream...                    # audit + replay later
```

Behavior is pinned by `tests/test_streaming.py` (routing keeps NULL
event times clean; a poisoned two-batch drain keeps every genuine 2024
window with the guard and loses ALL of them without it)."""


def build_page() -> str:
    from sports_betting_data_pipeline_spark.plans import ORACLES, QUERIES

    kit = _kit_functions()
    rows_by_family: dict[str, list[str]] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        prefix = re.match(r"[a-z]+", name).group(0)
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = ""
        used = sorted(
            ref for n, ref in kit.items() if re.search(rf"\b{re.escape(n)}\(", src)
        )
        oracle = "hash" if name in ORACLES else "rows-only"
        note = _scale_note(fn.__doc__ or "").replace("|", "\\|")
        mod = fn.__module__.split(".")[-1]
        rows_by_family.setdefault(prefix, []).append(
            f"| `{name}` | {', '.join(f'`{u}`' for u in used) or f'`{mod}` built-ins'} "
            f"| {oracle} | {note} |"
        )

    out = [
        "# Operator index",
        "",
        "_Generated by `scripts/gen_operators_doc.py` — do not edit by"
        " hand. One row per catalog query: the engine-kit functions its"
        " plan composes (empty = pure built-in DataFrame expressions in"
        " the plan module), the external-oracle kind (`hash` ="
        " value-hash-checked against DuckDB; `rows-only` = genuinely"
        " not SQL-expressible, row-count-checked with hash-checked"
        " sibling queries), and the scale note from its docstring."
        " Round-by-round measurements live in `SCALE.md`._",
        "",
    ]
    known = {p for p, _ in FAMILIES}
    extra = [p for p in rows_by_family if p not in known]
    assert not extra, f"unmapped query family prefixes: {extra}"
    for prefix, title in FAMILIES:
        rows = rows_by_family.get(prefix)
        if not rows:
            continue
        out += [
            f"## {title} (`{prefix}*`, {len(rows)} queries)",
            "",
            "| query | engine functions | oracle | scale note |",
            "|---|---|---|---|",
            *rows,
            "",
        ]
        if prefix == "st":
            out += [_TIMEWARP_GUARD_EXAMPLE, ""]
    n_total = sum(len(v) for v in rows_by_family.values())
    out.append(f"_{n_total} queries total._")
    out.append("")
    return "\n".join(out)


if __name__ == "__main__":
    page = build_page()
    dst = os.path.join(_REPO, "docs", "OPERATORS.md")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as fh:
        fh.write(page)
    print(f"wrote {dst} ({len(page.splitlines())} lines)")
