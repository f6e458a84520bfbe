"""Corpus-assembly operators for a pretraining-data pipeline:
benchmark decontamination, sequence packing, deterministic shuffle,
and temperature-based mixture sampling.

These are the steps between "cleaned documents" (functions/text,
functions/dedup) and "training batches": remove eval-set overlap,
re-weight domains/languages, order the corpus reproducibly, and pack
tokens into fixed-length sequences.

Scale design:
- decontamination joins on exploded n-gram shingles — an equi-join
  whose build side (the benchmark suite) is tiny relative to the
  corpus; at 100 TB add a bloom filter on benchmark shingle hashes to
  prune the probe scan-side (the join itself already never goes
  quadratic).
- packing is a per-shard window cumsum (one shuffle on the shard key);
  shards (language, source, ...) pack independently and in parallel,
  exactly how distributed pretraining prep shards its corpus. No
  global sort.
- deterministic shuffle orders by a keyed hash (md5), reproducible
  across engines/runs — a full sort at the scale of the SELECTED
  corpus, which is the one unavoidable sort in training-data prep
  (and is what `ORDER BY` + write-out is for).
- temperature mixture computes per-group quotas from integer-exact
  arithmetic (floor(sqrt(count)) weights, integer quota division) so
  the same sample set is reproducible in any engine — no RNG, no
  float boundary flips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sports_betting_data_pipeline_spark.functions.text import (
    shingles,
    shingles_from_tokens,
    ws_tokens,
)


def decontaminate_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    tokens_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Eval-set contamination detection (the n-gram-overlap rule used
    for pretraining decontamination): a corpus doc is contaminated if
    it shares at least one k-token shingle with any benchmark doc.

    Returns (id, n_bench_hits) for contaminated docs only —
    n_bench_hits = how many DISTINCT benchmark docs overlap. Anti-join
    the corpus against this to get the clean set.

    Pass ``tokens_col`` (a precomputed ``ws_tokens(text)`` array on
    BOTH inputs) to skip re-tokenizing: composed pipelines (pl02)
    cache one token base and feed every stage from it; shingle output
    is identical (see :func:`text.shingles_from_tokens`).

    Scale: explode both sides to (shingle, id), equi-join on shingle,
    count distinct benchmark ids per corpus doc. The benchmark side is
    small (an eval suite); the shuffle carries only (shingle, id)
    pairs. Never quadratic.
    """
    if tokens_col is not None:
        sh = shingles_from_tokens(F.col(tokens_col), k)
    else:
        sh = shingles(F.col(text_col), k)
    # No dropDuplicates on either exploded side: shingles() is
    # array_distinct per doc, so (id, shingle) rows are already unique
    # — the two dedup shuffles removed here were full-table no-ops
    # (r7; ~1M-row shuffles at sf0.1 for zero semantic effect). The
    # count_distinct aggregate below is insensitive to duplicate
    # corpus rows anyway.
    bench_sh = benchmark.select(
        F.col(id_col).alias("_bid"),
        F.explode(sh).alias("_shingle"),
    )
    corp_sh = corpus.select(
        F.col(id_col).alias(id_col),
        F.explode(sh).alias("_shingle"),
    )
    # Broadcast the benchmark side EXPLICITLY by default: an eval
    # suite doesn't scale with the corpus, so the corpus's exploded
    # (id, shingle) rows should never shuffle for this join. AQE would
    # reach the same join strategy only AFTER writing the corpus
    # side's shuffle map outputs; the static broadcast skips that
    # write entirely (the only shuffle left is the tiny hits
    # aggregation). The broadcast size scales with benchmark SHINGLE
    # volume (docs × tokens), not doc count — a very large suite
    # (tens of millions of exploded shingle rows) should pass
    # broadcast_benchmark=False and let AQE pick the join, rather
    # than force a build past the broadcast limits.
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    return (
        corp_sh.join(bench_sh, on="_shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("_bid").alias("n_bench_hits"))
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "lang",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chop sequence packing: within each shard, documents
    are concatenated in ``id_col`` order and chopped into
    ``budget``-token training sequences. Per doc:
    (id, shard, n_tokens, start_bin, end_bin, start_off) — which
    sequences the doc lands in and at what offset; ``start_bin !=
    end_bin`` means the doc straddles a sequence boundary.

    One shuffle (the shard-partitioned window cumsum); shards pack
    independently and in parallel. Zero-token docs are excluded (they
    occupy no sequence).

    Pass ``n_tokens_col`` to reuse an already-computed token count
    instead of re-tokenizing ``text_col``: composed pipelines (pl02)
    cache a NARROW (id, shard, n_tokens) survivor projection — the
    cache-narrow-reductions rule — and the packing stage must be able
    to consume it without dragging the text column through the cache.
    """
    w = Window.partitionBy(shard_col).orderBy(id_col)
    count_expr = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col
        else F.size(ws_tokens(F.col(text_col))).cast("long")
    )
    # Text path: the cheap rlike(\S) predicate replaces
    # n_tokens > 0 on the derived count (the _minhash_base r11
    # lesson — pushdown substitutes the tokenizer into the scan
    # filter, tokenizing every doc twice). Exactly equivalent:
    # >= 1 ws-token iff one non-\s char. A caller-provided
    # n_tokens_col is a stored column; size on it is cheap.
    if n_tokens_col:
        toks = docs.select(
            id_col,
            shard_col,
            count_expr.alias("n_tokens"),
        ).filter(F.col("n_tokens") > 0)
    else:
        toks = docs.filter(F.col(text_col).rlike(r"\S")).select(
            id_col,
            shard_col,
            count_expr.alias("n_tokens"),
        )
    cum = toks.withColumn("_cum", F.sum("n_tokens").over(w)).withColumn(
        "_start", F.col("_cum") - F.col("n_tokens")
    )
    # integer `div`, not double `/`: exact for arbitrarily deep shards
    return cum.select(
        id_col,
        shard_col,
        "n_tokens",
        F.expr(f"_start div {budget}").alias("start_bin"),
        F.expr(f"(_cum - 1) div {budget}").alias("end_bin"),
        F.pmod(F.col("_start"), F.lit(budget)).cast("long").alias("start_off"),
    )


def chunk_dedup_stats(
    docs: DataFrame,
    chunk_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Repeated-chunk exact dedup (the line/paragraph-level dedup of
    MassiveText/RefinedWeb, adapted to fixed windows because the
    fixture corpus has no line structure): documents are cut into
    non-overlapping ``chunk_tokens``-token chunks (trailing partial
    chunk included) and a chunk INSTANCE is a duplicate iff an earlier
    instance — (doc_id, chunk_idx) lexicographic order — has the same
    md5. Per doc: (id, n_chunks, n_dup_chunks, dup_ratio); downstream
    either drops high-ratio docs or rewrites them keeping only
    first-occurrence chunks.

    Scale: explode to (md5, doc, idx); the first occurrence per hash
    is computed as a partial-aggregable MIN over (doc, idx) structs —
    NOT a row_number window — so a boilerplate chunk repeated millions
    of times combines map-side instead of piling every instance into
    one hot window partition. One shuffle for the min-per-hash, one
    broadcast-or-shuffle equi-join back, one partial-agg group per
    doc. The (hash, first) table is the persistable chunk index (same
    shape as the l28 fingerprint store). Never quadratic.
    """
    # tokens_col: consume a precomputed ws_tokens array instead of
    # re-tokenizing (pl02's shared token base; chunks are built from
    # the raw — not lowered — tokens either way).
    toks = (
        F.col(tokens_col) if tokens_col is not None else ws_tokens(F.col(text_col))
    )
    # With the default text tokenizer, drop token-less docs with the
    # cheap rlike(\S) text predicate instead of size(_toks) > 0 — the
    # derived-column filter is substituted through the projection by
    # predicate pushdown and re-tokenizes every doc at the scan (the
    # _minhash_base r11 lesson; exactly equivalent: >= 1 ws-token iff
    # one non-\s char). A caller-precomputed tokens_col is a stored
    # column, so size() on it is already cheap.
    if tokens_col is None:
        base = docs.filter(F.col(text_col).rlike(r"\S")).select(
            F.col(id_col).alias("_id"), toks.alias("_toks")
        )
    else:
        base = docs.select(
            F.col(id_col).alias("_id"), toks.alias("_toks")
        ).filter(F.size("_toks") > 0)
    n_chunks = F.ceil(F.size("_toks") / F.lit(chunk_tokens)).cast("long")
    inst = base.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("_toks"), i * chunk_tokens + 1, chunk_tokens)
                    )
                ),
            )
        ).alias("chunk_idx", "_h"),
        # ONE explicit _h exchange feeds both consumers below via
        # ReuseExchange (the firsts aggregate and the join-back probe
        # consume identical partitioning), so the tokenize+md5 explode
        # runs once instead of once per branch — the join side was
        # shuffling every instance row on _h anyway, this just stops
        # the aggregate branch from re-deriving the same rows
        # (interleaved A/B at sf0.1: 0.82 → 0.55 s). Skew exposure is
        # unchanged: a boilerplate chunk's instances landed on one _h
        # reducer in both shapes, and the per-row work there is a
        # comparison, so the straggler bound is the hottest chunk's
        # instance count either way.
    ).repartition("_h")
    # first occurrence per hash WITHOUT ranking every instance: the
    # per-hash min (doc, idx) is a partial-aggregable MIN over the
    # already-_h-partitioned rows — no second exchange.
    firsts = inst.groupBy("_h").agg(
        F.min(F.struct("_id", "chunk_idx")).alias("_first")
    )
    flagged = inst.join(firsts, on="_h").withColumn(
        "_dup",
        (
            (F.col("_first._id") != F.col("_id"))
            | (F.col("_first.chunk_idx") != F.col("chunk_idx"))
        ).cast("long"),
    )
    return (
        flagged.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("_dup").alias("n_dup_chunks"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6).alias("dup_ratio"),
        )
    )


def incremental_exact_dedupe(
    batch: DataFrame,
    history: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ingest-time exact dedup of a NEW batch against the historical
    corpus: md5 fingerprint of the normalized text (lowercase,
    whitespace collapse, trim — the l14 canonicalization), anti-join
    against the history fingerprint set, then within-batch
    canonicalization (min id per fingerprint).

    Output: (id, fp) for the surviving novel docs.

    Scale: the history side projects to DISTINCT fingerprints only —
    at 100 TB that is the persisted dedup index (a bucketed md5 store,
    far smaller than the corpus), not a corpus scan; each ingest batch
    is small, so the anti-join broadcasts the batch or probes the
    bucketed store shuffle-free, plus one tiny groupBy on the batch.

    NULL fingerprints (NULL text) are ONE dedup class, null-safely:
    the within-batch canonicalization below already groups them (SQL
    GROUP BY), so the history anti-join must match them too or the
    semantics are inconsistent — a plain equi-anti-join would pass
    every NULL-fp batch doc as "novel" forever (fuzz_oracle nulls
    variant; the l28 oracle's NOT IN had the dual trap of returning
    zero rows). EqualNullSafe stays a hash-joinable equi-key.
    """
    def fp(col: Column) -> Column:
        return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))

    hist = history.select(fp(F.col(text_col)).alias("fp")).dropDuplicates()
    batch_fp = batch.select(
        F.col(id_col).alias("_bid"), fp(F.col(text_col)).alias("fp")
    )
    novel = batch_fp.join(
        hist, on=batch_fp["fp"].eqNullSafe(hist["fp"]), how="left_anti"
    )
    return novel.groupBy("fp").agg(F.min("_bid").alias(id_col)).select(
        id_col, "fp"
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_rows: int | None = None,
) -> DataFrame:
    """Reproducible global shuffle: order by md5 of the stringified id
    (identical in Spark and DuckDB), tiebreak on the id itself. Adds
    ``shuffle_rank`` (1-based). The one unavoidable global ORDERING of
    training-data prep — everything upstream stays partition-local.

    Scale shape: an unpartitioned row_number window would move the
    ENTIRE corpus into one window partition (one task — the straggler
    token_budget_selection's docstring warns about). This is the
    two-phase distributed prefix rank instead: bucket every row by the
    first 3 hex chars of its md5 key (4096 buckets; the bucket is a
    PREFIX of the sort key, so bucket order == global key order),
    cumsum the per-bucket counts in one bounded window, then rank
    within buckets in parallel and add the bucket's offset —
    row-for-row identical to the naive global window (pinned by
    test_deterministic_shuffle_matches_global_window). md5 is uniform,
    so buckets are balanced by construction (~N/4096 rows each).

    NULL ids: md5(NULL) is NULL, and a NULL bucket key would silently
    drop the row at the inner bucket-prefix join (NULL never equals
    NULL in a join). Those rows are bucketed to '' instead — '' sorts
    before '000', and ASC-NULLS-FIRST within the bucket reproduces the
    global window's nulls-first rank 1..k exactly.

    ``n_rows`` is an optional size hint (parquet footer count /
    metastore stats — the same CBO stand-in latency_regime consumes):
    when the input is known to fit one shuffle partition comfortably,
    the single global window IS the right physical plan (the
    two-phase rank's 3 small shuffles cost ~2.5× more at fixture
    scale, measured r8), so small inputs take it and the hint
    saturates to the distributed form at any real corpus size. Both
    forms are row-for-row identical, so the switch is physical-only
    (pinned by test_deterministic_shuffle_matches_global_window)."""
    from sports_betting_data_pipeline_spark.session import (
        _ROWS_PER_PARTITION,
    )

    key = F.md5(F.col(id_col).cast("string").cast("binary"))
    if n_rows is not None and n_rows <= _ROWS_PER_PARTITION:
        w = Window.orderBy(key, F.col(id_col))
        return df.withColumn(
            "shuffle_rank", F.row_number().over(w).cast("long")
        )
    base = df.withColumn(
        "_sk", F.md5(F.col(id_col).cast("string").cast("binary"))
    ).withColumn("_bk", F.coalesce(F.substring("_sk", 1, 3), F.lit("")))
    counts = base.groupBy("_bk").agg(F.count(F.lit(1)).alias("_bn"))
    wb = Window.orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefix = counts.select(
        "_bk", (F.sum("_bn").over(wb) - F.col("_bn")).alias("_before")
    )
    ww = Window.partitionBy("_bk").orderBy(F.col("_sk"), F.col(id_col))
    return (
        base.join(F.broadcast(prefix), on="_bk")
        .withColumn(
            "shuffle_rank",
            (F.col("_before") + F.row_number().over(ww)).cast("long"),
        )
        .drop("_sk", "_bk", "_before")
    )


def temperature_mixture(
    docs: DataFrame,
    group_col: str = "lang",
    n_target: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual/domain
    re-weighting step): group g gets quota ``n_target * w_g / sum(w)``
    with sub-linear weights ``w_g = floor(sqrt(count_g))`` — smaller
    groups are up-weighted relative to their share, the alpha=0.5 point
    of the standard temperature-sampling family.

    All arithmetic is integer-exact (floor(sqrt(int)) is safe in IEEE —
    sqrt is correctly rounded — and the quota is one integer division),
    and within-group selection is the deterministic md5 order, so the
    EXACT sample set reproduces in any engine: no RNG, no float
    boundary flips.

    Output: (id, group, rk) for kept rows. Two shuffles: the tiny
    group-count aggregate (broadcast back) and the per-group rank
    window.
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_c"))
    weights = counts.select(
        group_col, F.floor(F.sqrt(F.col("_c"))).cast("long").alias("_w")
    )
    total_w = weights.agg(F.sum("_w").alias("_tw"))
    quotas = weights.crossJoin(F.broadcast(total_w)).select(
        group_col,
        # integer `div`, not double `/` + cast: the double quotient can
        # land on the wrong side of an integer once n_target × _w
        # exceeds 2^53, and the DuckDB oracle computes `//` (exact
        # floor) — pack_sequences' own integer-div rule applied here.
        # The multiply runs in DECIMAL(38,0): a bigint product would
        # silently wrap past 2^63 in non-ANSI mode — exactly the
        # large-corpus regime this quota targets. The quotient itself
        # is ≤ n_target, so the final LONG cast is always exact.
        F.expr(
            f"CAST((CAST({int(n_target)} AS DECIMAL(19,0))"
            f" * CAST(_w AS DECIMAL(19,0)))"
            f" div CAST(_tw AS DECIMAL(38,0)) AS LONG)"
        ).alias("_quota"),
    )
    key = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    ranked = docs.select(id_col, group_col).withColumn(
        "rk", F.row_number().over(w).cast("long")
    )
    return (
        ranked.join(F.broadcast(quotas), on=group_col)
        .filter(F.col("rk") <= F.col("_quota"))
        .select(id_col, group_col, "rk")
    )

def token_budget_selection(
    docs: DataFrame,
    budget: int = 8000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy quality-first corpus selection under a token budget: rank
    documents by (quality desc, id) and keep them while the running
    token total stays within ``budget`` — the "best docs until the
    budget is spent" rule of curated-subset construction.

    Output: (id, quality, n_tokens, cum_tokens) for kept docs.

    Quality is rounded to 6dp BEFORE ranking so the order (and
    therefore the kept set) is identical in any engine — raw float
    quality would make the cut boundary engine-dependent.

    Scale shape (VERDICT r3 next-#5): the naive form is one global
    single-partition cumsum window over every document — a straggler
    at 100 TB. This implementation is the two-phase distributed prefix
    sum instead:

    1. Aggregate token totals per distinct quality value (map-side
       combinable; the rounded score has at most ~1e6+1 distinct
       values, so the ordered cumsum over THIS aggregate is a
       bounded-size window regardless of corpus size).
    2. Broadcast the per-quality "tokens spent by strictly better
       docs" prefix back, keep only quality levels whose prefix hasn't
       already exhausted the budget (scan-side frontier filter — the
       full-corpus rows never shuffle into a global sort), and finish
       with a PER-QUALITY partitioned window ordered by id.

    cum_tokens = prefix_before(quality) + within-quality running sum,
    row-for-row identical to the naive global window.
    """
    from sports_betting_data_pipeline_spark.functions.text import (
        quality_score,
        ws_token_count,
    )

    scored = docs.select(
        F.col(id_col),
        F.round(quality_score(F.col(text_col)), 6).alias("quality"),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
    )
    q_agg = scored.groupBy("quality").agg(F.sum("n_tokens").alias("_q_tokens"))
    wq = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q_prefix = q_agg.select(
        "quality",
        (F.sum("_q_tokens").over(wq) - F.col("_q_tokens")).alias("_cum_before"),
    )
    frontier = q_prefix.filter(F.col("_cum_before") <= budget)
    ww = Window.partitionBy("quality").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        scored.join(F.broadcast(frontier), on="quality")
        .withColumn(
            "cum_tokens", F.col("_cum_before") + F.sum("n_tokens").over(ww)
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, "quality", "n_tokens", "cum_tokens")
    )
