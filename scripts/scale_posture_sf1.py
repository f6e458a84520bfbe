#!/usr/bin/env python3
"""100×-posture demo (VERDICT r6 #9): run the two headline dedup/corpus
pipelines (l22 LSH dedup clusters, pl02 corpus assembly) at sf1-scale
documents (10× sf0.1 = 50k docs) with the exact catalog plans, and
confirm (a) wall-clock scales ~linearly with the corpus, (b) the plan
SHAPE is unchanged (no BNLJ/cartesian appears at the bigger size —
AQE/stats cannot flip these plans into a quadratic strategy), (c) the
connected-components job count stays at its small-diameter floor.

The scaled corpus is the sf0.1 documents table replicated 10× with
disjoint doc_id ranges and a replica-tag token appended to every
text. The tag keeps replicas from collapsing as EXACT duplicates but
they remain near-dups of each other (one token changed out of ~200:
Jaccard ≈ 0.99), so the corpus is adversarially duplicate-heavy —
every doc sits in a 10-clique across replicas (~250k verified edges
vs 249 at sf0.1, measured). That is the HARD case for LSH dedup
(dense buckets) and exactly the regime collapse_exact/banding were
designed for; the demo shows candidate generation stays bucket-
bounded and CC stays at its small-diameter job floor anyway. Output
parquet lands under /tmp (the fixture tree is read-only).

Usage: python scripts/scale_posture_sf1.py  — prints one timing line
per pipeline per scale; numbers land in SCALE.md §Round-7.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from sports_betting_data_pipeline_spark.io import load_table  # noqa: E402
from sports_betting_data_pipeline_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark_graft_sf1_demo"
REPLICAS = 10


def build_sf1_documents(spark) -> str:
    out = os.path.join(SCRATCH, "documents.parquet")
    if os.path.isdir(out):
        return SCRATCH
    docs = load_table(spark, SF01, "documents")
    base_cols = docs.columns
    reps = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_r"),
        *base_cols,
    )
    scaled = reps.select(
        (F.col("doc_id") + F.col("_r") * F.lit(10_000_000)).alias("doc_id"),
        *[c for c in base_cols if c not in ("doc_id", "text")],
        F.concat_ws(" ", F.col("text"), F.concat(F.lit("replicatag"), F.col("_r"))).alias(
            "text"
        ),
    )
    scaled.repartition(16).write.mode("overwrite").parquet(out)
    return SCRATCH


def build_sf1_embeddings(spark) -> str:
    """10× embeddings (20k vectors) for the ANN-family posture runs:
    replicas get disjoint vec_id ranges and a tiny deterministic
    per-replica perturbation on coordinate 0 (r × 1e-3), so no two
    replicas are bit-identical vectors but the cell geometry barely
    moves — the IVF quantizer faces 10× the corpus in every cell, the
    realistic density scale-up rather than 10× empty space."""
    out = os.path.join(SCRATCH, "embeddings.parquet")
    if os.path.isdir(out):
        return SCRATCH
    emb = load_table(spark, SF01, "embeddings")
    base_cols = emb.columns
    reps = emb.select(
        F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_r"),
        *base_cols,
    )
    scaled = reps.select(
        (F.col("vec_id") + F.col("_r") * F.lit(10_000_000)).alias("vec_id"),
        *[c for c in base_cols if c not in ("vec_id", "embedding")],
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(
                i == 0, x + F.col("_r").cast("float") * F.lit(0.001)
            ).otherwise(x),
        ).cast("array<float>").alias("embedding"),
    )
    scaled.repartition(16).write.mode("overwrite").parquet(out)
    return SCRATCH


def build_sf1_events(spark) -> str:
    """10× events (1M rows) for the streaming-family posture runs:
    replicas get disjoint event_id ranges AND disjoint user_id ranges
    (10× keys, not 10× density on the same 150 users) — stateful
    operators face 10× the state rows and 10× the Arrow transfer, the
    honest scale-up for O(users)-state designs. Timestamps are kept
    verbatim so watermark/window semantics see the same time range at
    10× per-window density."""
    out = os.path.join(SCRATCH, "events.parquet")
    if os.path.isdir(out):
        return SCRATCH
    ev = load_table(spark, SF01, "events")
    base_cols = ev.columns
    reps = ev.select(
        F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_r"),
        *base_cols,
    )
    scaled = reps.select(
        (F.col("event_id") + F.col("_r") * F.lit(100_000_000)).alias("event_id"),
        (F.col("user_id") + F.col("_r") * F.lit(1_000_000)).alias("user_id"),
        *[c for c in base_cols if c not in ("event_id", "user_id")],
    )
    scaled.repartition(16).write.mode("overwrite").parquet(out)
    return SCRATCH


def streaming_posture(spark, sf1_dir: str) -> None:
    """VERDICT r7 next-#4: replay the Arrow-stateful trio + one
    windowed query at 10× rows/keys; confirm Arrow transfer scales
    ~linearly and state_partitions=16 still wins at 10× keys."""
    from sports_betting_data_pipeline_spark.plans.q_streaming import (
        st01_tumbling_window,
        st06_stateful_user_stats,
        st13_threshold_alerts,
        st15_stream_anomalies,
    )
    from sports_betting_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_table,
        threshold_alerts,
    )

    # warm the streaming engine + Arrow workers before timing
    st01_tumbling_window(spark, SF01).count()
    st13_threshold_alerts(spark, SF01).count()

    for name, fn in (
        ("st01_tumbling_window", st01_tumbling_window),
        ("st06_stateful_user_stats", st06_stateful_user_stats),
        ("st13_threshold_alerts", st13_threshold_alerts),
        ("st15_stream_anomalies", st15_stream_anomalies),
    ):
        for tag, d in (("sf0.1", SF01), ("sf1", sf1_dir)):
            t0 = time.time()
            rows = fn(spark, d).count()
            dt = time.time() - t0
            print(f"{name} @ {tag}: {dt:.2f}s rows={rows}", flush=True)

    # state-partition sweep at 10× keys (st13 shape, the r7-measured
    # pin): each state partition costs a state-store instance + an
    # Arrow worker; the winner should hold or move UP with more keys,
    # never down.
    for parts in (8, 16, 32):
        t0 = time.time()
        rows = run_stream_to_table(
            threshold_alerts(read_events_stream(spark, sf1_dir)),
            f"posture_st13_p{parts}",
            output_mode="update",
            state_partitions=parts,
        ).count()
        dt = time.time() - t0
        print(
            f"st13 @ sf1 state_partitions={parts}: {dt:.2f}s rows={rows}",
            flush=True,
        )


def text_corpus_posture(spark, sf1_dir: str) -> None:
    """Text-analysis/corpus-assembly family at 10x docs: BM25's
    posting-list joins (l35), decontamination's shingle anti-joins
    (l24), and token-budget selection's distributed prefix sums (l33)
    — the three distinct shuffle shapes of the family. Gate: the
    quadratic plan-node counts must not change with scale and
    wall-clock must stay sub-linear-ish (every stage is equi-join /
    partial-agg work that grows with the corpus, never with its
    square)."""
    from sports_betting_data_pipeline_spark.plans.q_llm import (
        l24_decontamination,
        l33_token_budget,
        l35_bm25_topk,
    )

    nodes = ("CartesianProduct", "BroadcastNestedLoopJoin")
    for fn in (l35_bm25_topk, l24_decontamination, l33_token_budget):
        fn(spark, SF01).count()  # warm codegen for the baseline
    for name, fn in (
        ("l35_bm25_topk", l35_bm25_topk),
        ("l24_decontamination", l24_decontamination),
        ("l33_token_budget", l33_token_budget),
    ):
        shapes = {}
        for tag, d in (("sf0.1", SF01), ("sf1", sf1_dir)):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, d)
            rows = df.count()
            dt = time.time() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
            shapes[tag] = {k: plan.count(k) for k in nodes}
            print(
                f"{name} @ {tag}: {dt:.2f}s rows={rows} "
                f"quad_nodes={shapes[tag]}",
                flush=True,
            )
        same = all(shapes["sf0.1"][k] == shapes["sf1"][k] for k in nodes)
        print(
            f"{name}: quadratic plan nodes "
            f"{'UNCHANGED' if same else 'DIFFER (check!)'} across 10x scale",
            flush=True,
        )


def main() -> None:
    # optional section filter: `batch`, `streaming`, `text`, or `all`
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="scale_posture_sf1")
    sf1_dir = build_sf1_documents(spark)
    build_sf1_embeddings(spark)
    build_sf1_events(spark)
    if section == "streaming":
        streaming_posture(spark, sf1_dir)
        return
    if section == "text":
        text_corpus_posture(spark, sf1_dir)
        return

    from sports_betting_data_pipeline_spark.plans.q_llm import (
        l22_lsh_dedup_clusters,
        l36_ann_ivfpq,
        l43_bitext_mining_ann,
        pl02_corpus_assembly,
    )

    nodes = (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
    )

    # warm the JVM/codegen so the sf0.1 baseline is not charged for it
    spark.catalog.clearCache()
    l22_lsh_dedup_clusters(spark, SF01).count()
    pl02_corpus_assembly(spark, SF01).count()
    l36_ann_ivfpq(spark, SF01).count()
    l43_bitext_mining_ann(spark, SF01).count()

    for name, fn in (
        ("l22_lsh_dedup_clusters", l22_lsh_dedup_clusters),
        ("pl02_corpus_assembly", pl02_corpus_assembly),
        # ANN family: the BNLJ counts reported are the whitelisted
        # C-row centroid-assignment broadcasts (the IVF shape) and
        # must stay CONSTANT across scale — candidate scoring itself
        # is cell-pruned equi-join work that grows with the corpus.
        ("l36_ann_ivfpq", l36_ann_ivfpq),
        ("l43_bitext_mining_ann", l43_bitext_mining_ann),
    ):
        shapes = {}
        for tag, d in (("sf0.1", SF01), ("sf1", sf1_dir)):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, d)
            rows = df.count()
            dt = time.time() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
            shapes[tag] = {k: plan.count(k) for k in nodes}
            print(
                f"{name} @ {tag}: {dt:.2f}s rows={rows} "
                f"join_nodes={shapes[tag]}",
                flush=True,
            )
        # Parity gate: the QUADRATIC node counts must not change with
        # scale (a BNLJ appearing at sf1 would mean stats flipped a
        # join into a non-scalable strategy — pl02's constant 4 BNLJs
        # are its whitelisted 1-row scalar quota joins). Hash↔merge
        # flips are AQE size-based strategy selection working as
        # designed and are reported informationally above.
        quad_keys = ("CartesianProduct", "BroadcastNestedLoopJoin")
        same = all(
            shapes["sf0.1"][k] == shapes["sf1"][k] for k in quad_keys
        )
        print(
            f"{name}: quadratic plan nodes "
            f"{'UNCHANGED' if same else 'DIFFER (check!)'} across 10x scale",
            flush=True,
        )

    text_corpus_posture(spark, sf1_dir)
    streaming_posture(spark, sf1_dir)


if __name__ == "__main__":
    main()
