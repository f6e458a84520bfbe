"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k (the exact baseline) and an LSH-bucketed
approximate variant (the scale path).

Scale design:
- Brute force is exact and O(n_queries × n_vectors): correct choice
  when the query set is small (broadcast the queries, scan the corpus
  once, JVM-side dot products, per-partition top-k via window). At
  100 TB corpus scale this is the "re-rank" stage, not the retrieval
  stage.
- Random-hyperplane LSH: sign-projection signatures computed scan-side
  against a broadcast seeded projection matrix; candidates come from an
  equi-join on bucket id, then exact cosine re-ranks. Recall is tuned
  by bits/tables; no cross join at any scale.
- All dot products run in double precision via zip_with+aggregate —
  built-in expressions, codegen'd, no Python in the loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Output: (query_id, vec_id, cosine_sim, rank), rank 1..k per query,
    deterministic tiebreak on vec_id. The corpus scans once; the only
    shuffle is the per-query top-k window, whose input Spark prunes
    with WindowGroupLimit.
    """
    joined = corpus.crossJoin(
        F.broadcast(queries.select(query_id_col, query_vec_col))
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


def _projection_literals(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Seeded random hyperplanes (deterministic across runs/partitions)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-projection bucket id: bit i = (vec · plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(float(v)) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-ranks. Recall < 1 by construction; raise ``bits``
    for precision of buckets, add multi-table probing for recall.

    Output: (query_id, vec_id, cosine_sim, rank) within-bucket.
    """
    planes = _projection_literals(dim, bits, seed)
    corpus_b = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    queries_b = queries.withColumn(
        "_bucket", lsh_bucket(F.col(query_vec_col), planes)
    )
    joined = corpus_b.join(
        F.broadcast(queries_b.select(query_id_col, query_vec_col, "_bucket")),
        on="_bucket",
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-TABLE
    (OR-amplified) sign-projection LSH, mirroring the MinHash band
    construction (functions/dedup.py): a pair is a candidate if it
    collides in ANY of ``tables`` independent b-bit tables; candidates
    are deduped, then verified with exact cosine.

    Why multi-table: one table loses any pair straddling a single
    hyperplane (recall (1 - θ/π)^bits ≈ 0.43 at cosine 0.95 with 8
    bits); with T independent tables the miss probability is raised to
    the T-th power — (1 - p^b)^T ≈ 1% at T=8 for cosine 0.95, ~1e-5
    for near-identical vectors. It also breaks up skew: a clustered
    corpus piles into ONE hot bucket under a single table, but each
    table splits the cluster differently, and the candidate join
    shuffles only narrow (table_id, bucket, id) rows — the per-bucket
    join stays local and the pair dedup collapses multi-table hits.

    Output: (id_a, id_b, cosine_sim), id_a < id_b, cosine >= threshold.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
    )
    all_planes = [_projection_literals(dim, bits, seed + t) for t in range(tables)]
    # All tables*bits projections in ONE pass (V @ P^T): posexplode the
    # vector, broadcast-join the plane matrix as a dim-row table, and
    # reduce with plain SUM(val * w_j) aggregates — whole-stage
    # codegen'd multiply-adds. Both the expression form (interpreted
    # `aggregate` fold per plane per row) and element_at on per-row
    # array literals measured ~10x slower at 64 planes — same lesson
    # as simhash_signatures.
    flat_planes = [p for planes in all_planes for p in planes]
    n_planes = len(flat_planes)
    planes_df = df.sparkSession.createDataFrame(
        [
            tuple([i] + [float(flat_planes[j][i]) for j in range(n_planes)])
            for i in range(dim)
        ],
        ["_pos"] + [f"_w{j}" for j in range(n_planes)],
    )
    pos = base.select("_id", F.posexplode("_vec").alias("_pos", "_val"))
    projs = (
        pos.join(F.broadcast(planes_df), on="_pos")
        .groupBy("_id")
        .agg(
            *[
                F.sum(F.col("_val").cast("double") * F.col(f"_w{j}")).alias(f"_p{j}")
                for j in range(n_planes)
            ]
        )
    )
    buckets = projs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        sum(
                            (
                                F.when(
                                    F.col(f"_p{t * bits + i}") > 0,
                                    F.lit(1 << i).cast("long"),
                                ).otherwise(F.lit(0).cast("long"))
                            )
                            for i in range(bits)
                        ).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("_t"),
    ).select("_id", "_t.table_id", "_t.bucket")

    pairs = (
        buckets.select("table_id", "bucket", F.col("_id").alias("id_a"))
        .join(
            buckets.select("table_id", "bucket", F.col("_id").alias("id_b")),
            on=["table_id", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])  # collapse multi-table collisions
    )
    vec_a = base.select(F.col("_id").alias("id_a"), F.col("_vec").alias("vec_a"))
    vec_b = base.select(F.col("_id").alias("id_b"), F.col("_vec").alias("vec_b"))
    return (
        pairs.join(vec_a, on="id_a")
        .join(vec_b, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Train a k-means‖ coarse quantizer over the corpus (MLlib
    KMeans, fixed seed → deterministic init and assignment given the
    same data). Returns (cent_id, cv: array<double>) — the drop-in
    centroid table for :func:`ivf_topk`.

    Scale: MLlib KMeans is the distributed Lloyd's loop (broadcast
    centroids, map-side assignment, reduce new means) — linear scans
    per iteration, no shuffle growth with corpus size.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(feats)
    spark = corpus.sparkSession
    cent_rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(cent_rows, ["cent_id", "cv"]).select(
        "cent_id", F.col("cv").cast("array<double>").alias("cv")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    centroid cells, probe only the ``nprobe`` cells nearest each
    query, exact-rank the candidates.

    The default coarse quantizer is the first ``n_centroids`` corpus
    vectors (deterministic, so the DuckDB oracle can reproduce cell
    assignment bit-for-bit — this is the oracle path). Pass
    ``centroids=kmeans_centroids(corpus, ...)`` for the production
    quantizer: trained cells are tighter, so the same nprobe recovers
    more true neighbors (recall@k improvement pinned in
    tests/test_llm_ops.py). Every plan shape below is identical.

    Scale: assignment is a broadcast of C centroid vectors + C
    cosine evaluations per corpus row (map-side, one pass); the
    search join touches ~(nprobe/C) of the corpus per query instead
    of all of it — the whole point of IVF at 10^9+ vectors. Shuffles:
    one hash join on cent_id + the final per-query top-k window.
    """
    if centroids is not None:
        cents = centroids.select("cent_id", F.col("cv").cast("array<double>").alias("cv"))
    else:
        cents = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv")
        )

    def nearest_cells(df: DataFrame, df_id: str, df_vec: str, n: int) -> DataFrame:
        sims = df.crossJoin(F.broadcast(cents)).select(
            F.col(df_id),
            F.col(df_vec),
            F.col("cent_id"),
            cosine(F.col(df_vec), F.col("cv")).alias("_csim"),
        )
        w = Window.partitionBy(df_id).orderBy(
            F.col("_csim").desc(), F.col("cent_id")
        )
        return (
            sims.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_csim", "_rn")
        )

    assigned = nearest_cells(corpus, id_col, vec_col, 1)
    probes = nearest_cells(queries, query_id_col, query_vec_col, nprobe)

    cands = probes.join(assigned, on="cent_id").select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("cosine_sim", 6).alias("cosine_sim"),
            "rank",
        )
    )
