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
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join.

    Docs whose vectors land in the same sign-projection bucket are
    compared exactly; pairs with cosine >= threshold survive. Output:
    (id_a, id_b, cosine_sim), id_a < id_b.
    """
    planes = _projection_literals(dim, bits, seed)
    with_bucket = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    left = with_bucket.select(
        "_bucket", F.col("_id").alias("id_a"), F.col("_vec").alias("vec_a")
    )
    right = with_bucket.select(
        "_bucket", F.col("_id").alias("id_b"), F.col("_vec").alias("vec_b")
    )
    return (
        left.join(right, on="_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
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
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    centroid cells, probe only the ``nprobe`` cells nearest each
    query, exact-rank the candidates.

    The coarse quantizer here is the first ``n_centroids`` corpus
    vectors (deterministic, so the DuckDB oracle can reproduce cell
    assignment bit-for-bit); production would swap in k-means
    centroids — every plan shape below is identical.

    Scale: assignment is a broadcast of C centroid vectors + C
    cosine evaluations per corpus row (map-side, one pass); the
    search join touches ~(nprobe/C) of the corpus per query instead
    of all of it — the whole point of IVF at 10^9+ vectors. Shuffles:
    one hash join on cent_id + the final per-query top-k window.
    """
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
