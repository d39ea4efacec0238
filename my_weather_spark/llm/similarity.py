"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one pass over the corpus
per query batch, no index. Scale path: IVF-style bucketed search —
assign corpus vectors to nearest of C centroid buckets once (an
O(N*C) map-side pass), then probe only the best few buckets per query.

All distance math is built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python in the hot path.
Accumulation is sequential double over the array order, which keeps
results reproducible across engines.

Scale notes (100 TB): queries are broadcast (a query batch is small by
definition); the corpus stays partitioned — the cross join is a
broadcast nested loop whose cost is (corpus x queries) dot products,
embarrassingly parallel. The IVF variant cuts the scanned fraction to
nprobe/C. For billion-vector corpora you'd persist the bucketed corpus
sorted by centroid_id so bucket probes are partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ----------------------------------------------------------------------
def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Output: (query_id, neighbor_id, cos, rank). Self-matches excluded.
    Ties broken by neighbor_id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    from my_weather_spark.llm.dedup import _fan_out

    scored = (
        _fan_out(c).join(F.broadcast(q))  # broadcast NL: corpus stays distributed
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def cosine_threshold_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, neighbor) pairs with cosine >= threshold — the
    embedding near-dup primitive (rank-free, so fully order-stable).

    Implementation: the query side is collected to a dense matrix and
    broadcast; each Arrow batch of the corpus does ONE BLAS matrix
    product against it (mapInPandas), emitting only over-threshold
    pairs. This is the standard block-matrix similarity pattern: the
    corpus never shuffles, work is (corpus x queries) fused
    multiply-adds, and the emitted pair set is sparse. The query side
    must be broadcast-sized (it is, by definition of a near-dup/query
    batch); for corpus-x-corpus at 100 TB you'd tile the right side
    into broadcastable column blocks and union the per-block outputs.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    q_pdf = queries.select(id_col, vec_col).toPandas()
    q_ids = q_pdf[id_col].to_numpy()
    q_mat = np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def _score(batches):
        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = np.round(c_mat @ mat.T, 6)
            # pair order: query_id < neighbor_id (corpus row is neighbor)
            mask = (sims >= threshold) & (ids[None, :] < c_ids[:, None])
            ci, qi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "query_id": ids[qi],
                    "neighbor_id": c_ids[ci],
                    "cos": sims[ci, qi],
                }
            )

    from my_weather_spark.llm.dedup import _fan_out

    return _fan_out(corpus.select(id_col, vec_col)).mapInPandas(
        _score, schema="query_id long, neighbor_id long, cos double"
    )


# ----------------------------------------------------------------------
# IVF-style bucketed ANN (the scale path).
def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (by cosine).
    Centroids are broadcast; one shuffle-free map pass over the corpus.
    """
    cent = centroids.select(
        F.col(centroid_id_col).alias("_cid"), F.col(vec_col).alias("_centv")
    )
    scored = corpus.join(F.broadcast(cent)).withColumn(
        "_sim", cosine(F.col(vec_col), F.col("_centv"))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("_cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, F.col("_cid").alias(centroid_id_col))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroid buckets
    per query, exact cosine within the probed buckets only.

    At scale the bucketed corpus is precomputed + persisted
    (ivf_assign), making this a pruned scan of nprobe/C of the data.
    """
    bucketed = ivf_assign(corpus, centroids, id_col, vec_col)
    cent = centroids.select(
        F.col("centroid_id").alias("_cid"), F.col(vec_col).alias("_centv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    qprobe = (
        q.join(F.broadcast(cent))
        .withColumn("_sim", cosine(F.col("_qv"), F.col("_centv")))
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("_cid"))
            ),
        )
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", F.col("_cid").alias("centroid_id"))
    )
    scored = (
        bucketed.join(F.broadcast(qprobe), "centroid_id")
        .where(F.col("query_id") != F.col(id_col))
        .withColumn("cos", cosine(F.col("_qv"), F.col(vec_col)))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round("cos", 6).alias("cos"),
            "rank",
        )
    )
