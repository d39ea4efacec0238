"""Exact-arithmetic distributed k-means (Lloyd) over embedding columns.

Real Lloyd iterations — not the ticket-anchor shortcut that
similarity.semantic_dedup / ivf_centroids use — made deterministic,
repartition-invariant, and bit-replayable by a SQL oracle through one
trick: ALL algorithm state is integer. Embeddings are quantized once
(``floor(x*1000 + 0.5)`` — pure IEEE double ops, identical in Spark and
DuckDB), distances and per-cluster partial sums are exact int64 (integer
addition commutes, so Spark's nondeterministic reduce order cannot
perturb anything), and the centroid update rounds the integer mean back
to the grid with the same portable ``floor(s/n + 0.5)`` (int64→double is
exact below 2^53, IEEE division is deterministic). A float k-means would
hash-differ run to run on sum order alone; this one is exact at any
parallelism — the property that lets the driver verify real clustering
against DuckDB. Quantization error is bounded by half a grid cell
(5e-4 per coordinate at the default scale) — immaterial next to k-means'
own local-optimum variance for curation workloads.

Why k-means in a training-data engine: cluster-based domain discovery
and mixing (e.g. cluster the corpus embeddings, then set per-cluster
sampling rates — the "cluster then balance" recipe used by DataComp/
DoReMi-style curation), and as the published centroid trainer behind
IVF/SemDeDup partitioning.

Scale shape (100 TB corpus, k clusters, T iterations):
- the corpus is scanned T+1 times (T partial-sum passes + the final
  labeling pass), each a NARROW Arrow-batched map — no shuffle, no
  join, no window anywhere in the plan;
- each pass reduces to <= k rows per Arrow batch (cluster, count,
  per-dimension sum vector); only those k x n_batches summary rows —
  bounded metadata, same class as ranking.py's partition boundaries —
  reach the driver, which combines them in numpy int64 and rebroadcasts
  the k x dim centroid table;
- the quantized corpus is localCheckpointed once so iterations re-read
  the compact int64 form, not the raw parquet (at cluster scale:
  persist at MEMORY_AND_DISK — the standard iterative-ML cache).

Reference parity note: the reference engine has no clustering tier;
this extends the LLM-curation surface (SURVEY.md LLM-ops section)
alongside dedup/decontam/DSIR.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_weather_spark.llm.sampling import _ticket

DEFAULT_SCALE = 1000


def quantize_vec(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """array<float> -> array<bigint> on a 1/scale grid: element-wise
    ``floor(cast(x as double) * scale + 0.5)`` — round-half-up for
    either sign, and the exact op sequence the DuckDB oracle replays
    (float->double widening is exact; double multiply/add/floor are
    IEEE-identical across engines)."""
    s = F.lit(float(scale))
    return F.transform(col, lambda x: F.floor(x.cast("double") * s + F.lit(0.5)))


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    seed: str = "kmeans",
    scale: int = DEFAULT_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means, exact integer arithmetic: returns
    (id_col, cluster int, d2 bigint) — the final nearest-centroid
    assignment and its squared quantized distance for every row with a
    non-NULL vector.

    Init: the k rows with the smallest md5 hash ticket (repo-wide
    ``md5(seed || id) % 1e6`` construction, ties by id) seed centroids
    0..k-1 in (ticket, id) order — deterministic and engine-replayable
    (orderBy+limit plans TakeOrderedAndProject, per-partition top-k).
    Then ``iters`` rounds of: assign each vector to the argmin-d2
    centroid (ties -> lowest cluster index), recompute each centroid as
    the rounded integer mean of its members (empty cluster keeps its
    previous centroid). The output labels come from one final assign
    pass against the post-update centroids.

    Every pass is a narrow mapInPandas; per-iteration driver traffic is
    the k x dim int centroid table both ways (bounded metadata).
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    spark = corpus.sparkSession
    id_type = corpus.schema[id_col].dataType.simpleString()
    q = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(id_col, quantize_vec(F.col(vec_col), scale).alias("_qv"))
        .localCheckpoint()
    )

    seeds = (
        q.orderBy(_ticket(id_col, seed), F.col(id_col))
        .limit(k)
        .collect()
    )
    empty_schema = f"{id_col} {id_type}, cluster int, d2 bigint"
    if not seeds:
        return spark.createDataFrame([], empty_schema)
    cents = np.stack([np.asarray(r["_qv"], dtype=np.int64) for r in seeds])

    def _dist2(A: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
        # exact int64: block the (rows x k x dim) broadcast subtract so
        # a full Arrow batch never materializes a giant intermediate
        out = np.empty((A.shape[0], C.shape[0]), dtype=np.int64)
        for lo in range(0, A.shape[0], 2048):
            blk = A[lo : lo + 2048]
            d = blk[:, None, :] - C[None, :, :]
            out[lo : lo + 2048] = np.einsum("ijk,ijk->ij", d, d)
        return out

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def _partials(batches):
            import pandas as pd

            C = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                A = np.stack(pdf["_qv"].to_numpy()).astype(np.int64)
                best = np.argmin(_dist2(A, C), axis=1)  # ties -> lowest idx
                rows = []
                for c in np.unique(best):
                    sel = A[best == c]
                    rows.append(
                        (int(c), int(sel.shape[0]), sel.sum(axis=0).tolist())
                    )
                yield pd.DataFrame(rows, columns=["cluster", "n", "s"])

        parts = q.mapInPandas(
            _partials, "cluster int, n long, s array<long>"
        ).collect()  # <= k rows per Arrow batch — bounded metadata
        bc.destroy()
        if parts:
            sums = np.zeros_like(cents)
            counts = np.zeros(cents.shape[0], dtype=np.int64)
            for r in parts:
                sums[r["cluster"]] += np.asarray(r["s"], dtype=np.int64)
                counts[r["cluster"]] += r["n"]
            nz = counts > 0
            upd = np.floor(
                sums[nz].astype(np.float64) / counts[nz, None] + 0.5
            ).astype(np.int64)
            cents = cents.copy()
            cents[nz] = upd  # empty clusters keep their previous centroid

    bc = spark.sparkContext.broadcast(cents)

    def _label(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["_qv"].to_numpy()).astype(np.int64)
            d2 = _dist2(A, C)
            best = np.argmin(d2, axis=1)
            out = pd.DataFrame({id_col: pdf[id_col]})
            out["cluster"] = best.astype("int32")
            out["d2"] = d2[np.arange(len(best)), best]
            yield out

    return q.mapInPandas(_label, empty_schema)


def cluster_profile(
    assigned: DataFrame,
    meta: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """(cluster, group_col, n) — cluster composition against any
    document attribute (label, source, lang): the domain-discovery
    readout that turns k-means output into per-cluster mixing rates.
    One broadcast-friendly join (assignment side is (id, cluster) only)
    + one map-side-combined count aggregate."""
    return (
        assigned.select(id_col, "cluster")
        .join(meta.select(id_col, group_col), id_col)
        .groupBy("cluster", group_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
