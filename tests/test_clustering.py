"""Exact-arithmetic Lloyd k-means (llm/clustering.py) — bit-equality vs
a pure-numpy replay, repartition invariance, empty-cluster handling,
degenerate shapes, and the cluster_profile readout."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from my_weather_spark.llm import clustering

SEED = "kmtest"
SCALE = 1000


def _ticket(i: int, seed: str = SEED) -> int:
    h = hashlib.md5((seed + str(i)).encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def _ref_kmeans(ids, vecs, k, iters, seed=SEED):
    """Pure-numpy replay of the documented algorithm (quantize, ticket
    init, argmin-d2 assign with lowest-index ties, rounded integer-mean
    update, empty cluster keeps centroid)."""
    ids = np.asarray(ids)
    Q = np.floor(np.asarray(vecs, dtype=np.float64) * SCALE + 0.5).astype(np.int64)
    tk = np.array([_ticket(int(i), seed) for i in ids])
    order = np.lexsort((ids, tk))[:k]
    cents = Q[order].copy()

    def assign(C):
        d = Q[:, None, :] - C[None, :, :]
        d2 = np.einsum("ijk,ijk->ij", d, d)
        best = np.argmin(d2, axis=1)
        return best, d2[np.arange(len(best)), best]

    for _ in range(iters):
        best, _ = assign(cents)
        for c in range(len(cents)):
            sel = Q[best == c]
            if len(sel):
                cents[c] = np.floor(
                    sel.sum(axis=0).astype(np.float64) / len(sel) + 0.5
                ).astype(np.int64)
    best, d2 = assign(cents)
    return {int(i): (int(b), int(d)) for i, b, d in zip(ids, best, d2)}, cents


def _mkvecs(spark, n=60, dim=6, seed=7, n_parts=1):
    rng = np.random.default_rng(seed)
    # two displaced blobs so the clustering is non-trivial
    vecs = rng.normal(0, 0.1, (n, dim))
    vecs[n // 2:] += 0.4
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    if n_parts > 1:
        df = df.repartition(n_parts)
    # the reference must quantize the same float32-widened doubles the
    # engine sees, so round-trip through the declared float schema
    return df, [r.vec_id for r in df.orderBy("vec_id").collect()], np.stack(
        [np.asarray(r.embedding, dtype=np.float64)
         for r in df.orderBy("vec_id").collect()]
    )


def test_kmeans_matches_numpy_reference(spark):
    df, ids, vecs = _mkvecs(spark)
    ref, _ = _ref_kmeans(ids, vecs, k=4, iters=2)
    out = clustering.kmeans_assign(df, k=4, iters=2, seed=SEED).collect()
    got = {int(r.vec_id): (int(r.cluster), int(r.d2)) for r in out}
    assert got == ref


def test_kmeans_repartition_invariant(spark):
    """Integer state makes the result independent of partitioning —
    the property float k-means cannot have (sum-order noise)."""
    df1, ids, vecs = _mkvecs(spark, n_parts=1)
    df7, _, _ = _mkvecs(spark, n_parts=7)
    a = {(int(r.vec_id), int(r.cluster), int(r.d2))
         for r in clustering.kmeans_assign(df1, k=4, iters=3, seed=SEED).collect()}
    b = {(int(r.vec_id), int(r.cluster), int(r.d2))
         for r in clustering.kmeans_assign(df7, k=4, iters=3, seed=SEED).collect()}
    assert a == b


def test_kmeans_iters_zero_assigns_to_seeds(spark):
    """iters=0 labels against the raw ticket-seeded centroids."""
    df, ids, vecs = _mkvecs(spark, n=20)
    ref, _ = _ref_kmeans(ids, vecs, k=3, iters=0)
    out = clustering.kmeans_assign(df, k=3, iters=0, seed=SEED).collect()
    got = {int(r.vec_id): (int(r.cluster), int(r.d2)) for r in out}
    assert got == ref


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A seed whose cluster empties keeps its previous centroid: one
    far outlier seeds a cluster, then every point (including the
    outlier, pulled by majority mass in this directed layout) assigns
    elsewhere — the empty cluster must not produce NaN/garbage and the
    run must match the numpy replay exactly."""
    # 1 outlier + a tight blob; k=2, the outlier is a seed by ticket
    # construction in at least one of the two seed slots
    vecs = np.zeros((12, 3))
    vecs[0] = [9.0, 9.0, 9.0]
    vecs[1:] = np.linspace(0.0, 0.05, 11)[:, None]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ids = list(range(12))
    ref, _ = _ref_kmeans(ids, vecs, k=2, iters=4)
    out = clustering.kmeans_assign(df, k=2, iters=4, seed=SEED).collect()
    got = {int(r.vec_id): (int(r.cluster), int(r.d2)) for r in out}
    assert got == ref


def test_kmeans_k_exceeds_corpus(spark):
    df, ids, vecs = _mkvecs(spark, n=3)
    ref, _ = _ref_kmeans(ids, vecs, k=8, iters=2)  # only 3 seeds exist
    out = clustering.kmeans_assign(df, k=8, iters=2, seed=SEED).collect()
    got = {int(r.vec_id): (int(r.cluster), int(r.d2)) for r in out}
    assert got == ref
    assert len(got) == 3


def test_kmeans_null_vectors_dropped(spark):
    df = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, None), (2, [0.3, 0.1])],
        "vec_id long, embedding array<float>",
    )
    out = clustering.kmeans_assign(df, k=2, iters=1, seed=SEED).collect()
    assert sorted(r.vec_id for r in out) == [0, 2]


def test_kmeans_empty_corpus(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = clustering.kmeans_assign(df, k=2, iters=1, seed=SEED)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cluster", "d2"]


def test_kmeans_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, [0.1])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="k must be"):
        clustering.kmeans_assign(df, k=0)
    with pytest.raises(ValueError, match="iters must be"):
        clustering.kmeans_assign(df, iters=-1)


def test_quantize_vec_half_up_both_signs(spark):
    # double column: a float32 0.0005 is NOT exactly 0.0005, so ties
    # can only be demonstrated on exactly-representable doubles (the
    # engine path widens float32 -> double first, identically in the
    # SQL oracle, so whatever double arrives is what both sides round)
    df = spark.createDataFrame(
        [([0.0005, -0.0005, 0.0014, -0.0016],)], "v array<double>"
    )
    [row] = df.select(clustering.quantize_vec(F.col("v")).alias("q")).collect()
    # floor(x*1000 + 0.5): 0.5 -> 1 (half-up), -0.5 -> 0 (half-up =
    # toward +inf for negatives), 1.4... -> 1, -1.6 -> -2
    assert row.q == [1, 0, 1, -2]


def test_cluster_profile(spark):
    assigned = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "vec_id long, cluster int"
    )
    meta = spark.createDataFrame(
        [(0, "web"), (1, "book"), (2, "web")], "vec_id long, label string"
    )
    got = {
        (r.cluster, r.label): r.n
        for r in clustering.cluster_profile(assigned, meta, "label").collect()
    }
    assert got == {(0, "web"): 1, (0, "book"): 1, (1, "web"): 1}
