"""Product-quantization (PQ) compressed approximate nearest neighbor —
Jégou et al. 2011: split each d-dim embedding into M subspaces, quantize
every sub-vector to its nearest codebook entry, and answer queries with
asymmetric distance computation (ADC): per query, a tiny (M x K)
look-up table of exact query-to-codebook sub-distances, so each corpus
candidate costs M table adds instead of d multiply-adds — and the
corpus is stored as M small codes per vector instead of d floats, the
memory shape that makes 100 TB embedding search feasible.

Codebooks here are DETERMINISTIC ticket-sampled anchor sub-vectors
(the semdedup/IVF anchor convention) instead of per-subspace k-means —
that keeps the ENTIRE pipeline (codebook choice, encoding, LUTs,
top-k) replayable in a SQL oracle, so PQ is hash-verified end to end,
unlike recall-only ANN tests. Lloyd-trained codebooks are available by
composing llm/clustering.kmeans_assign per subspace when quality
matters more than verifiability.

Portability contract (mirrors the SQL replay exactly):
- squared-L2 sub-distances round to 6 dp BEFORE any argmin — ties
  then resolve to the lowest codebook index on both engines;
- the ADC total left-folds the M rounded sub-distances in subspace
  order (numpy accumulation == DuckDB list_reduce over ORDER BY j);
- codebook index order is (ticket, id) — the anchor sampling order.

Scale shape:
- codebooks: bounded TakeOrdered collect (K rows) -> broadcast;
- encode: ONE shuffle-free narrow Arrow pass over the corpus;
- query: LUTs broadcast; the scoring kernel emits only its per-batch
  top-k rows per query (bounded: batches x Q x k), and the final exact
  rank is a window over that tiny frame — the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from my_weather_spark.llm.sampling import _ticket


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    seed: str = "pq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(ids, cb) — cb is a float64 array of shape (m, k, d/m): the k
    lowest-ticket rows' sub-vectors, in (ticket, id) order (that order
    IS the codebook index, replayed by the oracle's row_number).
    Bounded driver collect (k rows) by construction."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col)
        .withColumn("_t", _ticket(id_col, seed))
        .orderBy("_t", id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"pq: need at least k={k} vectors, got {len(rows)}")
    mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"pq: dim {d} not divisible by m={m} subspaces")
    ds = d // m
    cb = np.stack([mat[:, j * ds : (j + 1) * ds] for j in range(m)])
    ids = np.array([r[id_col] for r in rows])
    return ids, cb


def _sub_dists(X, cbj):
    """Rounded squared-L2 distances (n x k) between sub-vectors X and
    codebook entries cbj — round-6 BEFORE any argmin/sum, the
    portability contract."""
    import numpy as np

    diff = X[:, None, :] - cbj[None, :, :]
    return np.round((diff * diff).sum(axis=2), 6)


def pq_encode(
    corpus: DataFrame,
    cb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — nearest codebook entry per subspace
    (ties -> lowest index, guaranteed by argmin over rounded
    distances). One shuffle-free narrow Arrow pass."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(cb)
    id_type = corpus.schema[id_col].dataType.simpleString()

    def _encode(batches):
        cbs = bc.value
        m, _, ds = cbs.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.stack(
                [
                    _sub_dists(X[:, j * ds : (j + 1) * ds], cbs[j]).argmin(axis=1)
                    for j in range(m)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes.astype("int32"))}
            )

    from my_weather_spark.llm._util import fan_out as _fan_out

    return _fan_out(corpus.select(id_col, vec_col)).mapInPandas(
        _encode, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    cb,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 4096,
) -> DataFrame:
    """(query_id, neighbor_id, adc_dist, rank) — ADC top-k per query
    over the PQ-encoded corpus. Queries are a bounded batch (enforced
    loudly); their (m x k_codebook) LUTs broadcast. The kernel emits
    per-batch top-k only; the final exact rank is a window over the
    bounded survivor frame. Self-matches excluded; ties by neighbor
    id."""
    import numpy as np
    import pandas as pd

    spark = codes.sparkSession
    q_pdf = queries.select(id_col, vec_col).limit(max_query_rows + 1).toPandas()
    if len(q_pdf) == 0:
        raise ValueError("pq_topk: query batch is empty")
    if len(q_pdf) > max_query_rows:
        raise ValueError(
            f"pq_topk: query batch exceeds max_query_rows={max_query_rows}"
        )
    m, _, ds = cb.shape
    Q = np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    # luts[j]: (n_queries x k_codebook) rounded sub-distances
    luts = np.stack(
        [_sub_dists(Q[:, j * ds : (j + 1) * ds], cb[j]) for j in range(m)]
    )
    q_ids = q_pdf[id_col].to_numpy()
    bc = spark.sparkContext.broadcast((q_ids, luts))
    kk = int(k)

    q_id_type = queries.schema[id_col].dataType.simpleString()
    c_id_type = codes.schema[id_col].dataType.simpleString()

    def _score(batches):
        ids, L = bc.value
        n_q = len(ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["codes"].to_numpy())  # (n x m)
            n_ids = pdf[id_col].to_numpy()
            # LEFT-fold the m rounded sub-distances in subspace order —
            # bitwise identical to the oracle's ordered list_reduce
            dist = L[0][:, C[:, 0]]
            for j in range(1, L.shape[0]):
                dist = dist + L[j][:, C[:, j]]  # (n_q x n)
            out_q, out_n, out_d = [], [], []
            for qi in range(n_q):
                drow = dist[qi]
                mask = n_ids != ids[qi]
                cand = np.nonzero(mask)[0]
                if len(cand) == 0:
                    continue
                # per-batch top-k by (dist, id): bounded survivors only
                order = np.lexsort((n_ids[cand], drow[cand]))[:kk]
                sel = cand[order]
                out_q.extend([ids[qi]] * len(sel))
                out_n.extend(n_ids[sel])
                out_d.extend(drow[sel])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_dist": out_d}
            )

    survivors = codes.mapInPandas(
        _score,
        schema=f"query_id {q_id_type}, neighbor_id {c_id_type}, adc_dist double",
    )
    w = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )
