"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution matches a small target domain, by importance weight
p_target(x) / p_raw(x) under bag-of-hashed-n-grams bigram features,
then Gumbel-top-k resample. This is the published scale recipe for
"make 100 TB of crawl look like Wikipedia/books": the feature space is
a fixed ``dim``-bucket hash table, so both distributions are tiny
dense arrays no matter how large either corpus is.

Model: features of a document are its unigrams and bigrams hashed into
``dim`` buckets (same md5-bucket construction as text.hashed_bow);
p(bucket) is add-alpha smoothed: (c_b + alpha) / (total + alpha*dim).
log importance weight of a doc = sum over its feature OCCURRENCES of
log p_target(bucket) - log p_raw(bucket) (repeats count — this is the
bag-of-n-grams likelihood ratio under a unigram-over-buckets model,
exactly the paper's estimator).

Selection: the paper resamples WITHOUT replacement via the Gumbel
trick — rank by logw + Gumbel noise and keep the top k. The noise here
is a deterministic hash-ticket Gumbel (u = (ticket + 0.5) / 1e6,
g = -ln(-ln(u)), ticket = md5(seed || id) — the repo-wide sampling
construction), so the sample is reproducible across retries and
repartitions and exactly replayable by a SQL oracle.

Scale shape (raw ~100 TB, target ~MBs-GBs):
- model: one narrow pass over each corpus; bucket counts collapse with
  map-side partials to at most ``dim`` rows, which then collapse to a
  ONE-ROW frame holding the dense log-ratio array. No driver action —
  the model rides into the scoring plan as a broadcast crossjoin (the
  scalar-subquery pattern, see bm25_scores / lm perplexity).
- scoring: one narrow in-row pass — each doc's features index into the
  broadcast log-ratio array via ``F.aggregate``; the corpus never
  shuffles to be scored.
- selection: top-k by (sel_key desc, id) via orderBy().limit(k) —
  Spark plans TakeOrderedAndProject (per-partition top-k, merged on
  the driver), which is the correct distributed shape for bounded k.

PERF CONTRACT (llm/decontam._ngram_hashes): the word array is bound to
a real column before any lambda slices it; the scoring lambda's array
argument (`_fb`) and lookup table (`_lr`) are plain column refs — `_lr`
arrives through a join boundary, which CollapseProject cannot inline
into the lambda body (an inlined dim-sized transform would re-evaluate
per feature).

Reference parity note: the reference engine has no data-selection
tier; this extends the curation surface the same way dedup/decontam/
perplexity do (SURVEY.md LLM-ops section).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_weather_spark.llm.sampling import TICKET_MOD, _ticket
from my_weather_spark.llm.text import _words

DEFAULT_DIM = 1024


def _bucket(col: Column, dim: int) -> Column:
    """md5-first-8-hex mod dim — the hashed_bow bucket construction
    (identical in the SQL oracle: ('0x'||substr(md5(w),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % dim


def _with_feature_buckets(
    df: DataFrame, text_col: str, dim: int, out: str = "_fb"
) -> DataFrame:
    """Adds ``out``: array<bigint> of hashed unigram+bigram buckets in
    document order. NULL text behaves as empty (no features).

    PERF CONTRACT, stronger than the usual bind-the-array rule: no
    lambda BODY here may reference the word array at all (not even a
    bound column). The explode consumers of ``out`` get an inferred
    ``size(out) > 0`` filter (InferFiltersFromGenerate) which predicate
    pushdown then inlines below the binding projection — with the full
    split substituted into the lambda, an element_at(words, p)-style
    body re-splits the text PER ELEMENT (measured quadratic: 64 docs x
    4k words took 27 s; the zip_with form is flat). Bigrams therefore
    come from zip_with over two slices — inputs are evaluated once per
    row under any inlining, lambda bodies touch only their arguments.
    """
    bound = df.withColumn(
        "_dsir_ws", F.coalesce(_words(F.col(text_col)), F.array().cast("array<string>"))
    )
    ws = F.col("_dsir_ws")
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    uni = F.transform(ws, lambda w: _bucket(w, dim))
    bi = F.zip_with(
        F.slice(ws, 1, n1),
        F.slice(ws, 2, n1),
        lambda a, b: _bucket(F.concat(a, F.lit(" "), b), dim),
    )
    return bound.withColumn(out, F.concat(uni, bi)).drop("_dsir_ws")


def _bucket_counts(df: DataFrame, text_col: str, dim: int) -> DataFrame:
    """(bucket, c) — sparse feature-occurrence counts; at most ``dim``
    rows after a map-side-combined aggregate."""
    return (
        _with_feature_buckets(df, text_col, dim)
        .select(F.explode("_fb").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def log_ratio_model(
    raw: DataFrame,
    target: DataFrame | Column,
    dim: int = DEFAULT_DIM,
    alpha: float = 0.5,
    text_col: str = "text",
    _feats: DataFrame | None = None,
) -> DataFrame:
    """ONE-ROW frame with ``_lr``: dense array<double> of length dim,
    _lr[b+1] = log p_target(b) - log p_raw(b) (add-alpha smoothed).

    ``target`` is either a separate DataFrame (external target domain:
    two feature scans, sparse counts full-joined) or a boolean Column
    predicate over ``raw`` (target = a slice of the corpus — the
    common curation case): then BOTH distributions come out of ONE
    feature scan with a count/count_if aggregate, no join. Same
    counts either way, so the SQL oracle is unchanged.

    Stays in-plan (no driver action); broadcast-crossjoin it onto the
    scoring side. A featureless raw or target corpus raises in-plan
    (assert_true) instead of silently NULL-scoring every document.

    ``_feats`` (internal): a pre-built raw-side feature frame carrying
    ``_fb`` (and ``_is_t`` when target is a Column) — importance_weights
    checkpoints ONE tokenization pass and passes it here so the model
    aggregate and the scoring fold share it instead of re-running the
    split+grams chain (tokenization dominates the whole op's cost).
    """
    if isinstance(target, Column):
        ex = (
            _feats.select("_fb", "_is_t")
            if _feats is not None
            else _with_feature_buckets(raw, text_col, dim).select(
                "_fb", target.alias("_is_t")
            )
        ).select(F.explode("_fb").alias("bucket"), "_is_t")
        sparse = ex.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("raw_c"),
            F.count_if(F.col("_is_t")).alias("tgt_c"),
        )
        # count_if yields 0, not NULL — normalize so the emptiness
        # guard below sees the same shape as the two-frame path
        sparse = sparse.withColumn(
            "tgt_c", F.when(F.col("tgt_c") > 0, F.col("tgt_c"))
        )
    else:
        rc = (
            _feats.select(F.explode("_fb").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("raw_c"))
            if _feats is not None
            else _bucket_counts(raw, text_col, dim).withColumnRenamed(
                "c", "raw_c"
            )
        )
        tc = _bucket_counts(target, text_col, dim).withColumnRenamed("c", "tgt_c")
        sparse = rc.join(tc, "bucket", "full")
    one = sparse.agg(
        F.sum("raw_c").alias("_rt"),
        F.sum("tgt_c").alias("_tt"),
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("bucket"),
                    F.struct(F.col("raw_c"), F.col("tgt_c")).alias("v"),
                )
            )
        ).alias("_m"),
    )
    # loud, in-plan emptiness check: sum() over zero rows / all-NULL
    # side is NULL -> every downstream weight would be NULL
    checked = one.select(
        F.coalesce(
            F.col("_rt"),
            F.assert_true(
                F.lit(False), F.lit("dsir: raw corpus has no features")
            ).cast("bigint"),
        ).alias("_rt"),
        F.coalesce(
            F.col("_tt"),
            F.assert_true(
                F.lit(False), F.lit("dsir: target corpus has no features")
            ).cast("bigint"),
        ).alias("_tt"),
        F.col("_m"),
    )
    a = F.lit(float(alpha))
    denom_t = F.col("_tt") + a * F.lit(dim)
    denom_r = F.col("_rt") + a * F.lit(dim)
    lr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: (
            F.log(
                (
                    F.coalesce(F.try_element_at("_m", b)["tgt_c"], F.lit(0)) + a
                )
                / denom_t
            )
            - F.log(
                (
                    F.coalesce(F.try_element_at("_m", b)["raw_c"], F.lit(0)) + a
                )
                / denom_r
            )
        ),
    )
    return checked.select(lr.alias("_lr"))


def importance_weights(
    docs: DataFrame,
    target: DataFrame | Column,
    dim: int = DEFAULT_DIM,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, logw) — DSIR log importance weight per document
    (rounded 6). Featureless documents weigh exactly 0.0 (no evidence
    either way). ``docs`` is the raw distribution; ``target`` the
    domain to match — pass a boolean Column predicate when the target
    is a slice of ``docs`` (single-scan model) or a DataFrame when it
    is external (two scans). The corpus is tokenized ONCE either way:
    the feature frame is checkpointed and feeds both the model
    aggregate and the scoring fold. The corpus is fanned out before
    tokenization: the split+md5 pass is CPU-heavy but byte-small, so a
    few-file input would otherwise serialize it on a handful of cores
    (the floor-probe r8 reading was 10 near-single-task stages at
    sf0.1); at 100 TB inputs already carry thousands of partitions and
    the fan-out is a no-op."""
    from my_weather_spark.llm._util import fan_out as _fan_out

    flag = [target.alias("_is_t")] if isinstance(target, Column) else []
    feats = (
        _with_feature_buckets(_fan_out(docs), text_col, dim)
        .select(id_col, *flag, "_fb")
        .localCheckpoint()
    )
    model = log_ratio_model(docs, target, dim, alpha, text_col, _feats=feats)
    scored = feats.select(id_col, "_fb").join(F.broadcast(model))
    logw = F.aggregate(
        "_fb",
        F.lit(0.0),
        lambda acc, b: acc + F.element_at("_lr", (b + 1).cast("int")),
    )
    return scored.select(
        id_col,
        F.size("_fb").cast("long").alias("n_feats"),
        F.round(logw, 6).alias("logw"),
    )


def selection_keys(
    docs: DataFrame,
    target: DataFrame | Column,
    seed: str = "dsir",
    dim: int = DEFAULT_DIM,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, logw, sel_key) — Gumbel-perturbed selection keys:
    sel_key = round(logw + g, 6), g = -ln(-ln((ticket + 0.5) / 1e6)),
    ticket = md5(seed || id) mod 1e6. Deterministic, repartition-
    invariant, and exactly replayable in SQL."""
    w = importance_weights(docs, target, dim, alpha, text_col, id_col)
    u = (_ticket(id_col, seed) + F.lit(0.5)) / F.lit(float(TICKET_MOD))
    gumbel = -F.log(-F.log(u))
    return w.select(
        id_col,
        "n_feats",
        "logw",
        F.round(F.col("logw") + gumbel, 6).alias("sel_key"),
    )


def resample(
    docs: DataFrame,
    target: DataFrame | Column,
    k: int,
    seed: str = "dsir",
    dim: int = DEFAULT_DIM,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k importance resample: the k documents (all original
    columns) with the largest sel_key, ties broken by id. orderBy +
    limit plans TakeOrderedAndProject — per-partition top-k merged on
    the driver, the right shape for bounded k at any corpus size."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = selection_keys(docs, target, seed, dim, alpha, text_col, id_col)
    sel = (
        keys.orderBy(F.desc("sel_key"), F.col(id_col))
        .limit(k)
        .select(id_col)
    )
    return docs.join(F.broadcast(sel), id_col, "left_semi")
