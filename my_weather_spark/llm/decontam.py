"""Benchmark decontamination: drop or flag training documents that
share word n-grams with an evaluation/benchmark set.

The standard pretraining hygiene step (the reference pipeline has no
analog; this is part of the training-data layer): any training doc
containing an exact n-gram that also occurs in a benchmark document is
"contaminated" and must be excluded so eval scores stay meaningful.

Scale shape (corpus ~100 TB, benchmark ~MBs):

- n-grams are built IN-ROW with array HOFs (no explode of the corpus
  into a words table) and hashed to 60-bit longs, so the join key is
  8 bytes, not a string;
- the benchmark n-gram set is distinct-ed (small by construction) and
  broadcast — the corpus-side probe is a shuffle-free broadcast
  semi/anti join, one narrow pass over the corpus;
- the per-doc hit count comes from map-side partial aggregation over
  the exploded probe (explode preserves row locality, so each doc's
  n-grams collapse to one partial row before any exchange).

Hash collisions (~2^-60 per n-gram pair) can only FLAG an extra doc,
never un-flag one — the conservative direction for decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngram_hashes(text_col: str, n: int) -> Column:
    """Distinct 60-bit hashes of all word ``n``-grams of a text column,
    built in-row: split -> sliding slice -> md5 -> long.

    PERF CONTRACT: the word array MUST be bound to a real column before
    the sliding transform — a lambda that references a derived
    expression re-evaluates it per element, turning the gram pass
    quadratic in document length (measured 7x on 54-word docs; a
    100k-token doc would re-split 100k times). Callers go through
    :func:`_with_ngram_hashes`, which binds first.
    """
    words = F.col(_WORDS_COL)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda p: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(words, p, n))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    # guard: sequence(1, k) with k < 1 DESCENDS ([1, 0, ...]) instead
    # of being empty — a doc shorter than n words has no n-grams.
    return F.when(
        F.size(words) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<long>"))


_WORDS_COL = "_decontam_words"


def _with_ngram_hashes(df: DataFrame, text_col: str, n: int, out: str) -> DataFrame:
    """``df`` plus an ``out`` column of distinct hashed n-grams, with
    the word array materialized as a column first (see _ngram_hashes'
    perf contract)."""
    bound = df.withColumn(
        _WORDS_COL, F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    )
    return bound.withColumn(out, _ngram_hashes(text_col, n)).drop(_WORDS_COL)


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """The distinct hashed n-gram set of the benchmark corpus
    (one column ``gram_h``). Small by construction — broadcast it."""
    return (
        _with_ngram_hashes(benchmark, text_col, n, "_g")
        .select(F.explode("_g").alias("gram_h"))
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_grams, n_contaminated, contaminated) per training doc.

    ``n_contaminated`` counts DISTINCT doc n-grams that occur anywhere
    in the benchmark; ``contaminated`` is true at >= ``min_hits``.
    The benchmark side broadcasts; corpus n-grams explode only into the
    broadcast-hash-join probe (no shuffle of the corpus). The corpus is
    fanned out first: the md5 gram pass is CPU-heavy but byte-small, so
    a few-file input would otherwise plan a near-serial scan (the
    floor-probe r8 reading was 6 single-task stages, 3.4 s of wall on
    one core at sf0.1) — at 100 TB the input already has thousands of
    partitions and the fan-out is a no-op.
    """
    from my_weather_spark.llm._util import fan_out as _fan_out

    bench = F.broadcast(
        benchmark_ngrams(benchmark, n, text_col).withColumn("_hit", F.lit(1))
    )
    grams = _with_ngram_hashes(_fan_out(docs), text_col, n, "_g").select(
        id_col, F.size("_g").alias("n_grams"), F.explode_outer("_g").alias("gram_h")
    )
    return (
        grams.join(bench, "gram_h", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated") >= min_hits).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training docs with contaminated ones removed (broadcast
    anti-join against the benchmark n-gram set)."""
    flags = contamination_flags(docs, benchmark, n, min_hits, text_col, id_col)
    dirty = flags.where(F.col("contaminated")).select(id_col)
    # join strategy left to Catalyst/AQE: the dirty set is usually
    # broadcast-small but is corpus-derived, so no forced broadcast.
    return docs.join(dirty, id_col, "left_anti")


def split_leakage(
    df: DataFrame,
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    labels: tuple[str, ...] = ("train", "val", "test"),
    train_label: str = "train",
    n: int = 8,
    seed: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval split-leakage audit: for every document assigned to
    a non-train split, count how many of its distinct n-gram hashes
    also occur anywhere in the train split —
    (id, split, n_grams, n_shared, leaked).

    This is the check sampling.split_assign's contract promises
    ("leakage checks are a join, not a provenance hunt"): because
    split membership is a pure function of (seed, id), the audit
    needs no provenance — it re-derives the assignment and joins.
    Unlike contamination_flags (a FOREIGN benchmark, broadcast-small
    by construction), both sides here are corpus-derived.

    Scale shape: the (doc, split, gram) frame is built once (in-row
    gram hashing, one narrow pass, MATERIALIZED pre-explode: the
    train-distinct and eval-probe subtrees get different filters
    pushed in, so Catalyst cannot reuse one scan between them and an
    unmaterialized frame re-runs the whole parse+md5 pass per
    consumer — the minhash-bands lesson; the checkpoint holds hash
    ARRAYS, about the bytes of the text they came from, never the
    exploded frame) and feeds BOTH the train-side distinct and the
    eval-side probe on the same 8-byte shuffle key. The train gram set
    is corpus-sized, so the probe is an honest shuffle join at scale
    (AQE broadcasts it at toy scale); eval docs with no grams survive
    via explode_outer with n_grams = 0, leaked = false. Hash
    collisions (~2^-60) can only over-flag — the conservative
    direction for a leakage audit.
    """
    if n < 1:
        # n=0 would hash md5('') once per position for EVERY doc —
        # one universal shared "gram" flagging the whole eval set
        raise ValueError(f"n must be >= 1, got {n}")
    if train_label not in labels:
        raise ValueError(f"train_label {train_label!r} not in labels {labels}")
    from my_weather_spark.llm._util import fan_out as _fan_out
    from my_weather_spark.llm.sampling import split_assign

    assigned = split_assign(df, weights, labels, seed, id_col)
    hashed = (
        _with_ngram_hashes(_fan_out(assigned), text_col, n, "_g")
        .select(id_col, "split", "_g")
        .localCheckpoint(eager=True)
    )
    grams = hashed.select(
        id_col, "split", F.explode_outer("_g").alias("gram_h")
    )
    train_set = (
        grams.where((F.col("split") == train_label) & F.col("gram_h").isNotNull())
        .select("gram_h")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        grams.where(F.col("split") != train_label)
        .join(train_set, "gram_h", "left")
        .groupBy(id_col, "split")
        .agg(
            F.count("gram_h").cast("long").alias("n_grams"),
            F.count("_hit").cast("long").alias("n_shared"),
        )
    )
    return per_doc.select(
        id_col,
        "split",
        "n_grams",
        "n_shared",
        (F.col("n_shared") > 0).alias("leaked"),
    )
