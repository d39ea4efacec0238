"""Deduplication operators for large-scale text corpora.

Beyond-reference operators (BASELINE.json north star): exact dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard — all pure DataFrame
compositions (JVM-side, codegen'd; no Python UDFs), designed for the
standard web-scale dedup pipeline shape:

    shingle -> minhash signature -> band -> bucket join -> verify

Scale notes (100 TB):
* every step is a groupBy/join keyed by doc or band-bucket — shuffles
  are on uniformly-distributed hash keys (md5), no skew by design;
* the LSH bucket join replaces the quadratic all-pairs comparison —
  candidate pairs ~ O(docs x band collisions), then exact Jaccard only
  on candidates;
* hashes are md5-based and ENGINE-PORTABLE (hex strings / hex-prefix
  ints), so results are reproducible across Spark/DuckDB — important
  for cross-engine validation of a petabyte dedup run before deleting
  anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ----------------------------------------------------------------------
# Exact dedup: hash-groupBy on content.
def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: (content_hash, n_copies, keep_id).
    keep_id = smallest id (deterministic survivor pick)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest-id row per distinct content (the actual dedup)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ----------------------------------------------------------------------
# Word shingles (the unit of near-dup similarity).
def word_set(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, word) distinct pairs; single-space tokenization to stay
    engine-portable."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )


# ----------------------------------------------------------------------
# MinHash signatures + LSH banding.
def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_key): per-band concatenated minhash signature.

    hash_i(word) = md5(i || ':' || word); signature_i = min over the
    doc's word set. Band key joins ``band_size`` consecutive signature
    values. Min over lexicographic md5 hex is a valid uniform minhash
    (any total order over a uniform hash works).
    """
    words = word_set(df, text_col, id_col)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    sigs = (
        words.select(id_col, "word", seeds)
        .withColumn(
            "h", F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("word")))
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("sig"))
    )
    return (
        sigs.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "sig"))),
                    lambda s: s["sig"],
                ),
                ",",
            ).alias("band_key")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any full band. Output
    (doc_a, doc_b) with doc_a < doc_b, distinct."""
    bands = minhash_signatures(df, num_hashes, band_size, text_col, id_col)
    a = bands.select(
        F.col(id_col).alias("doc_a"), "band", "band_key"
    )
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])  # bucket join — the LSH step
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# ----------------------------------------------------------------------
# Exact n-gram Jaccard (the verify step after LSH, or scoped all-pairs).
def jaccard_pairs(
    df: DataFrame,
    pair_scope_col: str | None = None,
    min_jaccard: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-set Jaccard for doc pairs.

    ``pair_scope_col``: restrict candidate pairs to docs sharing this
    column (e.g. 'source') — the scoped variant of all-pairs for when
    an LSH pass isn't warranted. At 100 TB you'd feed LSH candidates
    instead (join with minhash_lsh_pairs output).
    """
    words = word_set(df, text_col, id_col)
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_words"))
    if pair_scope_col:
        scope = df.select(id_col, pair_scope_col)
        words = words.join(scope, id_col)
        inter_keys = ["word", pair_scope_col]
    else:
        inter_keys = ["word"]
    a = words.select(*[F.col(c) for c in inter_keys], F.col(id_col).alias("doc_a"))
    b = words.select(*[F.col(c) for c in inter_keys], F.col(id_col).alias("doc_b"))
    inter = (
        a.join(b, inter_keys)
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_words").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_words").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    return out.select("doc_a", "doc_b", "jaccard")


# ----------------------------------------------------------------------
# SimHash: sign of per-bit weighted sums of word hashes.
def simhash(
    df: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) — ``bits``-bit simhash over the word set.

    Word hash = first 8 hex chars of md5 (engine-portable int via
    base-16 conv); bit b of the simhash is 1 iff sum over words of
    (+1 if word_hash bit b set else -1) > 0.
    """
    words = word_set(df, text_col, id_col).withColumn(
        "wh", F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # shiftright/shiftleft take a literal bit count in the Python API;
    # go through expr for a column-valued shift.
    contrib = words.select(id_col, "wh", bit).withColumn(
        "c", F.when(F.expr("(wh >> bit) & 1") == 1, 1).otherwise(-1)
    )
    bitsum = contrib.groupBy(id_col, "bit").agg(F.sum("c").alias("s"))
    return bitsum.groupBy(id_col).agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1, bit)")).otherwise(0)).alias(
            "simhash"
        )
    )


def simhash_buckets(
    df: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup candidates: docs with IDENTICAL simhash (bucket join).
    For hamming-distance<=k matching, band the simhash into k+1 chunks
    and bucket-join each (pigeonhole) — same shape as minhash LSH."""
    h = simhash(df, bits, text_col, id_col)
    a = h.select(F.col(id_col).alias("doc_a"), "simhash")
    b = h.select(F.col(id_col).alias("doc_b"), "simhash")
    return (
        a.join(b, "simhash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "simhash")
    )
