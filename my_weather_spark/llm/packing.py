"""Sequence packing: assign documents to fixed-capacity context
chunks for pretraining batch construction.

This is concat-and-chunk packing (the GPT-pretraining shape): within
each pack group, documents are laid out back-to-back in a
deterministic order and cut into ``capacity``-token chunks; a document
may straddle a chunk boundary. Unlike bin-packing heuristics this is
expressible as one window cumsum — no sequential driver loop, no
UDF — and is therefore exactly reproducible and SQL-checkable.

Scale shape: the window partitions by ``group_col`` (a corpus shard /
source), so the only exchange is the hash partition on the group key
and each group packs independently — embarrassingly parallel across
1000 executors. A global pack order would serialize into one
partition; that is deliberately not offered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def pack_chunks(
    df: DataFrame,
    capacity: int,
    token_col: str | None = None,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, group, n_tokens, chunk_start, chunk_end, offset_in_chunk).

    ``chunk_start``/``chunk_end`` are the first/last chunk indices the
    document's tokens land in (inclusive; equal unless the doc
    straddles a boundary); ``offset_in_chunk`` is the token offset of
    the document's first token within ``chunk_start``. Chunk indices
    are per group. Token counts default to the ceil(chars/4) BPE-ish
    estimate used by :func:`my_weather_spark.llm.text.token_stats`.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if token_col is None:
        tokens = F.ceil(F.length(F.col(text_col)) / 4).cast("long")
    else:
        tokens = F.col(token_col).cast("long")
    w = (
        W.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(tokens).over(w)
    before = cum - tokens
    return df.select(
        F.col(id_col),
        F.col(group_col),
        tokens.alias("n_tokens"),
        F.floor(before / capacity).alias("chunk_start"),
        F.floor(
            F.when(tokens > 0, (cum - 1) / capacity).otherwise(before / capacity)
        ).alias("chunk_end"),
        (before % capacity).alias("offset_in_chunk"),
    )
