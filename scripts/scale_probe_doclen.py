"""Document-LENGTH scaling probe for the per-document text kernels.

The corpus probe (scale_probe_llm.py) scales the NUMBER of documents;
this one scales words-per-document (1k / 10k / 100k) on a fixed small
corpus, because the failure mode it guards is a quadratic per-document
kernel (one 100k-token document stalling a task for minutes while the
rest of the corpus finishes — a straggler, invisible in corpus-size
scaling over 54-word docs).

Covers: repetition_stats (top-bigram used to be O(distinct x total)
per doc; now sort + run-length, O(n log n)), token/quality stats,
fingerprint, and the decontamination gram pass (used to re-split the
doc once per gram before the bound-column fix).

Healthy = time grows ~10x (or less, down at the scheduling floor) per
10x doc length. Quadratic = ~100x per step.

Usage: python scripts/scale_probe_doclen.py  # one JSON line per (op, length)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_weather_spark.session import get_spark
from my_weather_spark.llm import decontam, dsir, lm, text as text_ops

N_DOCS = 64  # two tasks/core at 32 threads; per-doc cost is the probe
LENGTHS = [1_000, 10_000, 100_000]  # words per document


def synth(spark, n_words: int):
    """64 docs of ``n_words`` pseudo-random words (vocab 1000, so
    bigrams repeat — the repetition kernel has real runs to count)."""
    return (
        spark.range(N_DOCS)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_words)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (
                            (
                                F.col("doc_id") * 7919
                                + i.cast("long") * 104729  # long: i*104729 overflows int32 at 100k words
                            )
                            % 1000
                        ).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)  # synthesis cost excluded from timings
    )


def main() -> None:
    spark = get_spark(
        app_name="scale_probe_doclen",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ref = synth(spark, 1_000)
    ops = {
        "repetition_stats": lambda d: text_ops.repetition_stats(d),
        "token_stats": lambda d: text_ops.token_stats(d),
        "quality_stats": lambda d: text_ops.quality_stats(d),
        "fingerprint": lambda d: text_ops.fingerprint(d),
        "decontam_grams": lambda d: decontam._with_ngram_hashes(
            d, "text", 5, "_g"
        ).select("doc_id", F.size("_g").alias("n")),
        # query terms exist in the synthetic vocab (w0..w999) so the
        # in-row tf filters do real work at every length
        "bm25_scores": lambda d: text_ops.bm25_scores(
            d, ["w1", "w2", "w3", "w999"]
        ),
        # fixed 1000-word reference: the model side stays constant so
        # the probe isolates the per-doc scoring cost
        "lm_perplexity": lambda d: lm.perplexity_scores(d, ref),
        # fixed 1000-word target: isolates the in-row feature hash +
        # broadcast-array lookup sum (would go quadratic if the dim-
        # sized _lr transform ever inlined into the scoring lambda)
        "dsir_weights": lambda d: dsir.importance_weights(d, ref),
    }
    for n_words in LENGTHS:
        docs = synth(spark, n_words)
        for name, fn in ops.items():
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            print(
                json.dumps(
                    {
                        "op": name,
                        "words_per_doc": n_words,
                        "n_docs": N_DOCS,
                        "sec": round(min(ts), 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
