"""Executable walkthrough of the full engine lifecycle.

Mirrors a day in the life of the reference platform, Spark-first:
build the metadata domain, register source adapters, run an
incremental collection into the merge store, evaluate mixed
store+live query vectors, and derive dashboard frames — then run the
corpus-cleaning pipeline over the synthetic documents table.

Run: python examples/weather_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from datetime import datetime, timezone

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_weather_spark import Domain, EngineSession, TsEngine, TsStore, UtcPeriod, visual
from my_weather_spark.model import create_query_id
from my_weather_spark.pipeline import DataCollectionPeriodAbsolute, DataCollectionTask
from my_weather_spark.sources.domain_source import DomainAdapter
from my_weather_spark.sources.file_source import ChunkedFileAdapter
from my_weather_spark.sources.heartbeat import HeartbeatAdapter
from my_weather_spark.sources.rate_limiter import RateLimiter
from my_weather_spark.tables import load_table


def dt(s):
    return datetime.fromtimestamp(s, tz=timezone.utc)


STATIONS = [
    {
        "_id": "demo:station:1",
        "station_name": "Demohuset",
        "module_name": "Inne",
        "type": "NAMain",
        "data_type": ["Temperature", "CO2"],
        "place": {"timezone": "Europe/Oslo", "city": "Oslo", "country": "NO",
                  "altitude": 90.0, "location": [10.75, 59.91]},
        "modules": [
            {"_id": "demo:module:1", "module_name": "Ute", "type": "NAModule1",
             "data_type": ["Temperature"]},
        ],
    }
]


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="weather_demo_")
    sess = EngineSession()
    spark = sess.spark

    # --- 1. metadata domain + backing "cloud" data -----------------------
    dom = Domain(spark, STATIONS)
    print("measurements:")
    dom.measurements.select("measurement_name", "store_id", "query_id").show(truncate=False)

    store_ids = [r["store_id"] for r in dom.measurements.collect()]
    rows = []
    for k, sid in enumerate(sorted(store_ids)):
        rows += [(sid, dt(i * 300), 15.0 + k + (i % 12) * 0.5) for i in range(288)]
    cloud_path = os.path.join(workdir, "cloud")
    spark.createDataFrame(rows, "series_id string, ts timestamp, value double").write.parquet(cloud_path)

    # --- 2. adapters: rate-limited paginated source + heartbeat ----------
    backing = ChunkedFileAdapter(
        "shyft", cloud_path, max_points_per_call=1024,
        rate_limiters=[RateLimiter(45, 10, wait_time=0.01)],
    )
    sess.register_adapter(DomainAdapter("netatmo", dom, backing))
    sess.register_adapter(HeartbeatAdapter())
    engine = TsEngine(sess, TsStore(spark, os.path.join(workdir, "store")))
    print("healthy:", engine.healthy())

    # --- 3. incremental collection into the merge store ------------------
    qid = create_query_id("netatmo", "Demohuset", "Ute", "Temperature")
    m = dom.get_measurement("Demohuset", "Ute", "Temperature").collect()[0]
    task = DataCollectionTask(
        "demo", engine, [qid], [m["store_id"]],
        DataCollectionPeriodAbsolute(dt(0), dt(287 * 300)),
    )
    stored = task.collect(now=dt(10**6))
    print("collected points:", stored)

    # --- 4. evaluate a mixed vector: store + live + heartbeat ------------
    res = engine.evaluate(
        [m["store_id"], qid, "heartbeat://canary"], UtcPeriod(0, 3600)
    )
    res.groupBy("query_index", "series_id").count().orderBy("query_index").show(truncate=False)

    # --- 5. dashboard frames ---------------------------------------------
    tiles = visual.current_conditions(engine, [m["store_id"]], UtcPeriod(0, 10**6))
    tiles.select("series_id", "min_value", "max_value", "last_value", "tile_text").show(truncate=False)

    # --- 6. corpus cleaning over the synthetic documents -----------------
    from my_weather_spark.llm.pipeline import clean_corpus, curate_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    clean, report = clean_corpus(
        docs, min_words=5, jaccard_threshold=0.9,
        # SemDeDup stage: vec_id shares the doc_id space in the testdata
        embeddings=emb, semdedup_threshold=0.35,
    )
    print("corpus report:", report)
    clean.select("doc_id", "n_words", "predicted_lang").show(5)

    # --- 6b. published-filter readouts, clustering, temperature mixing ---
    from my_weather_spark.llm import clustering, sampling as llm_sampling
    from my_weather_spark.llm import text as text_ops

    gq = text_ops.gopher_quality(
        docs, min_words=40, min_mean_word_len=4.0, min_req_stopwords=1
    )
    print("gopher rules keep:", gq.where("keep").count(), "/", gq.count())
    text_ops.vocab_topk(docs, k=5).show()
    # exact-arithmetic Lloyd k-means over the embeddings + composition
    km = clustering.kmeans_assign(emb, k=4, iters=2)
    clustering.cluster_profile(km, emb, "label").orderBy("cluster", "label").show(8)
    # temperature-flattened language mix (rates ∝ sqrt(n))
    llm_sampling.temperature_sample(
        docs, 250, strata_col="lang", seed="demo"
    ).groupBy("lang").count().orderBy("lang").show()
    # UniMax epoch-capped budget allocation (budget = 7/4 total chars)
    llm_sampling.unimax_alloc(docs, epochs=2).orderBy("n_chars").show()
    # learned BPE tokenizer: 8 merge rounds + per-doc token budgets
    from my_weather_spark.llm import bpe as llm_bpe

    bpe_merges, bpe_words = llm_bpe.learn_bpe(docs, n_merges=8)
    print("bpe merges:", [m[3] for m in bpe_merges])
    llm_bpe.token_counts(docs, bpe_words).orderBy("doc_id").show(5)
    # train/eval split-leakage audit (split membership is a pure hash
    # function, so the check is one join)
    from my_weather_spark.llm import decontam as llm_decontam

    leak = llm_decontam.split_leakage(docs, n=8)
    leak.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("leaked").cast("int")).alias("n_leaked"),
    ).orderBy("split").show()
    # CCNet perplexity tiles, NB classifier verdicts, mix diagnostics
    from my_weather_spark.llm import classifier as llm_classifier
    from my_weather_spark.llm import lm as llm_lm

    ref = docs.where(F.col("doc_id") % 97 == 0)
    llm_lm.ppl_buckets(
        docs.where(F.col("doc_id") % 97 != 0), ref, group_col="lang"
    ).groupBy("lang", "bucket").count().orderBy("lang", "bucket").show(8)
    nb = llm_classifier.nb_scores(docs, pos=F.col("doc_id") % 97 == 0)
    print("classifier keeps:", nb.where("pred_hq").count(), "/", nb.count())
    text_ops.strata_divergence(docs, strata_col="lang").orderBy("lang").show()
    from my_weather_spark.ops import ranking as ranking_ops

    ranking_ops.grouped_exact_percentiles(
        docs.select("lang", "n_chars", "doc_id"), "n_chars",
        [50, 99], "lang", "doc_id",
    ).orderBy("lang", "p").show(6)

    # --- 7. full curation: clean -> decontam -> mix -> split -> pack -----
    bench = docs.where(F.col("doc_id") % 97 == 0)
    curated, crep = curate_corpus(
        docs.where(F.col("doc_id") % 97 != 0),
        benchmark=bench,
        mixing_rates={"src0": 1.0, "src1": 0.5},
        default_rate=0.25,
        split_weights=(0.9, 0.05, 0.05),
        chunk_capacity=512,
        min_words=5,
        jaccard_threshold=0.9,
        # DSIR stage: importance-resample the surviving pool toward the
        # English slice (Gumbel-top-k, deterministic hash tickets)
        dsir_target=docs.where(F.col("lang") == "en"),
        dsir_k=200,
    )
    print("curation report:", crep)
    curated.select(
        "doc_id", "source", "split", "chunk_start", "offset_in_chunk"
    ).orderBy("source", "chunk_start").show(8)

    # --- 8. incremental ingestion against the persisted signature store --
    from my_weather_spark.llm.incremental import SignatureStore

    sig = SignatureStore(spark, os.path.join(workdir, "sigstore"))
    first, rep1 = sig.ingest(docs.limit(50))
    again, rep2 = sig.ingest(docs.limit(50))  # re-offer: all exact dups
    print("ingest 1:", rep1)
    print("ingest 2 (re-offered):", rep2)


if __name__ == "__main__":
    main()
