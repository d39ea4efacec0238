"""Core-scaling probe for the heavy dedup/window family (r12 verdict
item 3): time each operator on a 16x-union input (disjoint per-copy
vocabularies / series, so LSH buckets and groups stay disjoint and the
work scales linearly) at the session's core count. At sf0.1 the bench
is scheduling-floor-dominated (the whole 132-query suite runs FASTER at
8 cores than 32), so this probe builds inputs big enough that per-query
wall is tens of seconds and the low/high-core ratio measures the
algorithm, not the floor.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/scale_probe_cores.py out32.json
    SPARK_GRAFT_CPUS=8  python scripts/scale_probe_cores.py out8.json
(then merge the two JSONs; the committed artifact is SCALE_PROBE_r12.json)

Input prep (the union + per-copy rewrites) is checkpointed BEFORE the
timed region: the probe times the operators, not the synthetic-input
construction. Nothing here is consumed by bench.py or the oracle —
measurement only.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_weather_spark.session import get_spark
from my_weather_spark.tables import load_table
from my_weather_spark.llm import dedup, similarity, text as text_ops
from my_weather_spark.ops import ranking

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SCALE_PROBE_K", "16"))
REPS = int(os.environ.get("SCALE_PROBE_REPS", "2"))


def main() -> None:
    out_path = sys.argv[1]
    spark = get_spark(app_name="scale_probe_cores")
    sc = spark.sparkContext
    cpus = sc.defaultParallelism

    docs = load_table(spark, SF_DIR, "documents")
    # K copies with DISJOINT vocabularies (every word prefixed with the
    # copy index) and disjoint ids: near-dup structure repeats per copy,
    # never across copies, so pair counts scale by K, not K^2.
    doc_parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"c{i}_$1").alias("text"),
        )
        for i in range(SCALE)
    ]
    big_docs = doc_parts[0]
    for p in doc_parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs = big_docs.repartition(cpus * 4).localCheckpoint(eager=True)

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", F.expr("unix_micros(ts) div 1000000").alias("_sec")
    )
    ev_parts = [
        events.select(
            (F.col("event_id") + F.lit(i * 1_000_000_000)).alias("event_id"),
            F.concat_ws("_", "event_type", F.lit(str(i))).alias("event_type"),
            "_sec",
        )
        for i in range(SCALE)
    ]
    big_events = ev_parts[0]
    for p in ev_parts[1:]:
        big_events = big_events.unionByName(p)
    big_events = big_events.repartition(cpus * 4).localCheckpoint(eager=True)

    n_docs, n_events = big_docs.count(), big_events.count()

    ops = {
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(
            big_docs, num_hashes=16, band_size=8
        ),
        "lsh_jaccard_near_dup": lambda: dedup.jaccard_for_candidates(
            big_docs,
            dedup.minhash_lsh_pairs(big_docs, num_hashes=16, band_size=8),
            min_jaccard=0.8,
        ),
        "srp_cosine_near_dup": lambda: similarity.srp_lsh_pairs(
            text_ops.hashed_bow_vectors(big_docs, dim=64),
            threshold=0.9,
            n_planes=256,
            band_bits=16,
            id_col="doc_id",
        ),
        "simhash_hamming_pairs": lambda: dedup.simhash_hamming_pairs(
            big_docs, max_hamming=3, bits=60
        ),
        "w5_sliding_count_scaled": lambda: ranking.sliding_range_count(
            big_events, ["event_type"], ["event_id"], "_sec", preceding=600
        ),
    }

    record = {
        "cpus": cpus,
        "scale": SCALE,
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "n_events": n_events,
        "reps": REPS,
        "queries": {},
    }
    for name, fn in ops.items():
        secs = []
        for rep in range(REPS):
            sc._jvm.System.gc()
            gc.collect()
            sc.setJobDescription(f"scale_probe {name} x{SCALE} rep{rep}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 2))
            sc.setJobDescription(None)
            print(json.dumps({"q": name, "cpus": cpus, "rep": rep, "sec": secs[-1]}), flush=True)
        record["queries"][name] = {"secs": secs, "min": min(secs)}
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
