"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full execution, no
driver-side result transfer) so timings measure the distributed plan,
not collect serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from my_weather_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark(app_name="my_weather_spark_bench")
    qs = entrymod.queries()

    # Warm-up (not timed): JVM/codegen/parquet footers, the Python
    # worker pool + Arrow path (createDataFrame, mapInPandas), and the
    # noop committer — so per-query numbers measure steady state.
    for wq in ("q1_pricing_summary", "f1_camel_to_snake", "knn_bruteforce"):
        qs[wq](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # 3 reps per query: this container shows 2-4x run-to-run timing
    # noise on identical plans (see BASELINE.md). The headline stays
    # min-of-reps (the standard noise-resistant microbenchmark
    # estimator); per-query medians are reported alongside so the
    # noise floor itself is visible in the record.
    reps: dict[str, list[float]] = {name: [] for name in qs}
    for _rep in range(3):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.perf_counter() - t0, 3))

    timings = {name: min(ts) for name, ts in reps.items()}
    medians = {name: sorted(ts)[len(ts) // 2] for name, ts in reps.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total wall-clock of all declared queries (noop sink, best of 3)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "total_median": round(sum(medians.values()), 3),
                "sf": _sf_label(SF_DIR),
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
