"""Scaling-linearity probe: time core operators on 1x/4x/16x unions of
the sf0.1 events table (600k -> 9.6M rows) to verify work grows
linearly (no accidental quadratic joins, no driver-side collects).

Usage: python scripts/scale_probe.py
Prints one JSON line per (op, scale) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_weather_spark.session import get_spark
from my_weather_spark.tables import load_table
from my_weather_spark.ops import timeseries as ts_ops
from my_weather_spark.model import UtcPeriod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="scale_probe")
    base = load_table(spark, SF_DIR, "events").select(
        F.col("event_type").alias("series_id"), "ts", "value", "event_id"
    )

    def at_scale(k: int):
        # k copies with distinct series ids so cardinality also scales
        parts = [
            base.withColumn(
                "series_id", F.concat_ws("_", "series_id", F.lit(str(i)))
            )
            for i in range(k)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    ops = {
        "series_stats": lambda d: ts_ops.series_stats(d.select("series_id", "ts", "value")),
        "resample_1h": lambda d: ts_ops.resample(d.select("series_id", "ts", "value"), "1 hour"),
        "sliding_count_600s": lambda d: ts_ops.sliding_count(d, 600),
        "sessionize_30m": lambda d: ts_ops.sessionize(d, 1800, order_tiebreak="event_id"),
        "merge_dedup": lambda d: ts_ops.merge_dedup(
            d.withColumn("ingest_time", F.col("ts"))
        ),
        "time_weighted_6h": lambda d: ts_ops.resample_time_weighted(
            d.select("series_id", "ts", "value"), 6 * 3600
        ),
    }

    # warm-up
    at_scale(1).count()
    results = []
    for k in (1, 4, 16):
        d = at_scale(k).localCheckpoint(eager=True)  # materialize input once
        n = d.count()
        for name, fn in ops.items():
            t0 = time.perf_counter()
            fn(d).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            results.append({"op": name, "scale": k, "rows": n, "sec": dt})
            print(json.dumps(results[-1]))
        d.unpersist()

    # linearity summary: sec(16x)/sec(1x) should be ~16 or less (not ~256)
    by_op = {}
    for r in results:
        by_op.setdefault(r["op"], {})[r["scale"]] = r["sec"]
    print("\nscaling factors (16x time / 1x time; linear target <= ~16):")
    for op, t in by_op.items():
        print(f"  {op}: {round(t[16] / max(t[1], 1e-9), 1)}x")


if __name__ == "__main__":
    main()
