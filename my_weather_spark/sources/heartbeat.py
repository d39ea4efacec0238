"""Heartbeat source: synthetic constant series, 1 Hz over the period.

Reference: weather/service/heartbeat.py:45-62 builds a constant
TimeSeries over the read period via create_ts (create_ts.py:13-19,
fixed-interval axis, value=1.0). Used as a liveness canary.

Spark-native: ``sequence(start, end, interval)`` + ``explode`` — the
rows are generated JVM-side, distributed, no driver loop. For very
long periods the explode of one giant array would concentrate in one
task, so the period is pre-split into day chunks with a cross of
(ref × day) before exploding — scale-safe generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_weather_spark.model import SeriesRef, TSINFO_SCHEMA, UtcPeriod
from my_weather_spark.sources.base import SourceAdapter


def synthetic_series(
    spark: SparkSession,
    series_ids: list[str],
    period: UtcPeriod,
    value: float | None = 1.0,
    dt_seconds: int = 1,
) -> DataFrame:
    """Constant series over the inclusive period at fixed dt.

    Generation is chunked by day so a multi-year heartbeat doesn't
    materialize one monster array per series in a single task.
    """
    ids = spark.createDataFrame([(s,) for s in series_ids], "series_id string")
    days = spark.sql(
        "SELECT explode(sequence(to_date(:s), to_date(:e), interval 1 day)) AS day",
        args={"s": period.start.isoformat(), "e": period.end.isoformat()},
    )
    lo = F.greatest(F.col("day").cast("timestamp"), F.lit(period.start))
    hi = F.least(
        F.date_add(F.col("day"), 1).cast("timestamp") - F.expr("interval 1 second"),
        F.lit(period.end),
    )
    pts = (
        ids.crossJoin(days)
        .select(
            "series_id",
            F.explode(
                F.sequence(lo, hi, F.expr(f"interval {int(dt_seconds)} seconds"))
            ).alias("ts"),
        )
        .withColumn("value", F.lit(float(value)).cast("double"))
    )
    return pts


class HeartbeatAdapter(SourceAdapter):
    scheme = "heartbeat"

    def __init__(self, value: float = 1.0, dt_seconds: int = 1) -> None:
        self.value = value
        self.dt_seconds = dt_seconds

    def read(self, spark, refs: list[SeriesRef], period: UtcPeriod) -> DataFrame:
        return synthetic_series(
            spark, [r.url for r in refs], period, self.value, self.dt_seconds
        )

    def find(self, spark, query: SeriesRef) -> DataFrame:
        row = [(query.url, "instant", float(self.dt_seconds), "UTC", None, None, None, None)]
        return spark.createDataFrame(row, TSINFO_SCHEMA)
