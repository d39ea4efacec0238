"""Loaders for the driver's synthetic star-schema testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under /root/testdata/sf*/.

Schema normalization: ``events.ts`` is stored as parquet
TIMESTAMP(NANOS); Spark reads it as a long of epoch-nanoseconds under
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
:func:`my_weather_spark.session.get_spark`). The loader converts it to
a proper TimestampType via integer division (``div 1000`` — exact, no
float round-trip).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """The driver may hand us a session built without our defaults;
    nanosAsLong is dynamically settable, so set it defensively before
    any read that may touch a TIMESTAMP(NANOS) column."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


# DataFrames are immutable lazy plans, so the loaded table for a given
# (session, dir, name) can be shared across queries; memoizing skips the
# per-call file listing + footer/schema read (a fixed ~50-100 ms tax on
# every query in a 70-query bench run). Keyed by applicationId so a
# restarted session never sees stale plans.
#
# The memo assumes BENCH DATA IS IMMUTABLE within an application: a
# cached plan pins the file listing taken at first load, so
# regenerating the parquet under sf_dir mid-application would serve
# stale rows (or FileNotFoundException for vacuumed files). If you
# rewrite the data in-session, call :func:`clear_table_cache` first.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_cache(sf_dir: str | None = None) -> int:
    """Invalidate memoized table plans (all, or those under ``sf_dir``);
    returns how many entries were dropped."""
    if sf_dir is None:
        n = len(_TABLE_CACHE)
        _TABLE_CACHE.clear()
        return n
    stale = [k for k in _TABLE_CACHE if k[1] == sf_dir]
    for k in stale:
        del _TABLE_CACHE[k]
    return len(stale)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    _ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Normalize nanosecond-timestamp columns read as long (ns).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str, period=None) -> DataFrame:
    """events with an optional period pushed down to the parquet scan.

    The ts column is stored as TIMESTAMP(NANOS) and read as a long, so
    a filter on the CONVERTED timestamp is a post-scan DataFilter —
    it cannot prune row groups. This helper applies a superset filter
    on the raw long (plain comparisons -> PushedFilters) before the
    conversion; callers still apply the exact inclusive period filter
    on the converted column (ops.timeseries.period_filter).
    """
    _ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        if period is not None:
            lo = int(period.start_epoch * 1_000_000) * 1000
            hi = int(period.end_epoch * 1_000_000) * 1000 + 999
            df = df.where((F.col("ts") >= lo) & (F.col("ts") <= hi))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif period is not None:
        df = df.where(
            (F.col("ts") >= F.lit(period.start)) & (F.col("ts") <= F.lit(period.end))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
