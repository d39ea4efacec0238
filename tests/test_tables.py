"""Testdata loader normalization: both timestamp physical forms read
as UTC instants whose unix_micros equals DuckDB's epoch_us."""

import duckdb
import pytest
from pyspark.sql import functions as F

from my_weather_spark import tables

SF = "/root/testdata/sf0.001"


def _duck_range():
    return duckdb.sql(
        f"SELECT min(epoch_us(ts)), max(epoch_us(ts)) FROM '{SF}/events.parquet'"
    ).fetchall()[0]


def test_load_table_events_epoch_matches_duckdb(spark):
    tables.clear_table_cache(SF)
    df = tables.load_table(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    lo, hi = df.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    assert (lo, hi) == _duck_range()


def test_load_table_ntz_fallback_branch(spark, monkeypatch):
    # Simulate a session whose parquet footer was read BEFORE our conf
    # landed: inference left ON and the defensive conf-setter disabled.
    # The loader's cast fallback must still produce exact UTC instants.
    monkeypatch.setattr(tables, "_ensure_reader_conf", lambda s: None)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tables.clear_table_cache(SF)
    try:
        df = tables.load_table(spark, SF, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"  # cast applied
        lo, hi = df.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).collect()[0]
        assert (lo, hi) == _duck_range()
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        tables.clear_table_cache(SF)


def test_load_events_period_filter_pushdown(spark):
    from my_weather_spark.model import UtcPeriod

    full = tables.load_events(spark, SF)
    lo_us, hi_us = full.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    mid = (lo_us + hi_us) // 2
    period = UtcPeriod(lo_us / 1e6, mid / 1e6)
    part = tables.load_events(spark, SF, period=period)
    n_full = full.count()
    n_part = part.count()
    assert 0 < n_part < n_full
    got_hi = part.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    assert got_hi <= mid
    # the period predicate reaches the scan (not post-scan only)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "ts" in plan.split("PushedFilters")[1][:120]
