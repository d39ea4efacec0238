"""Dashboard-frame tests (reference visual-client analytics)."""

from datetime import datetime, timezone

import pytest

from my_weather_spark import visual
from my_weather_spark.evaluate import TsEngine
from my_weather_spark.model import POINT_AVERAGE_VALUE, UtcPeriod
from my_weather_spark.session import EngineSession
from my_weather_spark.store import TsStore


def _dt(s):
    return datetime.fromtimestamp(s, tz=timezone.utc)


@pytest.fixture()
def engine(spark, tmp_path):
    sess = EngineSession(spark)
    store = TsStore(spark, str(tmp_path / "store"))
    eng = TsEngine(sess, store)
    rows = []
    for i in range(200):
        rows.append(("shyft://wx/home/out/temperature", _dt(i * 60), -5.0 + i * 0.1))
        rows.append(("shyft://wx/home/in/co2", _dt(i * 60), 400.0 + i * 4))
    df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    eng.store_ts(df, ingest_time=_dt(10**6))
    return eng


def test_current_conditions_tiles(engine):
    ids = ["shyft://wx/home/out/temperature", "shyft://wx/home/in/co2"]
    tiles = {r["series_id"]: r for r in visual.current_conditions(
        engine, ids, UtcPeriod(0, 10**6)
    ).collect()}
    t = tiles["shyft://wx/home/out/temperature"]
    assert t["min_value"] == -5.0
    assert abs(t["last_value"] - 14.9) < 1e-9
    assert t["color"] == "red"  # last temp > 0
    assert t["tile_text"].startswith("14.90")
    c = tiles["shyft://wx/home/in/co2"]
    assert c["color"] == "red"  # 400+199*4 = 1196 > 1000
    assert c["max_value"] == 1196.0


def test_threshold_bins_null_and_format_semantics(spark):
    from my_weather_spark.ops.scalars import format_value, threshold_bins
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 500.0), (2, 1196.0), (3, None), (4, 1013.25)],
        "id long, v double",
    )
    got = {
        r["id"]: (r["band"], r["txt"])
        for r in df.select(
            "id",
            threshold_bins("v", [600.0, 1000.0], ["green", "yellow", "red"]).alias("band"),
            format_value("v", "ppm").alias("txt"),
        ).collect()
    }
    assert got[1][0] == "green" and got[2][0] == "red"
    # NULL value -> NULL band, never the most-severe color
    assert got[3][0] is None
    # reference f'{v:0.2f}' format: NO thousands separator
    assert got[4][1] == "1013.25 ppm"
    # zero-threshold contract: single band, still NULL-safe
    one = df.select(threshold_bins("v", [], ["only"]).alias("b")).collect()
    assert {r["b"] for r in one} == {"only", None}


def test_rdp_history_frame_honors_max_points(engine):
    from my_weather_spark import visual
    from my_weather_spark.model import UtcPeriod

    frame = visual.history_plot_frame(
        engine,
        ["shyft://wx/home/in/co2"],
        UtcPeriod(0, 200 * 60),
        max_points=20,
        use_rdp=True,
    )
    counts = frame.groupBy("series_id").count().collect()
    assert counts and all(r["count"] <= 2 * 20 for r in counts)  # stride cap (+endpoints)


def test_history_plot_frame_downsamples(engine):
    ids = ["shyft://wx/home/out/temperature"]
    period = UtcPeriod(0, 200 * 60)
    geom = visual.history_plot_frame(engine, ids, period, max_points=20)
    n = geom.count()
    assert 10 <= n <= 30  # ~20 buckets
    cols = geom.columns
    assert "plot_ms" in cols


def test_history_plot_staircase_geometry(engine):
    ids = ["shyft://wx/home/out/temperature"]
    period = UtcPeriod(0, 10 * 60)
    geom = visual.history_plot_frame(
        engine, ids, period, point_fx=POINT_AVERAGE_VALUE, max_points=None
    ).collect()
    # staircase duplicates interior corner points: 11 pts -> 21 rows
    assert len(geom) == 21


def test_refreshing_tail_bounded(engine):
    ids = ["shyft://wx/home/out/temperature"]
    tail = visual.refreshing_tail(engine, ids, UtcPeriod(0, 10**6), keep_last=100)
    assert tail.count() == 100


def test_tile_unit_text(engine):
    sid = "shyft://wx/home/out/temperature"
    tiles = visual.current_conditions(
        engine, [sid], UtcPeriod(0, 10**6), unit_by_series={sid: "°C"}
    ).collect()
    assert tiles[0]["tile_text"] == "14.90 °C"
